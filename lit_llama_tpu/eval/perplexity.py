"""Perplexity evaluation, GPTQ protocol.

Parity with the reference evaluator (evaluate/full.py:118-133): split the token
stream into ``block_size`` windows, sum token NLLs of logits[:-1] vs
targets[1:], report ``exp(total_nll / total_tokens)``.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig


@functools.partial(jax.jit, static_argnames=("config",))
def _window_nll(params, tokens: jnp.ndarray, config: LLaMAConfig):
    """tokens: (1, T). Returns (sum NLL over T-1 predictions, count)."""
    logits, _ = llama.forward(params, tokens, config)
    logits = logits[:, :-1].astype(jnp.float32)
    targets = tokens[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    nll = logz - ll
    return nll.sum(), nll.size


def perplexity(
    params,
    tokens: np.ndarray,  # (N,) full token stream
    config: LLaMAConfig,
    block_size: Optional[int] = None,
    max_windows: Optional[int] = None,
) -> float:
    """exp(sum nll / n_tokens) over non-overlapping windows
    (reference: evaluate/full.py:118-133)."""
    block_size = block_size or config.block_size
    tokens = np.asarray(tokens, np.int32)
    n_windows = len(tokens) // block_size
    if max_windows is not None:
        n_windows = min(n_windows, max_windows)
    if n_windows == 0:
        raise ValueError(
            f"need at least {block_size} tokens for one window, got {len(tokens)}"
        )
    total_nll, total_tok = 0.0, 0
    for i in range(n_windows):
        w = jnp.asarray(tokens[i * block_size : (i + 1) * block_size][None, :])
        nll, cnt = _window_nll(params, w, config)
        total_nll += float(nll)
        total_tok += int(cnt)
    return float(np.exp(total_nll / total_tok))
