"""Multi-head attention: XLA einsum reference path + Pallas flash-attention dispatch.

Replaces the reference's ``F.scaled_dot_product_attention`` with an explicit bool mask
(reference: lit_llama/model.py:223-230). Scores are computed and softmaxed in float32
— the reference inherits fp32 softmax from SDPA; on TPU a bf16 softmax over 2k keys
visibly shifts logits.

The Pallas flash kernel (ops/flash_attention.py) is used for prefill-shaped problems
on TPU; decode (one query) is a matvec against the KV cache where flash buys nothing,
so it always takes the einsum path and XLA fuses it.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """q: (B, H, T, hs); k/v: (B, H, S, hs); mask: broadcastable to (B, H, T, S),
    True = attend. Returns (B, H, T, hs) in q.dtype."""
    hs = q.shape[-1]
    scale = 1.0 / (hs**0.5)
    scores = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask, scores, jnp.float32(-jnp.inf))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def _use_flash(q: jnp.ndarray, k: jnp.ndarray, causal: bool) -> bool:
    if os.environ.get("LIT_LLAMA_TPU_NO_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    T, S, hs = q.shape[2], k.shape[2], q.shape[3]
    # Flash pays off for prefill; needs lane-aligned head size and enough rows to tile.
    return causal and T == S and T >= 128 and T % 128 == 0 and hs % 128 == 0


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    causal: bool = False,
) -> jnp.ndarray:
    """Dispatching attention. ``causal=True`` promises mask == tril (lets the flash
    kernel skip masked blocks entirely instead of evaluating the mask)."""
    if _use_flash(q, k, causal):
        from lit_llama_tpu.ops import flash_attention

        return flash_attention.flash_attention(q, k, v, causal=True)
    return attention_xla(q, k, v, mask)
