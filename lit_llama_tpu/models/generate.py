"""Decode engine: prefill + autoregressive sampling as compiled XLA programs.

Capability parity with the reference's ``generate()`` loop (reference:
generate.py:20-91): KV-cache decoding via ``input_pos``, temperature / top-k
sampling, eos early-exit, and the sliding-window cache once ``input_pos`` passes
``max_seq_length``.

TPU-first design: the reference dispatches one graph per token and cuts it with
``xm.mark_step`` on XLA (generate.py:57-60,81-82). Here the **entire** generation
loop is a single jitted program — prefill once, then a ``lax.while_loop`` whose body
is the fused decode step (cache update + attention + sampling). One compile per
(prompt_bucket, max_new_tokens) shape; zero host round-trips per token; the eos
early-exit is the while condition.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.ops.rope import build_rope_cache


def sample_logits(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float,
    top_k: Optional[int],
) -> jnp.ndarray:
    """Temperature / top-k sampling of one next token (reference: generate.py:68-76).

    ``temperature == 0`` means greedy argmax (the reference reaches greedy via
    temperature -> 0; we special-case it statically)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k is not None:
        # approx_max_k rides the TPU's hardware top-k (~an order of magnitude
        # cheaper than exact lax.top_k over a 32k vocab); top-k sampling is a
        # heuristic truncation, so approximate membership at the k-th boundary
        # is immaterial (reference: generate.py:70-76 uses exact torch.topk)
        kth = jax.lax.approx_max_k(logits, top_k)[0][..., -1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    return jax.random.categorical(key, logits).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config",
        "max_new_tokens",
        "max_seq_length",
        "temperature",
        "top_k",
        "eos_id",
    ),
)
def _generate_compiled(
    params,
    prompt: jnp.ndarray,  # (T,) int32, static length
    key: jax.Array,
    config: LLaMAConfig,
    max_new_tokens: int,
    max_seq_length: int,
    temperature: float,
    top_k: Optional[int],
    eos_id: Optional[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tokens buffer of length T+max_new_tokens, n_generated)."""
    T = prompt.shape[0]
    T_new = T + max_new_tokens
    dtype = jnp.dtype(config.compute_dtype)
    rope_cache = build_rope_cache(config.block_size, config.head_size)
    # fused bf16 decode keeps the cache in the packed u32 pair layout (bf16
    # density, 32-bit DMAs — ops/fused_layer.pack_kv); f32 compute streams the
    # f32 cache directly. generate() makes max_seq_length even for this.
    packed_cache = (
        config.rope_layout == "half"
        and isinstance(params.get("h"), (list, tuple))
        and dtype == jnp.bfloat16
        and config.kv_cache_dtype is None
        and max_seq_length % 16 == 0
    )
    cache = llama.init_kv_cache(config, 1, max_seq_length, dtype, packed=packed_cache)
    if isinstance(params.get("h"), (list, tuple)):
        # per-layer cache rides with unstacked weights: in-place updates, no
        # per-step stacked-cache slice/re-stack copies
        cache = llama.unstack_kv_cache(cache)

    buf = jnp.zeros((T_new,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt, (0,))

    # Prefill: one pass over the prompt.
    logits, cache = llama.forward(
        params,
        prompt[None, :],
        config,
        rope_cache=rope_cache,
        input_pos=jnp.arange(T),
        kv_cache=cache,
        prefill_from_zero=True,
    )
    key, sub = jax.random.split(key)
    next_tok = sample_logits(logits[0, -1].astype(jnp.float32), sub, temperature, top_k)
    buf = buf.at[T].set(next_tok)

    def cond(state):
        i, _, _, _, done = state
        return jnp.logical_and(i < max_new_tokens - 1, jnp.logical_not(done))

    # the roll-left overflow path can only fire if the generation runs past
    # the cache; statically disabling it avoids a full-cache copy per step
    # (XLA flattens the roll cond into slices + select)
    can_overflow = T + max_new_tokens > max_seq_length

    # Whole-layer fused decode (ops/fused_layer.py): params prepared by
    # prepare_fused_params carry rope_layout == "half"; each decode step is
    # then ONE Pallas launch per block + lm_head — no per-op XLA work, no
    # roll (the cache wraps as a ring, same retained window). bf16 compute
    # requires the packed cache (raw bf16 caches can't be DMA'd at dynamic
    # offsets on this toolchain); if the cache couldn't be packed, fall back
    # to the XLA decode loop, which handles the half-rotation basis.
    fused = (
        config.rope_layout == "half"
        and isinstance(params.get("h"), (list, tuple))
        and (dtype != jnp.bfloat16 or packed_cache)
    )

    def fused_step(tok, pos, cache, key):
        import os

        from lit_llama_tpu.ops.fused_layer import decode_layers_fused
        from lit_llama_tpu.ops.linear import linear
        from lit_llama_tpu.ops.norm import rms_norm
        from lit_llama_tpu.ops.rope import rope_half_row

        S = max_seq_length
        cosf, sinf = rope_half_row(
            rope_cache, jnp.clip(pos, 0, config.block_size - 1), config.head_size
        )
        x = jnp.take(params["wte"], tok, axis=0).astype(dtype)  # (1, D)
        # LAYERS PER LAUNCH (round-5): grouping n blocks into one Pallas
        # launch removes n-1 of every n inter-kernel dispatch gaps and lets
        # the weight-stream DMA chain run across the in-launch boundary
        lpl = max(1, int(os.environ.get("LIT_LLAMA_TPU_LPL", "1")))
        new_layers = []
        L = len(params["h"])
        for i in range(0, L, lpl):
            lps = params["h"][i : i + lpl]
            x, kv_new = decode_layers_fused(
                x, lps, cache[i : i + len(lps)], cosf, sinf, pos % S, pos,
                config,
            )
            new_layers.extend(kv_new)
        if "qzero" in params["lm_head"]:
            from lit_llama_tpu.ops.fused_layer import lm_head_fused

            logits = lm_head_fused(x, params["ln_f"], params["lm_head"], config)
        else:
            logits = linear(params["lm_head"], rms_norm(x, params["ln_f"]))
        return logits, tuple(new_layers)

    def body(state):
        i, buf, cache, key, done = state
        pos = T + i
        tok = jax.lax.dynamic_slice(buf, (pos,), (1,))
        if fused:
            logits, cache = fused_step(tok, pos, cache, key)
            logits = logits[None]  # (1, 1, V)
        else:
            logits, cache = llama.forward(
                params,
                tok[None, :],
                config,
                rope_cache=rope_cache,
                input_pos=jnp.array([0]) + pos,
                kv_cache=cache,
                can_overflow=can_overflow,
            )
        key, sub = jax.random.split(key)
        nxt = sample_logits(logits[0, -1].astype(jnp.float32), sub, temperature, top_k)
        buf = jax.lax.dynamic_update_slice(buf, nxt[None], (pos + 1,))
        done = (nxt == eos_id) if eos_id is not None else jnp.bool_(False)
        return i + 1, buf, cache, key, done

    init_done = (next_tok == eos_id) if eos_id is not None else jnp.bool_(False)
    if max_new_tokens > 1:
        i, buf, cache, key, done = jax.lax.while_loop(
            cond, body, (jnp.int32(0), buf, cache, key, init_done)
        )
    else:
        i, done = jnp.int32(0), init_done
    n_generated = i + 1
    return buf, n_generated


def plan_seq_length(
    config: LLaMAConfig, t_new: int, max_seq_length: Optional[int] = None
) -> int:
    """The cache length a generation of ``t_new`` total tokens will use
    (exposed so kernel warm-up can pre-compile at the exact geometry)."""
    if max_seq_length is None:
        max_seq_length = min(t_new, config.block_size)
    if config.rope_layout == "half":
        if max_seq_length > 128:
            # fused decode kernel streams the cache in 128-position blocks once
            # it no longer fits a single VMEM buffer; a 128-multiple S tiles
            max_seq_length = min(-(-max_seq_length // 128) * 128, config.block_size)
        elif max_seq_length % 16:
            # packed bf16-pair cache: S/2 word rows must DMA in chunks whose
            # row count is 8-aligned (ops/fused_layer._row_chunks) — S % 16
            max_seq_length = min(
                -(-max_seq_length // 16) * 16, config.block_size
            )
    return max_seq_length


def generate(
    params,
    prompt: np.ndarray,
    max_new_tokens: int,
    *,
    config: LLaMAConfig,
    max_seq_length: Optional[int] = None,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    eos_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> np.ndarray:
    """Generate a continuation of ``prompt`` (1-D int array).

    Returns the prompt + generated tokens; stops early at ``eos_id`` (the eos token
    is included, reference: generate.py:88-89).
    """
    prompt = jnp.asarray(prompt, jnp.int32)
    T = int(prompt.shape[0])
    T_new = T + max_new_tokens
    max_seq_length = plan_seq_length(config, T_new, max_seq_length)
    if key is None:
        key = jax.random.PRNGKey(0)
    buf, n_generated = _generate_compiled(
        params,
        prompt,
        key,
        config,
        int(max_new_tokens),
        int(max_seq_length),
        float(temperature),
        None if top_k is None else int(top_k),
        None if eos_id is None else int(eos_id),
    )
    # Each fresh device->host fetch is a round trip (~25 ms through a remote
    # relay); without an eos the count is statically max_new_tokens — skip
    # the scalar fetch entirely — and with one, fetch both values in a
    # single transfer instead of two.
    if eos_id is None:
        return np.asarray(buf)
    buf_np, n = jax.device_get((buf, n_generated))
    return buf_np[: T + int(n)]
