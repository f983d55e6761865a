"""Rotary position embeddings, Meta-LLaMA interleaved-pair convention.

Capability parity with the reference's ``build_rope_cache`` / ``apply_rope``
(reference: lit_llama/model.py:280-323): theta base 10000, rotation applied to
consecutive (even, odd) element pairs of each head, computed in float32 and cast
back to the input dtype. The reference halves its cache to fp16 for half-precision
models to mimic complex32 (model.py:300-302); on TPU we keep the cache in float32 —
the rotation is elementwise VPU work fused into the surrounding ops by XLA, and
bfloat16 cos/sin would cost accuracy for zero bandwidth win at these sizes.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_rope_cache(
    seq_len: int, n_elem: int, base: int = 10000, dtype=jnp.float32
) -> jnp.ndarray:
    """Precompute the (cos, sin) rotation table.

    Returns an array of shape ``(seq_len, n_elem // 2, 2)`` where ``[..., 0]`` is cos
    and ``[..., 1]`` is sin, matching the reference's cache layout
    (lit_llama/model.py:280-303).
    """
    theta = 1.0 / (base ** (jnp.arange(0, n_elem, 2, dtype=jnp.float32) / n_elem))
    seq_idx = jnp.arange(seq_len, dtype=jnp.float32)
    idx_theta = jnp.outer(seq_idx, theta)  # (seq_len, n_elem/2)
    cache = jnp.stack([jnp.cos(idx_theta), jnp.sin(idx_theta)], axis=-1)
    return cache.astype(dtype)


def apply_rope(x: jnp.ndarray, rope_cache: jnp.ndarray) -> jnp.ndarray:
    """Rotate query/key head vectors.

    ``x``: (B, T, n_head, head_size); ``rope_cache``: (T, head_size // 2, 2) already
    gathered for the positions of ``x``. Rotation runs in float32 and the result is
    cast back to ``x.dtype`` (reference: lit_llama/model.py:306-323).
    """
    B, T, H, hs = x.shape
    xs = x.astype(jnp.float32).reshape(B, T, H, hs // 2, 2)
    if rope_cache.ndim == 4:  # per-batch positions: (B, T, hs/2, 2)
        rc = rope_cache.astype(jnp.float32).reshape(B, T, 1, hs // 2, 2)
    else:
        rc = rope_cache.astype(jnp.float32).reshape(1, T, 1, hs // 2, 2)
    cos, sin = rc[..., 0], rc[..., 1]
    x1, x2 = xs[..., 0], xs[..., 1]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.reshape(B, T, H, hs).astype(x.dtype)


def apply_rope_half(x: jnp.ndarray, rope_cache: jnp.ndarray) -> jnp.ndarray:
    """Rotation in the HALF basis: element i pairs with i + hs/2 (instead of the
    Meta interleaved (2i, 2i+1) pairs). Used with weights whose q/k head columns
    were permuted by ops/fused_layer.permute_qk_columns — the model is
    mathematically identical (q and k share the permutation, so scores are
    unchanged), and the fused decode kernel can rotate with one lane roll."""
    B, T, H, hs = x.shape
    xs = x.astype(jnp.float32)
    if rope_cache.ndim == 4:
        rc = rope_cache.astype(jnp.float32).reshape(B, T, 1, hs // 2, 2)
    else:
        rc = rope_cache.astype(jnp.float32).reshape(1, T, 1, hs // 2, 2)
    cos, sin = rc[..., 0], rc[..., 1]
    x1, x2 = xs[..., : hs // 2], xs[..., hs // 2 :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def rope_half_row(rope_cache: jnp.ndarray, pos: jnp.ndarray, hs: int):
    """(cos, sin_signed) (1, hs) f32 rows for the fused kernel's one-roll
    rotation at a (traced) position: rot(q) = q * cos + roll(q, hs/2) * sin_s
    with cos[i] = cos(theta_{i mod hs/2}) and sin_s negative on the first
    half (see ops/fused_layer.py)."""
    row = jnp.take(rope_cache, pos, axis=0).astype(jnp.float32)  # (hs/2, 2)
    c, s = row[:, 0], row[:, 1]
    cos = jnp.concatenate([c, c]).reshape(1, hs)
    sin_s = jnp.concatenate([-s, s]).reshape(1, hs)
    return cos, sin_s
