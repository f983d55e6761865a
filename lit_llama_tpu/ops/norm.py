"""RMSNorm (reference: lit_llama/model.py:257-277).

``x * rsqrt(mean(x^2) + eps) * scale`` with eps=1e-5 and a learnable scale. The mean
of squares is computed in float32 regardless of the activation dtype — bfloat16
accumulation of 4096+ squares loses enough mantissa to shift logits. XLA fuses the
whole normalization into neighbouring ops, so no Pallas kernel is needed for the
standalone norm; the flash-attention and matmul kernels are where handwritten
kernels pay off.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    norm = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (norm * scale.astype(jnp.float32)).astype(x.dtype)
