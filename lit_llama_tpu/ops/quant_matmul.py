"""Weight-only quantized matmuls: XLA reference path + Pallas TPU kernels.

Replaces the reference's native GPU kernels:
  - bitsandbytes LLM.int8 linear (lit_llama/quantization.py:38-77)  -> matmul_int8
  - Triton int4 group-dequant matmul (lit_llama/quantization.py:187-333) -> matmul_int4

Dispatch: the Pallas kernel is used on TPU when shapes are tile-aligned; otherwise the
XLA dequant+dot path runs (also the numerical reference in tests). Both paths share
the packing layout defined in ops/linear.py: weights (in, out), int4 nibbles packed
along the contraction dim, per-(group, out-channel) scale/zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lit_llama_tpu.ops import linear as linear_ops


def _platform() -> str:
    return jax.default_backend()


# ---------------------------------------------------------------------------
# XLA reference paths
# ---------------------------------------------------------------------------


def matmul_int8_xla(x, qw, qscale, compute_dtype):
    """x @ (qw * scale). Dequantizes in compute_dtype; XLA fuses the scale multiply
    into the matmul epilogue when it can, and int8->bf16 convert is cheap VPU work."""
    w = (qw.astype(jnp.float32) * qscale).astype(compute_dtype)
    return x.astype(compute_dtype) @ w


def matmul_int4_xla(x, qw, qscale, qzero, compute_dtype):
    w = linear_ops.dequantize_int4(
        {"qw": qw, "qscale": qscale, "qzero": qzero}, compute_dtype
    )
    return x.astype(compute_dtype) @ w


# ---------------------------------------------------------------------------
# Public dispatch
# ---------------------------------------------------------------------------


def matmul_int8(x, qw, qscale, compute_dtype=jnp.bfloat16):
    if _use_pallas(x, qw):
        from lit_llama_tpu.ops import quant_matmul_pallas

        return quant_matmul_pallas.matmul_int8(x, qw, qscale, compute_dtype)
    return matmul_int8_xla(x, qw, qscale, compute_dtype)


def matmul_int4(x, qw, qscale, qzero, compute_dtype=jnp.bfloat16):
    if _use_pallas(x, qw, packed=True):
        from lit_llama_tpu.ops import quant_matmul_pallas

        return quant_matmul_pallas.matmul_int4(x, qw, qscale, qzero, compute_dtype)
    return matmul_int4_xla(x, qw, qscale, qzero, compute_dtype)


@functools.lru_cache(None)
def _pallas_enabled() -> bool:
    import os

    if os.environ.get("LIT_LLAMA_TPU_NO_PALLAS"):
        return False
    return _platform() in ("tpu", "axon")


def _use_pallas(x, qw, packed: bool = False) -> bool:
    if not _pallas_enabled():
        return False
    # The Pallas kernel is tuned for weight-bandwidth-bound decode (tiny M).
    # At prefill/training sizes the matmul is compute-bound, the plain XLA
    # dequant+dot path is at least as fast, and large M x untiled-K block
    # combinations can exceed the VMEM budget.
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if m > 128:
        return False
    in_f = qw.shape[0] * (2 if packed else 1)
    out_f = qw.shape[1]
    return in_f % 256 == 0 and out_f % 256 == 0
