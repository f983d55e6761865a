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
    in_f = qw.shape[0] * (2 if packed else 1)
    out_f = qw.shape[1]
    if in_f % 256 != 0 or out_f % 256 != 0:
        return False
    m = 1
    for d in x.shape[:-1]:
        m *= d
    # Measured dispatch rule (scripts/bench_quant_matmul.py on one v5e, 7B
    # shapes, slope-timed to cancel relay dispatch overhead):
    # - decode/serving sizes (m <= 128): the fused kernel wins everywhere
    #   (weight-streaming bound; e.g. c_attn M=1: 54 us vs 1144 us XLA).
    # - prefill sizes (m <= 1024): the kernel still wins on the LARGE weights
    #   (c_attn 25 MB packed: 602 vs 1149 us at M=512) but loses on small ones
    #   (attn.c_proj 8.4 MB: XLA fuses the dequant into the dot and runs at
    #   ~full MXU rate, 105 vs 196 us at M=512) — threshold 16 MB packed.
    # - m > 1024: compute-bound; XLA's fused dequant+dot wins on every shape.
    # int8 (packed=False) keeps the decode-only rule: its schedule was not
    # re-tuned for large M.
    if m <= 128:
        return True
    if not packed:
        return False
    return m <= 1024 and qw.size >= 16 * 1024 * 1024
