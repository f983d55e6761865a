"""Linear-layer variants, resolved from parameter structure.

The reference swaps ``nn.Linear`` subclasses in via context managers / monkeypatching
(quantization: lit_llama/utils.py:141-162, LoRA: lit_llama/lora.py:449-478, Adapter v2
method binding: lit_llama/adapter_v2.py:30-41). Here a "linear" is a parameter dict and
the forward dispatches on which keys are present — pure data, no global mutation:

  dense        {"w": (in, out) }
  int8         {"qw": int8 (in, out), "qscale": f32 (1, out)}
  int4         {"qw": uint8 (in//2, out) two nibbles/byte,
                "qscale": f32 (in//gs, out), "qzero": f32 (in//gs, out)}
  + adapter_v2 {"av2_scale": (1, out), "av2_bias": (1, out)}   (adapter_v2.py:30-41)

Weights are stored (in_features, out_features) so the forward is ``x @ w`` — the
natural MXU orientation; checkpoint converters transpose from torch's (out, in).

Int8 quantization is vector-wise symmetric per output channel (the weight-only part
of LLM.int8, reference: lit_llama/quantization.py:38-77). Int4 is group-quantized
asymmetric with per-(group, out-channel) scale+zero, the same math as the reference's
Triton kernel (lit_llama/quantization.py:187-282) and ``ColBlockQuantizedLinear``
packing (quantization.py:340-423), laid out for TPU: nibbles packed along the
contraction dim so a (gs, out) tile dequantizes contiguously into the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def quantize_int8(w: jnp.ndarray) -> Params:
    """Symmetric per-output-channel int8 quantization of a (in, out) weight."""
    w32 = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    qw = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"qw": qw, "qscale": scale}


def dequantize_int8(params: Params, dtype=jnp.float32) -> jnp.ndarray:
    return (params["qw"].astype(jnp.float32) * params["qscale"]).astype(dtype)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(in, out) nibble values -> (in//2, out) packed bytes, half-split planes:
    row i's low nibble is original row i, its high nibble row i + in//2.

    Half-split (vs adjacent-pair) packing keeps the matmul's operand split free:
    x[:, :K/2] and x[:, K/2:] are contiguous slices, whereas the even/odd split
    an interleaved layout needs lowers to a lane-granularity gather on TPU
    (measured ~40us per operand — as long as the matmul itself)."""
    in_f = q.shape[0]
    return (q[: in_f // 2] | (q[in_f // 2 :] << 4)).astype(jnp.uint8)


def quantize_int4(w: jnp.ndarray, groupsize: int = 128) -> Params:
    """Asymmetric group quantization to 4 bits, packed 2 nibbles/byte along ``in``.

    Same math as the reference's per-column-tile scale/zero scheme
    (lit_llama/quantization.py:340-423): for each (group of `groupsize` input rows,
    output channel), w_q = round((w - min) / scale) in [0, 15].
    """
    in_f, out_f = w.shape
    if in_f % (2 * groupsize) and groupsize != -1:
        raise ValueError(f"in_features {in_f} not divisible by 2*groupsize {groupsize}")
    gs = in_f if groupsize == -1 else groupsize
    w32 = w.astype(jnp.float32).reshape(in_f // gs, gs, out_f)
    wmin = jnp.min(w32, axis=1, keepdims=True)
    wmax = jnp.max(w32, axis=1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / 15.0, 1e-12)
    q = jnp.clip(jnp.round((w32 - wmin) / scale), 0, 15).astype(jnp.uint8)
    q = q.reshape(in_f, out_f)
    return {
        "qw": pack_int4(q),
        "qscale": scale[:, 0, :],  # (n_groups, out)
        "qzero": wmin[:, 0, :],  # (n_groups, out)
    }


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(in//2, out) packed bytes -> (in, out) uint8 nibble values in [0, 15]."""
    return jnp.concatenate([packed & 0xF, packed >> 4], axis=0)


def dequantize_int4(params: Params, dtype=jnp.float32) -> jnp.ndarray:
    q = unpack_int4(params["qw"]).astype(jnp.float32)
    in_f, out_f = q.shape
    n_groups = params["qscale"].shape[0]
    gs = in_f // n_groups
    q = q.reshape(n_groups, gs, out_f)
    w = q * params["qscale"][:, None, :] + params["qzero"][:, None, :]
    return w.reshape(in_f, out_f).astype(dtype)


def linear(params: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Apply a linear-layer variant. ``x``: (..., in_features)."""
    compute_dtype = compute_dtype or x.dtype
    if "w" in params:
        out = x @ params["w"].astype(compute_dtype)
    elif "qzero" in params:
        out = _int4_matmul(x, params, compute_dtype)
    elif "qw" in params:
        out = _int8_matmul(x, params, compute_dtype)
    else:
        raise ValueError(f"unrecognized linear params: {sorted(params)}")
    if "av2_scale" in params:
        # Adapter v2 learnable scale * (Wx + bias) (reference: adapter_v2.py:30-33).
        out = (out + params["av2_bias"].astype(out.dtype)) * params["av2_scale"].astype(
            out.dtype
        )
    return out


def _int8_matmul(x: jnp.ndarray, params: Params, compute_dtype) -> jnp.ndarray:
    from lit_llama_tpu.ops import quant_matmul

    return quant_matmul.matmul_int8(x, params["qw"], params["qscale"], compute_dtype)


def _int4_matmul(x: jnp.ndarray, params: Params, compute_dtype) -> jnp.ndarray:
    from lit_llama_tpu.ops import quant_matmul

    return quant_matmul.matmul_int4(
        x, params["qw"], params["qscale"], params["qzero"], compute_dtype
    )
