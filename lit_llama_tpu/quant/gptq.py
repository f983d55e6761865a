"""From-scratch GPTQ: Hessian-based post-training quantization.

Same algorithm as the reference's from-scratch implementation
(lit_llama/quantization.py:426-616 + quantize/gptq.py:38-150):

* collect per-linear input Hessians H = Σ x xᵀ over calibration batches;
* damped Cholesky inverse (damp = 0.01·mean(diag H), reference
  quantization.py:545-556);
* column-sequential quantize with error feedback, lazy-batched: rows inside a
  block update immediately, the rest of the matrix once per block
  (quantization.py:558-594);
* optional ``actorder`` permutation by descending diag(H);
* group scales re-estimated at every group boundary from the
  error-compensated weights (quantization.py:568-574).

TPU-first shape: weights are (in, out) so GPTQ walks *rows*; the inner loop is
a ``lax.fori_loop`` carrying the weight matrix on device, and the Cholesky runs
on-device via jnp.linalg (replacing cuSOLVER, SURVEY.md §2.9 item 6). Emits the
same packed int4 layout ops/linear.py defines, so the Pallas decode kernels
consume GPTQ checkpoints unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from lit_llama_tpu.models import llama
from lit_llama_tpu.models.config import LLaMAConfig
from lit_llama_tpu.ops.linear import linear, pack_int4
from lit_llama_tpu.ops.norm import rms_norm
from lit_llama_tpu.ops.rope import apply_rope, build_rope_cache

Params = Dict[str, Any]


def accumulate_hessian(H: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """H += 2 xᵀx over flattened batch (reference: collect_input_stats,
    quantization.py:515-529; the factor cancels in the algorithm but matches)."""
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return H + 2.0 * (x2.T @ x2)


def _hinv_cholesky(H: jnp.ndarray, damp_frac: float = 0.01) -> jnp.ndarray:
    """Upper-Cholesky of H⁻¹ with dead-column handling + damping
    (reference: quantization.py:541-556)."""
    dead = jnp.diag(H) == 0.0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    damp = damp_frac * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(H.shape[0], dtype=H.dtype)
    # Hinv via Cholesky solves, then its upper factor U (Hinv = Uᵀ U)
    L = jnp.linalg.cholesky(H)
    eye = jnp.eye(H.shape[0], dtype=H.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    Hinv = Linv.T @ Linv
    return jnp.linalg.cholesky(Hinv).T


def _hinv_cholesky_host(H, damp_frac: float = 0.01):
    """Host (LAPACK) version of :func:`_hinv_cholesky` for very wide linears:
    XLA's blocked triangular_solve materializes ~20 temps of (in, in) size at
    in=22016 (65B mlp.c_proj) — tens of GB of HBM for a 1.9 GB matrix. The
    host does it in-place in f64 (the extra precision is free there)."""
    import numpy as np
    from scipy.linalg import lapack

    H = np.array(H, np.float32)  # local copy, mutated in place
    n = H.shape[0]
    dead = np.diag(H) == 0.0
    H[np.diag_indices(n)] += np.where(dead, np.float32(1.0), np.float32(0.0))
    damp = damp_frac * float(np.mean(np.diag(H)))
    H[np.diag_indices(n)] += np.float32(damp)
    # potrf + trtri: in-place Cholesky and triangular inverse — no (n, n)
    # identity RHS, ~4 live (n, n) f32 buffers total at n=22016 (~8 GB)
    L, info = lapack.spotrf(H, lower=1, overwrite_a=1)
    assert info == 0, f"spotrf failed: {info}"
    Linv, info = lapack.strtri(L, lower=1, overwrite_c=1)
    assert info == 0, f"strtri failed: {info}"
    Linv = np.tril(Linv)  # lapack leaves the strict upper triangle untouched
    Hinv = Linv.T @ Linv
    L2, info = lapack.spotrf(Hinv, lower=1, overwrite_a=1)
    assert info == 0, f"spotrf(Hinv) failed: {info}"
    return np.tril(L2).T.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("groupsize", "blocksize", "actorder"))
def gptq_quantize_matrix(
    w: jnp.ndarray,  # (in, out) f32
    H: jnp.ndarray,  # (in, in) f32
    groupsize: int = 128,
    blocksize: int = 128,
    actorder: bool = False,
    hinv: jnp.ndarray = None,  # precomputed upper-Cholesky of (permuted) H⁻¹
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (q, scale, zero): q (in, out) int levels in [0,15],
    scale/zero (in/gs, out). Asymmetric 4-bit, per-(group, out-channel).

    ``actorder=True`` walks rows in descending-diag(H) order so high-curvature
    rows quantize first and later rows absorb their error (reference:
    quantization.py:542-545, 595-597). The reference re-quantizes the
    inverse-permuted weights against permuted-group scales on repack
    (quantization.py:602-613), losing exactness; here group scale/zero come
    from the ORIGINAL group membership ("static groups"), each permuted row
    quantizes against its natural group's parameters, and the levels scatter
    straight back to natural order — the packed Pallas layout is untouched and
    dequantization stays exact.
    """
    in_f, out_f = w.shape
    gs = in_f if groupsize == -1 else groupsize
    n_groups = in_f // gs
    blocksize = min(blocksize, in_f)
    while in_f % blocksize:
        blocksize //= 2
    w = w.astype(jnp.float32)

    if actorder:
        perm = jnp.argsort(-jnp.diag(H))
        w = w[perm]
        H = H[perm][:, perm]
        # static group parameters from the pre-walk weights, natural grouping
        blk = w[jnp.argsort(perm)].reshape(n_groups, gs, out_f)
        wmin0 = jnp.minimum(jnp.min(blk, axis=1), 0.0)
        wmax0 = jnp.maximum(jnp.max(blk, axis=1), 0.0)
        static_scales = jnp.maximum((wmax0 - wmin0) / 15.0, 1e-12)
        static_zeros = wmin0
        group_of_row = perm // gs  # natural group id of each permuted row
    else:
        perm = None
        group_of_row = None
    # hinv (when given) was computed on the host from the ALREADY-PERMUTED H
    Hinv = _hinv_cholesky(H) if hinv is None else hinv

    q_all = jnp.zeros((in_f, out_f), jnp.float32)
    scales = static_scales if actorder else jnp.zeros((n_groups, out_f), jnp.float32)
    zeros = static_zeros if actorder else jnp.zeros((n_groups, out_f), jnp.float32)

    def row_step(i, carry):
        """One row inside the current block: quantize + immediate in-block update."""
        w, q_all, scales, zeros, err_blk, i0 = carry
        idx = i0 + i

        if actorder:
            g = group_of_row[idx]
            s, z = scales[g], zeros[g]
            out_row = perm[idx]  # natural row to receive the levels
        else:
            # group boundary: re-estimate scale/zero from the *current* rows
            def new_scale(_):
                g = idx // gs
                blk = jax.lax.dynamic_slice(w, (g * gs, 0), (gs, out_f))
                wmin = jnp.minimum(jnp.min(blk, axis=0), 0.0)
                wmax = jnp.maximum(jnp.max(blk, axis=0), 0.0)
                s = jnp.maximum((wmax - wmin) / 15.0, 1e-12)
                return s, wmin

            def old_scale(_):
                g = idx // gs
                return scales[g], zeros[g]

            s, z = jax.lax.cond(idx % gs == 0, new_scale, old_scale, None)
            g = idx // gs
            scales = scales.at[g].set(s)
            zeros = zeros.at[g].set(z)
            out_row = idx

        wrow = jax.lax.dynamic_slice(w, (idx, 0), (1, out_f))[0]
        qrow = jnp.clip(jnp.round((wrow - z) / s), 0.0, 15.0)
        dq = qrow * s + z
        q_all = jax.lax.dynamic_update_slice(q_all, qrow[None], (out_row, 0))

        d = Hinv[idx, idx]
        err = (wrow - dq) / d
        err_blk = jax.lax.dynamic_update_slice(err_blk, err[None], (i, 0))

        # immediate update of the remaining rows of this block
        hrow = jax.lax.dynamic_slice(Hinv, (idx, 0), (1, in_f))[0]
        blk_rows = jax.lax.dynamic_slice(w, (i0, 0), (blocksize, out_f))
        hseg = jax.lax.dynamic_slice(hrow, (i0,), (blocksize,))
        row_ids = jnp.arange(blocksize)
        upd = jnp.where((row_ids > i)[:, None], hseg[:, None] * err[None, :], 0.0)
        blk_rows = blk_rows - upd
        w = jax.lax.dynamic_update_slice(w, blk_rows, (i0, 0))
        return w, q_all, scales, zeros, err_blk, i0

    def block_step(b, carry):
        w, q_all, scales, zeros = carry
        i0 = b * blocksize
        err_blk = jnp.zeros((blocksize, out_f), jnp.float32)
        w, q_all, scales, zeros, err_blk, _ = jax.lax.fori_loop(
            0, blocksize, row_step, (w, q_all, scales, zeros, err_blk, i0)
        )
        # lazy update of everything after the block:
        # W[j>=i0+B] -= Hinv[i0:i0+B, j].T @ Err
        hseg = jax.lax.dynamic_slice(Hinv, (i0, 0), (blocksize, in_f))
        mask = (jnp.arange(in_f) >= i0 + blocksize)[None, :]
        hseg = jnp.where(mask, hseg, 0.0)
        w = w - hseg.T @ err_blk
        return w, q_all, scales, zeros

    n_blocks = in_f // blocksize
    w, q_all, scales, zeros = jax.lax.fori_loop(
        0, n_blocks, block_step, (w, q_all, scales, zeros)
    )
    return q_all.astype(jnp.uint8), scales, zeros


def pack_q4(q: jnp.ndarray) -> jnp.ndarray:
    """(in, out) int levels -> (in//2, out) packed bytes (row 2i -> low nibble),
    the layout ops/linear.py:quantize_int4 defines."""
    return pack_int4(q)


# ---------------------------------------------------------------------------
# Block-wise model quantization driver (reference: quantize/gptq.py:38-150)
# ---------------------------------------------------------------------------


def _attn_forward_tapped(lp, x, rope, mask, config):
    """Block forward that returns the inputs seen by each quantizable linear."""
    B, T, C = x.shape
    taps = {}
    h1 = rms_norm(x, lp["rms_1"])
    taps["attn.c_attn"] = h1
    y = _stage_attn(lp, h1, rope, mask, config)
    taps["attn.c_proj"] = y
    x = x + linear(lp["attn"]["c_proj"], y)
    h2 = rms_norm(x, lp["rms_2"])
    taps["mlp.c_fc1"] = h2
    taps["mlp.c_fc2"] = h2
    gate = jax.nn.silu(linear(lp["mlp"]["c_fc1"], h2)) * linear(lp["mlp"]["c_fc2"], h2)
    taps["mlp.c_proj"] = gate
    x = x + linear(lp["mlp"]["c_proj"], gate)
    return x, taps


def _stage_attn(lp, h1, rope, mask, config):
    """c_attn projection + attention: h1 = rms_1(x) -> pre-c_proj activations."""
    B, T, _ = h1.shape
    H, hs = config.n_head, config.head_size
    qkv = linear(lp["attn"]["c_attn"], h1)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rope(q.reshape(B, T, H, hs), rope).transpose(0, 2, 1, 3)
    k = apply_rope(k.reshape(B, T, H, hs), rope).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, hs).transpose(0, 2, 1, 3)
    from lit_llama_tpu.ops.attention import attention

    y = attention(q, k, v, mask, causal=True)
    return y.transpose(0, 2, 1, 3).reshape(B, T, H * hs)


_BLOCK_TARGETS = ("attn.c_attn", "attn.c_proj", "mlp.c_fc1", "mlp.c_fc2", "mlp.c_proj")


def _stage_concat(chunks, host_spill: bool):
    """Join per-batch stage outputs: host numpy (device frees each chunk as it
    lands) when spilling, one device array otherwise."""
    if host_spill:
        import numpy as np

        return np.concatenate([np.asarray(c) for c in chunks])
    return jnp.concatenate(chunks)


def _get(d: Params, dotted: str):
    for k in dotted.split("."):
        d = d[k]
    return d


def quantize_model_gptq(
    params: Params,
    config: LLaMAConfig,
    calib_tokens: jnp.ndarray,  # (n_samples, T) int32
    groupsize: int = 128,
    batch: int = 4,
    actorder: bool = False,
    host_spill: bool = None,
) -> Params:
    """Sequential block-wise GPTQ over the whole model: quantize the 5 per-block
    linears + lm_head, propagating error-compensated activations block to block
    (reference: llama_blockwise_quantization, quantize/gptq.py:38-150).

    Calibration is sequential WITHIN the block too (matching the reference's
    per-submodule hook re-runs, quantize/gptq.py:75-110): each linear's Hessian
    is collected with the earlier linears of the same block already quantized,
    so e.g. attn.c_proj calibrates against the attention outputs it will
    actually see at inference. Instead of re-running the whole block per
    submodule, the block is staged along its dataflow — each stage runs once
    with the by-then-quantized weights and its outputs feed both the next
    Hessian and the next stage:

      stage A: h1 = rms_1(x)                       -> H(c_attn); quantize it
      stage B: y = attn(c_attn_q(h1))              -> H(attn.c_proj); quantize
      stage C: x2 = x + c_proj_q(y); h2 = rms_2    -> H(c_fc1) = H(c_fc2); quantize
      stage D: gate = silu(fc1_q(h2)) * fc2_q(h2)  -> H(mlp.c_proj); quantize
      stage E: x = x2 + mlp.c_proj_q(gate)          (block propagation)

    Memory (``host_spill``, default auto): when the largest whole-corpus stage
    buffer (n, T, max(D, I)) f32 would exceed ~2 GB — every 30B/65B geometry,
    and 7B at the full reference protocol — stage activations live in HOST
    numpy buffers and only one ``batch`` slice is resident per device step,
    with the quantized output leaves also written back to host. The device
    then holds one layer's weights + one Hessian + one calibration slice at a
    time, matching the reference's one-block-on-device discipline
    (reference quantize/gptq.py:74-75,116-129). ``host_spill=False`` keeps
    everything on device (fastest at small scale); ``True`` forces spilling.

    Returns params with the same quantized leaf layout as
    ``llama.quantize_params(config.replace(quantize="int4"))``.
    """
    import numpy as np

    n_samples, T = calib_tokens.shape
    rope_full = build_rope_cache(config.block_size, config.head_size)
    rope = jax.lax.slice_in_dim(rope_full, 0, T, axis=0)
    mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
    D = config.n_embd

    if host_spill is None:
        widest = max(D, config.intermediate_size)
        host_spill = n_samples * T * widest * 4 > 2 * 2**30

    wte = jnp.asarray(params["wte"])  # one device copy, not one per batch
    xs = _stage_concat(
        [
            jnp.take(wte, jnp.asarray(calib_tokens[b : b + batch]), axis=0).astype(
                jnp.float32
            )
            for b in range(0, n_samples, batch)
        ],
        host_spill,
    )
    del wte

    out = jax.tree_util.tree_map(lambda a: a, params)
    L = config.n_layer

    def _hessian(tap_batches):
        H = jnp.zeros((tap_batches[0].shape[-1],) * 2, jnp.float32)
        for t in tap_batches:
            if host_spill:
                # one batch slice on device at a time (the x2ᵀx2 partial sums
                # accumulate identically; only fp addition order differs)
                for b in range(0, t.shape[0], batch):
                    H = accumulate_hessian(H, jnp.asarray(t[b : b + batch]))
            else:
                H = accumulate_hessian(H, t)
        return H

    def _quantize_into(lp, t, H):
        w = jnp.asarray(_get(lp, t)["w"]).astype(jnp.float32)
        hinv = None
        if host_spill and H.shape[0] >= 16384:
            # the device triangular solve at this width OOMs on temps; invert
            # on host (from the permuted H when actorder reorders the walk)
            H_np = np.asarray(H)
            if actorder:
                perm_np = np.argsort(-np.diag(H_np))
                H_np = H_np[perm_np][:, perm_np]
            hinv = jnp.asarray(_hinv_cholesky_host(H_np))
        q, s, z = gptq_quantize_matrix(
            w, H, groupsize=groupsize, actorder=actorder, hinv=hinv
        )
        _get(lp, t).pop("w")
        if host_spill:
            _get(lp, t)["qw"] = np.asarray(pack_q4(q))
            _get(lp, t)["qscale"] = np.asarray(s)
            _get(lp, t)["qzero"] = np.asarray(z)
        else:
            _get(lp, t)["qw"] = pack_q4(q)
            _get(lp, t)["qscale"] = s
            _get(lp, t)["qzero"] = z

    def _batched(fn, *arrays):
        return _stage_concat(
            [
                fn(*(jnp.asarray(a[b : b + batch]) for a in arrays))
                for b in range(0, n_samples, batch)
            ],
            host_spill,
        )

    for layer in range(L):
        lp = jax.tree_util.tree_map(lambda a: a[layer], params["h"])
        # stage A: rms_1 output -> c_attn Hessian
        h1 = _batched(lambda x: rms_norm(x, lp["rms_1"]), xs)
        _quantize_into(lp, "attn.c_attn", _hessian([h1]))
        # stage B: attention outputs THROUGH the quantized c_attn -> c_proj H
        y = _batched(lambda h: _stage_attn(lp, h, rope, mask, config), h1)
        del h1
        _quantize_into(lp, "attn.c_proj", _hessian([y]))
        # stage C: residual + quantized c_proj -> rms_2 output (c_fc1/c_fc2
        # share it: neither depends on the other, so one Hessian serves both)
        x2 = _batched(lambda x, yy: x + linear(lp["attn"]["c_proj"], yy), xs, y)
        del y
        h2 = _batched(lambda x: rms_norm(x, lp["rms_2"]), x2)
        H_fc = _hessian([h2])
        _quantize_into(lp, "mlp.c_fc1", H_fc)
        _quantize_into(lp, "mlp.c_fc2", H_fc)
        # stage D: SwiGLU gate through the quantized up-projections
        gate = _batched(
            lambda h: jax.nn.silu(linear(lp["mlp"]["c_fc1"], h))
            * linear(lp["mlp"]["c_fc2"], h),
            h2,
        )
        del h2
        _quantize_into(lp, "mlp.c_proj", _hessian([gate]))
        # stage E: propagate through the fully quantized block
        xs = _batched(lambda x, g: x + linear(lp["mlp"]["c_proj"], g), x2, gate)
        del x2, gate
        # write the quantized leaves back into the stacked tree (host numpy
        # buffers when spilling — the full-model int4 tree at 65B is ~33 GB,
        # which must not pin HBM during calibration)
        for t in _BLOCK_TARGETS:
            dst = _get(out["h"], t)
            if "w" in dst:
                dst.pop("w")
                zeros_fn = np.zeros if host_spill else jnp.zeros
                dst["qw"] = zeros_fn((L,) + _get(lp, t)["qw"].shape, jnp.uint8)
                dst["qscale"] = zeros_fn(
                    (L,) + _get(lp, t)["qscale"].shape, jnp.float32
                )
                dst["qzero"] = zeros_fn(
                    (L,) + _get(lp, t)["qzero"].shape, jnp.float32
                )
            if host_spill:
                dst["qw"][layer] = _get(lp, t)["qw"]
                dst["qscale"][layer] = _get(lp, t)["qscale"]
                dst["qzero"][layer] = _get(lp, t)["qzero"]
            else:
                dst["qw"] = dst["qw"].at[layer].set(_get(lp, t)["qw"])
                dst["qscale"] = dst["qscale"].at[layer].set(_get(lp, t)["qscale"])
                dst["qzero"] = dst["qzero"].at[layer].set(_get(lp, t)["qzero"])

    # lm_head on final-norm output (reference: quantize/gptq.py:131-150)
    Hlm = jnp.zeros((D, D), jnp.float32)
    for b in range(0, n_samples, batch):
        h_b = rms_norm(jnp.asarray(xs[b : b + batch]), params["ln_f"])
        Hlm = accumulate_hessian(Hlm, h_b)
    q, s, z = gptq_quantize_matrix(
        jnp.asarray(params["lm_head"]["w"]).astype(jnp.float32), Hlm,
        groupsize=groupsize, actorder=actorder
    )
    if host_spill:
        out["lm_head"] = {
            "qw": np.asarray(pack_q4(q)),
            "qscale": np.asarray(s),
            "qzero": np.asarray(z),
        }
    else:
        out["lm_head"] = {"qw": pack_q4(q), "qscale": s, "qzero": z}
    return out
