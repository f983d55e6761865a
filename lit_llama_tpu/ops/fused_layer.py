"""Whole-layer fused decode kernel: ONE Pallas launch per transformer block.

Single-token decode at 7B is weight-bandwidth-bound, and round-2 profiling put
~2.2 ms of the 7.46 ms step OUTSIDE the matmul kernels: ~1.35 ms of fixed
per-launch gaps across 97 launches, 0.6 ms of XLA fusions (norms/rope/
attention/residuals) and 0.3 ms of operand relayout copies. This kernel runs
an ENTIRE block — rms_1, fused-QKV int4 matvec, RoPE, KV-cache row write,
decode attention over the cache, output projection, residual, rms_2, SwiGLU
int4 matvecs, residual — as one grid-less Pallas program that streams every
weight byte HBM->VMEM itself with double-buffered manual DMA (the guide's
run_scoped + make_async_copy pattern). 97 launches/step become 33
(32 layers + lm_head), and all inter-op XLA work disappears into VPU code
next to the dots.

Replaces (at decode shapes) the composition of the reference's per-op stack:
Triton int4 matmul (lit_llama/quantization.py:187-282), SDPA decode attention
(lit_llama/model.py:230), RMSNorm/rope/residual modules (model.py:148-168).

Layout contracts (all enforced by ``fused_layer_supported``):
* head_size == 128 — rope rides a half-rotation lane roll (``pltpu.roll``),
  which needs pairs (i, i+64) within one 128-lane register row.
* weights int4-packed half-split along K (ops/linear.pack_int4), EVEN group
  count per tensor, 128-multiple N.
* c_attn columns permuted per head to the half-rotation basis by
  ``prepare_fused_params`` (scores are invariant: q and k share the
  permutation; v and every other weight are untouched). The SAME model with
  ``config.rope_layout == "half"`` runs the standard XLA path for prefill.
* KV cache either f32 (1, H, S, hs) — exact-parity/test mode — or PACKED
  bf16 pairs as uint32 (1, H, S//2, hs): word (h, r, j) holds positions
  (2r, 2r+1)'s element j as (low | high << 16). The packing exists because
  this toolchain's Mosaic compiler crashes on any manual DMA of a sub-32-bit
  dtype at a dynamic offset (bisected on chip: f32/u32/i32 legal, bf16/u8
  fatal) — 32-bit words with in-kernel shift/mask+bitcast unpack keep bf16's
  HBM density with only 32-bit DMAs. The kernel updates the new position by
  read-modify-write of its word-row (input_output_aliased) at ``write_pos``
  and attends positions <= ``limit`` — ring-buffer semantics, matching
  roll-left overflow up to key order (see models/llama.py slot_pos path).

The matvec work vectors are (8, K) f32 with only row 0 live: M=1 padded to the
8-sublane tile, dots run (8, gs) @ (gs, bn) in the natural orientation (no
operand transposes — the round-2 finding that natural-layout operands are slow
applied to XLA's scheduling of separate kernels, not to VMEM-resident slices).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]

NEG_INF = float(-1e30)


# ---------------------------------------------------------------------------
# Packed (bf16-pair) KV cache layout
# ---------------------------------------------------------------------------


def pack_kv(x: jnp.ndarray) -> jnp.ndarray:
    """(..., S, hs) bf16 -> (..., S//2, hs) uint32: word = pos 2r | pos 2r+1 << 16.

    The decode kernels DMA the cache themselves, and this toolchain's Mosaic
    backend only accepts 32-bit dtypes for dynamically-addressed DMAs; packing
    two positions' bf16 elements per word keeps bf16 HBM density. S must be
    even (odd tails are the caller's to pad)."""
    lead, S, hs = x.shape[:-2], x.shape[-2], x.shape[-1]
    pairs = x.astype(jnp.bfloat16).reshape(*lead, S // 2, 2, hs)
    pairs = jnp.swapaxes(pairs, -1, -2)  # (..., S//2, hs, 2)
    return jax.lax.bitcast_convert_type(pairs, jnp.uint32)


def unpack_kv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_kv`: (..., S//2, hs) u32 -> (..., S, hs) bf16."""
    pairs = jax.lax.bitcast_convert_type(w, jnp.bfloat16)  # (..., S//2, hs, 2)
    pairs = jnp.swapaxes(pairs, -1, -2)  # (..., S//2, 2, hs)
    lead, S2, hs = pairs.shape[:-3], pairs.shape[-3], pairs.shape[-1]
    return pairs.reshape(*lead, S2 * 2, hs)


def _unpack_words(w: jnp.ndarray):
    """In-kernel: u32 pair words -> (even_f32, odd_f32), exact (bf16 widens by
    appending 16 zero bits)."""
    lo = pltpu.bitcast(w << 16, jnp.float32)
    hi = pltpu.bitcast(w & jnp.uint32(0xFFFF0000), jnp.float32)
    return lo, hi


def _bf16_bits(x: jnp.ndarray) -> jnp.ndarray:
    """In-kernel: f32 array -> its round-to-nearest-even bf16 bit pattern in
    the LOW 16 bits of a u32 (matches what `.astype(bfloat16)` would store)."""
    rounded = x.astype(jnp.bfloat16).astype(jnp.float32)
    return pltpu.bitcast(rounded, jnp.uint32) >> 16


# ---------------------------------------------------------------------------
# In-kernel building blocks
# ---------------------------------------------------------------------------


def _rms_norm_rows(x, w_ref, eps=1e-5):
    """(8, D) f32 row-wise RMSNorm; dead rows (all zero) stay zero."""
    ss = jnp.mean(x * x, axis=1, keepdims=True)
    return x * jax.lax.rsqrt(ss + eps) * w_ref[:].astype(jnp.float32)


def _add_lora_delta(src_ref, dst_ref, la_ref, lb_ref):
    """dst += (src @ la) @ lb — the folded low-rank QKV update (two small MXU
    dots; la (D, R8), lb (R8, 3D) from prepare_lora_operands). ~R8/K of the
    base matvec's FLOPs and <1% of its weight bytes at 7B rank 8."""
    ax = jax.lax.dot_general(
        src_ref[:], la_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dst_ref[:] = dst_ref[:] + jax.lax.dot_general(
        ax, lb_ref[:].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def blocked_scales(qs: jnp.ndarray, K: int, N: int, gs: int) -> jnp.ndarray:
    """Host-side relayout of a (G, N) scale/zero plane into the kernel's DMA
    unit: (NB, G8, bn) with bn = _pick_bn(N, K) and G8 = G rounded up to 8.

    On-chip bisection of this Mosaic toolchain found two independent DMA
    hazards at awkward G (e.g. 86 for 7B mlp.c_proj): column-sliced (strided)
    sources crash unless the row count is a multiple of 8 or in {1, 2, 4},
    and sliced VMEM destinations crash when the buffer's planes are not
    8-row-aligned. Pre-blocking makes every scale DMA a contiguous
    leading-index read into an aligned plane — the exact pattern the proven
    kernels (weight streams, cache streams) use."""
    G = K // gs
    assert qs.shape == (G, N), (qs.shape, G, N)
    bn = _pick_bn(N, K)
    G8 = _round8(G)
    q = jnp.pad(qs.astype(jnp.float32), ((0, G8 - G), (0, 0)))
    # (G8, NB, bn) -> (NB, G8, bn)
    return q.reshape(G8, N // bn, bn).transpose(1, 0, 2)


def _mv_dmas(bufs, sems, slot, nb, qw, qs, qz, *, Kh, bn, blocked):
    """The three async copies landing weight block ``nb`` into buffer ``slot``.

    Standalone (not a closure) so a PREVIOUS pipeline stage can start the next
    stage's block-0 copies into the free slot of the SHARED buffer set while
    its own last block computes (cross-stage prefetch — the stage-boundary
    bubble was the whole-layer kernel's remaining fixed cost). Waits construct
    an identical descriptor; Pallas matches them through the semaphore."""
    wbuf, sbuf, zbuf = bufs
    wn = bn
    w_src = qw.at[:, pl.ds(nb * bn, bn)]
    if blocked:
        s_src, z_src = qs.at[nb], qz.at[nb]
    else:
        s_src = qs.at[:, pl.ds(nb * bn, bn)]
        z_src = qz.at[:, pl.ds(nb * bn, bn)]
    # shared buffer sets are max-shaped over the stages they serve; land the
    # block in the leading corner (slices are static and tile-aligned). Use
    # the whole-plane form when the slice is full-extent — the exact DMA
    # pattern proven on chip for the self-contained path.
    sG = qs.shape[-2]  # G8 (blocked) or G (legacy column-slice layout)

    def dst(buf, rows, cols):
        if buf.shape[1:] == (rows, cols):
            return buf.at[slot]
        return buf.at[slot, :rows, :cols]

    w_dst = dst(wbuf, Kh, wn)
    s_dst = dst(sbuf, sG, bn)
    z_dst = dst(zbuf, sG, bn)
    return (
        pltpu.make_async_copy(w_src, w_dst, sems.at[slot, 0]),
        pltpu.make_async_copy(s_src, s_dst, sems.at[slot, 1]),
        pltpu.make_async_copy(z_src, z_dst, sems.at[slot, 2]),
    )


def _mv_int4(src_ref, dst_ref, qw, qs, qz, *, K, N, gs, bn, cdtype,
             residual_ref=None, sublanes=8, pipe=None):
    """dst[:, :N] = src @ dequant(qw) (+ residual), streaming the weight.

    src_ref: (8, K) f32 VMEM scratch (row 0 live). qw (K/2, N) u8 HBM,
    qs/qz (G, N) f32 HBM. One n-block per iteration, K untiled (decode blocks
    are K-major streams; the largest 7B stage is 5504 x bn bytes per block).

    ``pipe``: cross-stage pipelining state — dict with ``bufs`` (shared
    (wbuf, sbuf, zbuf) kernel-scope buffers), ``sems`` (2, 3), ``slot0``
    (static parity offset continuing the predecessor's double-buffer chain),
    ``started`` (block 0's DMAs were already launched by the predecessor) and
    ``next_start`` (callable(free_slot) run while the LAST block computes, to
    launch the successor's block-0 copies). None = self-contained run_scoped
    (the original behavior; interpret tests and unblocked-scale callers).
    """
    G = K // gs
    Gh = G // 2
    Kh = K // 2
    NB = N // bn
    # blocked scale planes (NB, G8, bn) from blocked_scales(): contiguous
    # leading-index DMA reads into 8-aligned buffer planes. The legacy (G, N)
    # layout (interpret tests, unprepared params) DMAs column slices — only
    # legal on chip for friendly G (see blocked_scales docstring).
    blocked = qs.ndim == 3
    G8 = qs.shape[-2] if blocked else G
    if blocked:
        assert qs.shape[-3:] == (NB, G8, bn) and G8 == _round8(G), (qs.shape, G, bn)
    if pipe is not None:
        assert blocked, "pipelined stages need blocked scales"

    # group sums of src for the factored zero-point term (f32, exact).
    # NOTE the lane-split reshape (8, K) -> (8, G, gs) is the one op here
    # outside the proven-on-chip Mosaic subset (gs = 128-multiple keeps it in
    # the supported (.., a*128) -> (.., a, 128) class); if it ever fails to
    # lower, fall back to per-group (8, 1) sums stored into a (8, G_pad)
    # scratch — slice stores are legal where scalar stores are not.
    gx = jnp.sum(
        src_ref[:].astype(jnp.float32).reshape(sublanes, G, gs), axis=2
    )  # (8, G)
    gx_lo, gx_hi = gx[:, :Gh], gx[:, Gh:]

    def stage(wbuf, sbuf, zbuf, sems, slot0=0, started=False, next_start=None):
        def dmas(slot, nb):
            return _mv_dmas(
                (wbuf, sbuf, zbuf), sems, slot, nb, qw, qs, qz,
                Kh=Kh, bn=bn, blocked=blocked,
            )

        # whole-plane reads when the buffer is exact-shape (self-contained
        # path) — identical semantics, but keep the original access form the
        # proven kernels lower; sliced reads only for SHARED max-shaped sets
        w_exact = wbuf.shape[1:] == (Kh, bn)
        s_exact = sbuf.shape[-1] == bn  # row slices don't care about G8max

        def w_read(slot):
            return wbuf[slot] if w_exact else wbuf[slot, :Kh, :bn]

        def srow(slot, a, b):
            return sbuf[slot, a:b] if s_exact else sbuf[slot, a:b, :bn]

        def zrow(slot, a, b):
            return zbuf[slot, a:b] if s_exact else zbuf[slot, a:b, :bn]

        # Nibble decode strategy (VPU-unpack-bound kernels, ~82% of HBM peak):
        #   i32 (default): widen u8->i32, mask & shift, cast each half to
        #     cdtype.
        #   arith: cast bytes to cdtype ONCE, then high = floor(B/16),
        #     low = B - 16*high — every value (B<=255, high<=15, low<=15,
        #     16*high<=240) is exact in bf16's 8-bit significand, and the
        #     arithmetic runs at twice the register density of i32 ops.
        # Read at TRACE time — A/B across processes (profile_decode.py).
        import os

        arith_unpack = os.environ.get("LIT_LLAMA_TPU_UNPACK", "i32") == "arith"

        if not started:
            for d in dmas(slot0, 0):
                d.start()
        for nb in range(NB):  # static: block count is shape-derived
            slot = (nb + slot0) % 2
            if nb + 1 < NB:
                for d in dmas((nb + 1 + slot0) % 2, nb + 1):
                    d.start()
            elif next_start is not None:
                # cross-stage prefetch: launch the successor's block-0 copies
                # into the free slot while this last block computes
                next_start((nb + 1 + slot0) % 2)
            for d in dmas(slot, nb):
                d.wait()
            if arith_unpack:
                # (Kh, bn) exact byte values; this Mosaic toolchain supports
                # neither u8->bf16 nor u8->f32 directly — widen u8->i32->f32
                # ->bf16 once per block (the i32 plane is what the default
                # path materializes anyway); the per-group nibble math then
                # runs in bf16 at 2x the register density of i32 shift/mask.
                pf = (
                    w_read(slot)
                    .astype(jnp.int32)
                    .astype(jnp.float32)
                    .astype(cdtype)
                )
            else:
                p32 = w_read(slot).astype(jnp.int32)  # (Kh, bn)
            acc = jax.lax.dot_general(
                gx_lo, zrow(slot, 0, Gh), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc += jax.lax.dot_general(
                gx_hi, zrow(slot, Gh, G), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for g in range(Gh):
                xlo = src_ref[:, g * gs : (g + 1) * gs].astype(cdtype)
                xhi = src_ref[:, Kh + g * gs : Kh + (g + 1) * gs].astype(cdtype)
                if arith_unpack:
                    brows = pf[g * gs : (g + 1) * gs]
                    high_q = jnp.floor(brows * jnp.asarray(0.0625, cdtype))
                    low_q = brows - high_q * jnp.asarray(16.0, cdtype)
                else:
                    rows = p32[g * gs : (g + 1) * gs]
                    low_q = (rows & 0xF).astype(cdtype)
                    high_q = (rows >> 4).astype(cdtype)
                lo_dot = jax.lax.dot_general(
                    xlo, low_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                hi_dot = jax.lax.dot_general(
                    xhi, high_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc += lo_dot * srow(slot, g, g + 1)
                acc += hi_dot * srow(slot, Gh + g, Gh + g + 1)
            if residual_ref is not None:
                acc += residual_ref[:, nb * bn : (nb + 1) * bn]
            dst_ref[:, nb * bn : (nb + 1) * bn] = acc.astype(dst_ref.dtype)

    if pipe is None:
        pl.run_scoped(
            stage,
            pltpu.VMEM((2, Kh, bn), jnp.uint8),
            pltpu.VMEM((2, G8, bn), jnp.float32),
            pltpu.VMEM((2, G8, bn), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        )
    else:
        wb, sb, zb = pipe["bufs"]
        stage(
            wb, sb, zb, pipe["sems"],
            slot0=pipe.get("slot0", 0),
            started=pipe.get("started", False),
            next_start=pipe.get("next_start"),
        )


def _decode_attention(q3_ref, kc, vc, o_ref, limit, *, H, S, hs, bs, packed,
                      cdtype):
    """Online-softmax decode attention for one query row per head.

    q3_ref (H, hs) VMEM; kc/vc HBM refs (the aliased cache OUTPUT refs, read
    after the new row's write completed): (1, H, S, hs) f32 direct mode, or
    (1, H, S//2, hs) u32 packed bf16 pairs. o_ref (H, hs) f32 VMEM out.
    Key position p visible iff p <= limit. ``bs`` counts POSITIONS per block
    (even in packed mode). Head-batched VPU multiply-reduce (the round-2
    finding: M=1 MXU dots per head pay a fixed pass latency each;
    see ops/decode_attention.py).
    """
    scale = 1.0 / (hs**0.5)
    NSB = S // bs
    rows_per_blk = bs // 2 if packed else bs  # DMA'd cache rows per block
    buf_dtype = jnp.uint32 if packed else jnp.dtype(cdtype)

    def stage(kbuf, vbuf, m_s, l_s, acc_s, sems):
        def dmas(slot, sb):
            r0 = sb * rows_per_blk
            k_src = kc.at[0, :, pl.ds(r0, rows_per_blk), :]
            v_src = vc.at[0, :, pl.ds(r0, rows_per_blk), :]
            return (
                pltpu.make_async_copy(k_src, kbuf.at[slot], sems.at[slot, 0]),
                pltpu.make_async_copy(v_src, vbuf.at[slot], sems.at[slot, 1]),
            )

        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)
        for d in dmas(0, 0):
            d.start()
        q3 = q3_ref[:].astype(jnp.float32)
        for sb in range(NSB):
            slot = sb % 2
            if sb + 1 < NSB:
                for d in dmas((sb + 1) % 2, sb + 1):
                    d.start()
            for d in dmas(slot, sb):
                d.wait()
            base = sb * bs

            @pl.when(base <= limit)
            def _():
                if packed:
                    k_lo, k_hi = _unpack_words(kbuf[slot])  # (H, bs/2, hs) f32
                    s_lo = jnp.sum(k_lo * q3[:, None, :], axis=-1) * scale
                    s_hi = jnp.sum(k_hi * q3[:, None, :], axis=-1) * scale
                    iw = jax.lax.broadcasted_iota(
                        jnp.int32, (1, rows_per_blk), 1
                    )
                    rows_lo = base + 2 * iw
                    s_lo = jnp.where(rows_lo <= limit, s_lo, NEG_INF)
                    s_hi = jnp.where(rows_lo + 1 <= limit, s_hi, NEG_INF)
                    m_prev = m_s[:]
                    m_new = jnp.maximum(
                        m_prev,
                        jnp.maximum(
                            jnp.max(s_lo, axis=-1, keepdims=True),
                            jnp.max(s_hi, axis=-1, keepdims=True),
                        ),
                    )
                    alpha = jnp.exp(m_prev - m_new)
                    p_lo = jnp.exp(s_lo - m_new)
                    p_hi = jnp.exp(s_hi - m_new)
                    l_s[:] = l_s[:] * alpha + jnp.sum(
                        p_lo, axis=-1, keepdims=True
                    ) + jnp.sum(p_hi, axis=-1, keepdims=True)
                    m_s[:] = m_new
                    v_lo, v_hi = _unpack_words(vbuf[slot])
                    pv = jnp.sum(p_lo[:, :, None] * v_lo, axis=1) + jnp.sum(
                        p_hi[:, :, None] * v_hi, axis=1
                    )  # (H, hs)
                    acc_s[:] = acc_s[:] * alpha + pv
                else:
                    k3 = kbuf[slot].astype(jnp.float32)  # (H, bs, hs)
                    s = jnp.sum(k3 * q3[:, None, :], axis=-1) * scale
                    rows = jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1) + base
                    s = jnp.where(rows <= limit, s, NEG_INF)
                    m_prev = m_s[:]
                    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
                    alpha = jnp.exp(m_prev - m_new)
                    p = jnp.exp(s - m_new)
                    l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
                    m_s[:] = m_new
                    pv = jnp.sum(
                        p[:, :, None] * vbuf[slot].astype(jnp.float32), axis=1
                    )  # (H, hs)
                    acc_s[:] = acc_s[:] * alpha + pv

        o_ref[:] = acc_s[:] / jnp.maximum(l_s[:], 1e-30)

    pl.run_scoped(
        stage,
        pltpu.VMEM((2, H, rows_per_blk, hs), buf_dtype),
        pltpu.VMEM((2, H, rows_per_blk, hs), buf_dtype),
        pltpu.VMEM((H, 1), jnp.float32),
        pltpu.VMEM((H, 1), jnp.float32),
        pltpu.VMEM((H, hs), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 2)),
    )


# ---------------------------------------------------------------------------
# The whole-layer kernel
# ---------------------------------------------------------------------------


def _layer_kernel(
    # scalars (SMEM)
    wp_ref, limit_ref,
    # small VMEM operands: x, cos, sin, then per layer rms1, rms2 (+ la, lb
    # when lora) — followed by the HBM weight planes (12 per layer), the
    # aliased caches, outputs and scratch
    x_ref, cos_ref, sin_ref,
    *refs,
    n_lyr, D, I, H, S, hs, gs, bn_ca, bn_cp, bn_f12, bn_mp, bs, packed,
    cdtype, lora=False, pipelined=False,
):
    """``n_lyr`` transformer blocks in ONE launch. Multi-layer launches halve
    (or better) the per-launch gap count of the decode chain, and the
    cross-stage DMA chain continues ACROSS the layer boundary: layer j's
    mlp.c_proj prefetches layer j+1's c_attn block 0. Slot parity is plain
    Python arithmetic here because every layer is statically unrolled."""
    per = 2 + (2 if lora else 0)
    small = refs[: per * n_lyr]
    refs = refs[per * n_lyr:]
    whbm = refs[: 12 * n_lyr]
    refs = refs[12 * n_lyr:]
    refs = refs[2 * n_lyr:]  # kc_in/vc_in (aliased; the _out refs are used)
    xo_ref = refs[0]
    kc_out = refs[1 : 1 + n_lyr]
    vc_out = refs[1 + n_lyr : 1 + 2 * n_lyr]
    (xs, h, qkv, fg, gg, q3, knew, vnew, *pipe_refs) = refs[1 + 2 * n_lyr:]
    wp = wp_ref[0]
    limit = limit_ref[0]

    W = [
        dict(zip(("ca_qw", "ca_qs", "ca_qz", "cp_qw", "cp_qs", "cp_qz",
                  "f12_qw", "f12_qs", "f12_qz", "mp_qw", "mp_qs", "mp_qz"),
                 whbm[12 * j : 12 * (j + 1)]))
        for j in range(n_lyr)
    ]
    SM = [small[per * j : per * (j + 1)] for j in range(n_lyr)]

    # Cross-stage DMA pipelining (round-5 single-stream lever): the weight
    # streams chain through kernel-scope shared buffer sets — A (K = D:
    # c_attn, attn.c_proj, c_fc12) and B (K = I: mlp.c_proj) — so each
    # stage's block-0 copies are launched by its PREDECESSOR's last block
    # instead of cold at stage entry. The stage-boundary bubble (block-0
    # fetch + DMA issue, x4 stages x L layers) was the chain's remaining
    # fixed cost.
    pipes = [None] * n_lyr
    if pipelined:
        pwA, psA, pzA, semA, pwB, psB, pzB, semB = pipe_refs
        bufsA, bufsB = (pwA, psA, pzA), (pwB, psB, pzB)
        NB_ca, NB_cp, NB_f12 = 3 * D // bn_ca, D // bn_cp, 2 * I // bn_f12
        NB_mp = D // bn_mp

        def start_stage(bufs, sems, w, pfx, Kh_, bn_, slot_):
            def go(_free):
                for d in _mv_dmas(
                    bufs, sems, slot_, 0,
                    w[pfx + "_qw"], w[pfx + "_qs"], w[pfx + "_qz"],
                    Kh=Kh_, bn=bn_, blocked=True,
                ):
                    d.start()

            return go

        baseA = baseB = 0
        plan = []
        for j in range(n_lyr):
            s_ca = baseA
            s_cp = (s_ca + NB_ca) % 2
            s_f12 = (s_cp + NB_cp) % 2
            s_mp = baseB
            baseA = (s_f12 + NB_f12) % 2
            baseB = (s_mp + NB_mp) % 2
            plan.append((s_ca, s_cp, s_f12, s_mp))
        for j in range(n_lyr):
            s_ca, s_cp, s_f12, s_mp = plan[j]
            w = W[j]
            # mp's successor: the NEXT layer's ca (cross-layer prefetch)
            if j + 1 < n_lyr:
                nxt = start_stage(
                    bufsA, semA, W[j + 1], "ca", D // 2, bn_ca, plan[j + 1][0]
                )
            else:
                nxt = None
            pipes[j] = dict(
                ca=dict(bufs=bufsA, sems=semA, slot0=s_ca, started=True,
                        next_start=start_stage(bufsA, semA, w, "cp", D // 2,
                                               bn_cp, s_cp)),
                cp=dict(bufs=bufsA, sems=semA, slot0=s_cp, started=True,
                        next_start=start_stage(bufsA, semA, w, "f12", D // 2,
                                               bn_f12, s_f12)),
                f12=dict(bufs=bufsA, sems=semA, slot0=s_f12, started=True,
                         next_start=start_stage(bufsB, semB, w, "mp", I // 2,
                                                bn_mp, s_mp)),
                mp=dict(bufs=bufsB, sems=semB, slot0=s_mp, started=True,
                        next_start=nxt),
            )
        # layer 0's ca block 0 starts NOW, at kernel entry — the residual
        # init and rms_1 hide its fetch (nothing about it depends on x)
        for d in _mv_dmas(
            bufsA, semA, plan[0][0], 0,
            W[0]["ca_qw"], W[0]["ca_qs"], W[0]["ca_qz"],
            Kh=D // 2, bn=bn_ca, blocked=True,
        ):
            d.start()

    # residual stream: row 0 live, rows 1-7 identically zero
    xs[:] = jnp.zeros_like(xs)
    xs[0:1, :] = x_ref[:].astype(jnp.float32)
    rot = pltpu.roll  # pairs (i, i+hs/2) rotate within one lane row
    cosf = cos_ref[:].astype(jnp.float32)  # (1, hs)
    sinf = sin_ref[:]

    for j in range(n_lyr):
        w = W[j]
        rms1_ref, rms2_ref = SM[j][0], SM[j][1]
        la_ref, lb_ref = (SM[j][2], SM[j][3]) if lora else (None, None)
        pj = pipes[j] or {}
        kco, vco = kc_out[j], vc_out[j]

        # ---- attention half ------------------------------------------------
        h[:] = _rms_norm_rows(xs[:], rms1_ref)
        _mv_int4(h, qkv, w["ca_qw"], w["ca_qs"], w["ca_qz"], K=D, N=3 * D,
                 gs=gs, bn=bn_ca, cdtype=cdtype, pipe=pj.get("ca"))
        if lora:
            _add_lora_delta(h, qkv, la_ref, lb_ref)

        # per-head extraction (lane-aligned (1, hs) copies; no cross-lane
        # reshape)
        for head in range(H):
            qh = qkv[0:1, head * hs : (head + 1) * hs].astype(jnp.float32)
            kh = qkv[0:1, D + head * hs : D + (head + 1) * hs].astype(
                jnp.float32
            )
            vh = qkv[0:1, 2 * D + head * hs : 2 * D + (head + 1) * hs]
            q3[head : head + 1, :] = qh * cosf + rot(qh, hs // 2, axis=1) * sinf
            krow = kh * cosf + rot(kh, hs // 2, axis=1) * sinf
            if packed:
                knew[head : head + 1, :] = _bf16_bits(krow)
                vnew[head : head + 1, :] = _bf16_bits(vh.astype(jnp.float32))
            else:
                knew[head, 0:1, :] = krow.astype(knew.dtype)
                vnew[head, 0:1, :] = vh.astype(vnew.dtype)

        # write the new position in place, then attend over the cache
        # including it
        if packed:
            wr = wp // 2
            hi_half = jax.lax.rem(wp, 2) == 1

            def write_rows(kb, vb, sems, kco=kco, vco=vco, hi_half=hi_half,
                           wr=wr):
                rk = pltpu.make_async_copy(
                    kco.at[0, :, pl.ds(wr, 1), :], kb, sems.at[0]
                )
                rv = pltpu.make_async_copy(
                    vco.at[0, :, pl.ds(wr, 1), :], vb, sems.at[1]
                )
                rk.start()
                rv.start()
                rk.wait()
                rv.wait()
                oldk = kb[:, 0, :]
                kb[:, 0, :] = jnp.where(
                    hi_half,
                    (oldk & jnp.uint32(0xFFFF)) | (knew[:] << 16),
                    (oldk & jnp.uint32(0xFFFF0000)) | knew[:],
                )
                oldv = vb[:, 0, :]
                vb[:, 0, :] = jnp.where(
                    hi_half,
                    (oldv & jnp.uint32(0xFFFF)) | (vnew[:] << 16),
                    (oldv & jnp.uint32(0xFFFF0000)) | vnew[:],
                )
                wk = pltpu.make_async_copy(
                    kb, kco.at[0, :, pl.ds(wr, 1), :], sems.at[0]
                )
                wv = pltpu.make_async_copy(
                    vb, vco.at[0, :, pl.ds(wr, 1), :], sems.at[1]
                )
                wk.start()
                wv.start()
                wk.wait()
                wv.wait()

            pl.run_scoped(
                write_rows,
                pltpu.VMEM((H, 1, hs), jnp.uint32),
                pltpu.VMEM((H, 1, hs), jnp.uint32),
                pltpu.SemaphoreType.DMA((2,)),
            )
        else:

            def write_rows(sems, kco=kco, vco=vco):
                kd = pltpu.make_async_copy(
                    knew, kco.at[0, :, pl.ds(wp, 1), :], sems.at[0]
                )
                vd = pltpu.make_async_copy(
                    vnew, vco.at[0, :, pl.ds(wp, 1), :], sems.at[1]
                )
                kd.start()
                vd.start()
                kd.wait()
                vd.wait()

            pl.run_scoped(write_rows, pltpu.SemaphoreType.DMA((2,)))

        def att_out(y_s, kco=kco, vco=vco):
            _decode_attention(q3, kco, vco, y_s, limit, H=H, S=S, hs=hs,
                              bs=bs, packed=packed, cdtype=cdtype)
            h[:] = jnp.zeros_like(h)
            for head in range(H):
                h[0:1, head * hs : (head + 1) * hs] = y_s[head : head + 1, :]

        pl.run_scoped(att_out, pltpu.VMEM((H, hs), jnp.float32))

        _mv_int4(h, xs, w["cp_qw"], w["cp_qs"], w["cp_qz"], K=D, N=D, gs=gs,
                 bn=bn_cp, cdtype=cdtype, residual_ref=xs, pipe=pj.get("cp"))

        # ---- MLP half ------------------------------------------------------
        h[:] = _rms_norm_rows(xs[:], rms2_ref)
        _mv_int4(h, fg, w["f12_qw"], w["f12_qs"], w["f12_qz"], K=D, N=2 * I,
                 gs=gs, bn=bn_f12, cdtype=cdtype, pipe=pj.get("f12"))
        gg[:] = jax.nn.silu(fg[:, :I]) * fg[:, I:]
        _mv_int4(gg, xs, w["mp_qw"], w["mp_qs"], w["mp_qz"], K=I, N=D, gs=gs,
                 bn=bn_mp, cdtype=cdtype, residual_ref=xs, pipe=pj.get("mp"))

    xo_ref[:] = xs[0:1, :].astype(xo_ref.dtype)


def _pick_bn(N: int, K: int) -> int:
    """Widest 128-multiple divisor of N whose double-buffered packed weight
    block (2 x K/2 x bn bytes) stays within ~4 MB of VMEM next to the
    persistent work vectors (non-power candidates cover the 32000 vocab)."""
    cap = max(128, (4 * 1024 * 1024) // K)
    for bn in (2048, 1280, 1024, 640, 512, 256, 128):
        if bn <= cap and N % bn == 0:
            return bn
    raise ValueError(f"N={N} has no 128-multiple block divisor <= {cap}")


def _pick_bs(S: int, H: int, hs: int, itemsize: int) -> int:
    """Cache-streaming block (POSITIONS per iteration): k and v are
    double-buffered (4 live (H, bs, hs)-equivalent buffers), which must stay
    within ~8 MB of VMEM next to the persistent work vectors (7B H=32:
    bs <= 256). Packed u32 buffers hold bs/2 word rows — same bytes as bf16,
    so callers pass itemsize=2 for the packed layout."""
    cap = max(128, (8 * 1024 * 1024) // (4 * H * hs * itemsize))
    if S <= cap:
        return S
    for bs in (512, 256, 128):
        if bs <= cap and S % bs == 0:
            return bs
    raise ValueError(f"S={S} not tileable (need S % 128 == 0 for S > {cap})")


_W12 = ("ca_qw", "ca_qs", "ca_qz", "cp_qw", "cp_qs", "cp_qz",
        "f12_qw", "f12_qs", "f12_qz", "mp_qw", "mp_qs", "mp_qz")


@functools.partial(
    jax.jit,
    static_argnames=("n_lyr", "D", "I", "H", "S", "hs", "gs", "cdtype",
                     "interpret"),
)
def _call_layers(
    wp, limit, x, cosf, sinf, smalls, weights, kcs, vcs,
    *, n_lyr, D, I, H, S, hs, gs, cdtype, interpret=False,
):
    """``n_lyr`` blocks in one launch. ``smalls``: per-layer (rms1, rms2
    [, la, lb]); ``weights``: per-layer dicts of the 12 HBM planes;
    ``kcs``/``vcs``: per-layer caches (aliased in place)."""
    packed = kcs[0].dtype == jnp.uint32
    lora = len(smalls[0]) == 4
    bn_ca = _pick_bn(3 * D, D)
    bn_cp = _pick_bn(D, D)
    bn_f12 = _pick_bn(2 * I, D)
    bn_mp = _pick_bn(D, I)
    bs = _pick_bs(S, H, hs, 2 if packed else kcs[0].dtype.itemsize)
    # cross-stage pipelining needs the blocked scale layout on EVERY stage
    # (tiny test vocabs can leave individual planes in the legacy layout)
    pipelined = all(
        w[k].ndim == 3 for w in weights
        for k in ("ca_qs", "cp_qs", "f12_qs", "mp_qs")
    ) and weights[0]["ca_qw"].dtype == jnp.uint8
    if pipelined and bs > 128 and S % 128 == 0:
        # the shared stage buffers (~7 MB) live for the whole kernel; halve
        # the attention streaming block so peak VMEM stays under the core's
        # ~16 MB (1 MB cache DMAs still amortize issue cost fully)
        bs = 128
    kernel = functools.partial(
        _layer_kernel, n_lyr=n_lyr, D=D, I=I, H=H, S=S, hs=hs, gs=gs,
        bn_ca=bn_ca, bn_cp=bn_cp, bn_f12=bn_f12, bn_mp=bn_mp, bs=bs,
        packed=packed, cdtype=jnp.dtype(cdtype), lora=lora,
        pipelined=pipelined,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    kbytes = (D * D // 2 * 4 + D * I // 2 * 3) * n_lyr
    new_shape = (
        (pltpu.VMEM((H, hs), jnp.uint32),) * 2
        if packed
        else (pltpu.VMEM((H, 1, hs), kcs[0].dtype),) * 2
    )
    per = len(smalls[0])
    flat_small = [t for sm in smalls for t in sm]
    flat_w = [w[k] for w in weights for k in _W12]
    n_in = 5 + per * n_lyr + 12 * n_lyr + 2 * n_lyr
    kc0 = 5 + per * n_lyr + 12 * n_lyr
    aliases = {}
    for j in range(n_lyr):
        aliases[kc0 + j] = 1 + j
        aliases[kc0 + n_lyr + j] = 1 + n_lyr + j
    R8 = smalls[0][2].shape[-1] if lora else 0
    out = pl.pallas_call(
        kernel,
        out_shape=(
            (jax.ShapeDtypeStruct((1, D), x.dtype),)
            + tuple(jax.ShapeDtypeStruct(c.shape, c.dtype) for c in kcs)
            + tuple(jax.ShapeDtypeStruct(c.shape, c.dtype) for c in vcs)
        ),
        in_specs=[smem, smem] + [vmem] * (3 + per * n_lyr)
        + [hbm] * (12 * n_lyr)
        + [hbm] * (2 * n_lyr),
        out_specs=(vmem,) + (hbm,) * (2 * n_lyr),
        input_output_aliases=aliases,
        scratch_shapes=[
            pltpu.VMEM((8, D), jnp.float32),       # xs
            pltpu.VMEM((8, D), jnp.float32),       # h (normed vec / attn out)
            pltpu.VMEM((8, 3 * D), jnp.float32),   # qkv
            pltpu.VMEM((8, 2 * I), jnp.float32),   # fc12 out
            pltpu.VMEM((8, I), jnp.float32),       # gate
            pltpu.VMEM((H, hs), jnp.float32),      # q3 (rotated query, f32)
            new_shape[0],                          # knew (bits / row)
            new_shape[1],                          # vnew
        ]
        + (
            [
                # shared weight-stream buffer sets for the stage chain:
                # A serves the K=D stages (ca/cp/f12), B the K=I stage (mp)
                pltpu.VMEM((2, D // 2, max(bn_ca, bn_cp, bn_f12)), jnp.uint8),
                pltpu.VMEM(
                    (2, _round8(D // gs), max(bn_ca, bn_cp, bn_f12)),
                    jnp.float32,
                ),
                pltpu.VMEM(
                    (2, _round8(D // gs), max(bn_ca, bn_cp, bn_f12)),
                    jnp.float32,
                ),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.VMEM((2, I // 2, bn_mp), jnp.uint8),
                pltpu.VMEM((2, _round8(I // gs), bn_mp), jnp.float32),
                pltpu.VMEM((2, _round8(I // gs), bn_mp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ]
            if pipelined
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * (4 * D * D + 3 * D * I) + 4 * H * S * hs
                   + (2 * R8 * (D + 3 * D) if lora else 0)) * n_lyr,
            bytes_accessed=kbytes + 2 * H * S * hs * 2 * n_lyr,
            transcendentals=(H * S + 2 * I) * n_lyr,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        wp, limit, x, cosf, sinf, *flat_small, *flat_w, *kcs, *vcs,
    )
    xo = out[0]
    return xo, out[1 : 1 + n_lyr], out[1 + n_lyr : 1 + 2 * n_lyr]


def _layer_operands(lp, D):
    """(smalls tuple, weights dict) for one prepared layer."""
    ca_s, ca_z = _scale_pair(lp["attn"]["c_attn"])
    cp_s, cp_z = _scale_pair(lp["attn"]["c_proj"])
    f12_s, f12_z = _scale_pair(lp["mlp"]["c_fc12"])
    mp_s, mp_z = _scale_pair(lp["mlp"]["c_proj"])
    weights = {
        "ca_qw": lp["attn"]["c_attn"]["qw"], "ca_qs": ca_s, "ca_qz": ca_z,
        "cp_qw": lp["attn"]["c_proj"]["qw"], "cp_qs": cp_s, "cp_qz": cp_z,
        "f12_qw": lp["mlp"]["c_fc12"]["qw"], "f12_qs": f12_s, "f12_qz": f12_z,
        "mp_qw": lp["mlp"]["c_proj"]["qw"], "mp_qs": mp_s, "mp_qz": mp_z,
    }
    small = [lp["rms_1"].reshape(1, D), lp["rms_2"].reshape(1, D)]
    if "lora_af" in lp["attn"]["c_attn"]:
        small += [lp["attn"]["c_attn"]["lora_af"],
                  lp["attn"]["c_attn"]["lora_bf"]]
    return tuple(small), weights


def decode_layers_fused(
    x: jnp.ndarray,  # (1, D) compute dtype
    lps,  # sequence of prepared layer params
    kvs,  # matching sequence of {"k", "v"} caches
    cosf: jnp.ndarray,
    sinf: jnp.ndarray,
    write_pos: jnp.ndarray,  # () int32 ring write slot (= pos % S)
    limit: jnp.ndarray,  # () int32 visibility bound (= pos)
    config,
    interpret: bool = False,
):
    """``len(lps)`` fused blocks in ONE Pallas launch (the round-5 launch-gap
    lever: 33 launches/step -> 32/n + 1, with the weight-stream DMA chain
    continuing across the in-launch layer boundaries). Returns
    (x_out, [updated cache dicts])."""
    D, H, hs = config.n_embd, config.n_head, config.head_size
    I = config.intermediate_size
    packed = kvs[0]["k"].dtype == jnp.uint32
    S = kvs[0]["k"].shape[-2] * (2 if packed else 1)
    smalls, weights = zip(*(_layer_operands(lp, D) for lp in lps))
    xo, kcs, vcs = _call_layers(
        jnp.asarray(write_pos, jnp.int32).reshape(1),
        jnp.asarray(limit, jnp.int32).reshape(1),
        x, cosf, sinf, tuple(smalls), tuple(weights),
        tuple(kv["k"] for kv in kvs), tuple(kv["v"] for kv in kvs),
        n_lyr=len(lps), D=D, I=I, H=H, S=S, hs=hs,
        gs=config.quant_groupsize,
        cdtype=jnp.dtype(config.compute_dtype).name, interpret=interpret,
    )
    return xo, [{"k": kc, "v": vc} for kc, vc in zip(kcs, vcs)]


def decode_layer_fused(
    x: jnp.ndarray,  # (1, D) compute dtype
    lp: Params,  # prepared layer params (see prepare_fused_params)
    kv: Dict[str, jnp.ndarray],  # {"k", "v"}: (1, H, S, hs) f32 or packed
    #   (1, H, S//2, hs) uint32 bf16 pairs (see pack_kv)
    cosf: jnp.ndarray,  # (1, hs) f32 half-basis cos row at this position
    sinf: jnp.ndarray,  # (1, hs) f32 SIGNED sin row (see rope.rope_half_row)
    write_pos: jnp.ndarray,  # () int32 ring write slot (= pos % S)
    limit: jnp.ndarray,  # () int32 visibility bound (= pos)
    config,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One fused block step. Returns (x_out (1, D), updated cache dict)."""
    xo, kvs = decode_layers_fused(
        x, (lp,), (kv,), cosf, sinf, write_pos, limit, config,
        interpret=interpret,
    )
    return xo, kvs[0]


# ---------------------------------------------------------------------------
# Parameter preparation (host-side, once at load)
# ---------------------------------------------------------------------------


def _head_kernel(x_ref, lnw_ref, qw, qs, qz, o_ref, xs, logits, *, D, V, gs, bn,
                 cdtype):
    """ln_f + int4 lm_head matvec in one launch (the last of the 33)."""
    xs[:] = jnp.zeros_like(xs)
    xs[0:1, :] = x_ref[:].astype(jnp.float32)
    xs[:] = _rms_norm_rows(xs[:], lnw_ref)
    _mv_int4(xs, logits, qw, qs, qz, K=D, N=V, gs=gs, bn=bn, cdtype=cdtype)
    o_ref[:] = logits[0:1, :].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("D", "V", "gs", "cdtype", "interpret"))
def _call_head(x, lnw, qw, qs, qz, *, D, V, gs, cdtype, interpret=False):
    bn = _pick_bn(V, D)
    kernel = functools.partial(
        _head_kernel, D=D, V=V, gs=gs, bn=bn, cdtype=jnp.dtype(cdtype)
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, V), x.dtype),
        in_specs=[vmem, vmem, hbm, hbm, hbm],
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((8, D), jnp.float32),
            pltpu.VMEM((8, V), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * D * V, bytes_accessed=D * V // 2, transcendentals=0
        ),
        interpret=interpret,
    )(x, lnw.reshape(1, D), qw, qs, qz)


def lm_head_fused(x, ln_w, head: Params, config, interpret: bool = False):
    """Fused final-norm + lm_head logits for one decode token: (1, D)->(1, V)."""
    qs, qz = _scale_pair(head)
    return _call_head(
        x, ln_w, head["qw"], qs, qz,
        D=config.n_embd, V=head["qw"].shape[-1], gs=config.quant_groupsize,
        cdtype=jnp.dtype(config.compute_dtype).name, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Batched (serving) block-half kernels: the slot_pos decode step at B slots.
# The per-slot attention + cache write lives in its own kernel
# (ops/decode_attention.decode_attention_write_pallas); these two fuse
# everything around it, so a batched block is 3 launches instead of 5 + the
# XLA norm/rope/silu/residual fusions between them.
# ---------------------------------------------------------------------------


def _rot_half_lanes(x, cos3, sin3, head_mask):
    """Vectorized half-rotation across concatenated head lanes: for lane l,
    the partner is l+64 within its own 128-lane head block — select between a
    left and a right roll by 64 on the lane-position mask (no reshapes)."""
    left = pltpu.roll(x, 64, axis=1)  # x[(l + 64) mod N]
    right = pltpu.roll(x, x.shape[1] - 64, axis=1)  # x[(l - 64) mod N]
    return x * cos3 + jnp.where(head_mask, left, right) * sin3


def _block_head_kernel(
    x_ref, rms1_ref, cos3_ref, sin3_ref, *refs,
    B, D, gs, bn, cdtype, lora=False,
):
    """rms_1 + int4 QKV matvec (+ LoRA low-rank update) + RoPE (half basis)
    for B slots: (B, D) -> rotated fused-QKV (B, 3D). cos3/sin3 are per-slot
    lane tables over the full 3D width (ones/zeros on the v section)."""
    if lora:
        la_ref, lb_ref = refs[0], refs[1]
        refs = refs[2:]
    qw, qs, qz, o_ref, xs, qkv = refs
    xs[:] = _rms_norm_rows(x_ref[:].astype(jnp.float32), rms1_ref)
    _mv_int4(xs, qkv, qw, qs, qz, K=D, N=3 * D, gs=gs, bn=bn, cdtype=cdtype,
             sublanes=xs.shape[0])
    if lora:
        _add_lora_delta(xs, qkv, la_ref, lb_ref)
    # full-shape iota: a (1, N) mask broadcast against (B, N) operands hits a
    # Mosaic vector.broadcast verifier bug at B=64 (element-type mismatch on
    # the predicated select) — build the mask at operand shape instead
    lanes = jax.lax.broadcasted_iota(jnp.int32, (xs.shape[0], 3 * D), 1)
    head_mask = (lanes % 128) < 64
    rot = _rot_half_lanes(qkv[:], cos3_ref[:], sin3_ref[:], head_mask)
    o_ref[:] = rot[:B].astype(o_ref.dtype)


def _block_tail_kernel(
    x_ref, y_ref, rms2_ref, cp_qw, cp_qs, cp_qz, f12_qw, f12_qs, f12_qz,
    mp_qw, mp_qs, mp_qz, o_ref, xs, h, fg, gg, *pipe_refs,
    B, D, I, gs, bn_cp, bn_f12, bn_mp, cdtype, pipelined=False,
):
    """Everything after attention for B slots: x + c_proj(y), rms_2, SwiGLU,
    + mlp projection — one launch. With ``pipelined`` (blocked scales), the
    three weight streams chain through shared buffer sets like the
    single-stream whole-layer kernel: f12's and mp's block-0 copies launch
    from their predecessor's last block."""
    if pipelined:
        pwA, psA, pzA, semA, pwB, psB, pzB, semB = pipe_refs
        bufsA, bufsB = (pwA, psA, pzA), (pwB, psB, pzB)
        s_f12 = (D // bn_cp) % 2

        def start_f12(free_slot):
            for d in _mv_dmas(
                bufsA, semA, free_slot, 0, f12_qw, f12_qs, f12_qz,
                Kh=D // 2, bn=bn_f12, blocked=True,
            ):
                d.start()

        def start_mp(_free):
            for d in _mv_dmas(
                bufsB, semB, 0, 0, mp_qw, mp_qs, mp_qz,
                Kh=I // 2, bn=bn_mp, blocked=True,
            ):
                d.start()

        # cp's block 0 starts NOW — the residual/attention-output copies in
        # hide its fetch
        for d in _mv_dmas(
            bufsA, semA, 0, 0, cp_qw, cp_qs, cp_qz,
            Kh=D // 2, bn=bn_cp, blocked=True,
        ):
            d.start()
        pipe_cp = dict(
            bufs=bufsA, sems=semA, slot0=0, started=True, next_start=start_f12
        )
        pipe_f12 = dict(
            bufs=bufsA, sems=semA, slot0=s_f12, started=True,
            next_start=start_mp,
        )
        pipe_mp = dict(bufs=bufsB, sems=semB, slot0=0, started=True)
    else:
        pipe_cp = pipe_f12 = pipe_mp = None
    xs[:] = x_ref[:].astype(jnp.float32)
    h[:] = y_ref[:].astype(jnp.float32)
    _mv_int4(h, xs, cp_qw, cp_qs, cp_qz, K=D, N=D, gs=gs, bn=bn_cp,
             cdtype=cdtype, residual_ref=xs, sublanes=xs.shape[0],
             pipe=pipe_cp)
    h[:] = _rms_norm_rows(xs[:], rms2_ref)
    _mv_int4(h, fg, f12_qw, f12_qs, f12_qz, K=D, N=2 * I, gs=gs, bn=bn_f12,
             cdtype=cdtype, sublanes=xs.shape[0], pipe=pipe_f12)
    # silu in f32 regardless of the fg/gg storage dtype: Mosaic's bf16
    # logistic lowering emits an f32->bf16 vector.broadcast that fails
    # verification
    gg[:] = (
        jax.nn.silu(fg[:, :I].astype(jnp.float32))
        * fg[:, I:].astype(jnp.float32)
    ).astype(gg.dtype)
    _mv_int4(gg, xs, mp_qw, mp_qs, mp_qz, K=I, N=D, gs=gs, bn=bn_mp,
             cdtype=cdtype, residual_ref=xs, sublanes=xs.shape[0],
             pipe=pipe_mp)
    o_ref[:] = xs[:B].astype(o_ref.dtype)


def _tail_mid_dtype(Bp: int, cdtype):
    """fg/gg scratch dtype for the batched tail kernel: f32 at small B, the
    compute dtype at Bp >= 48 — (Bp, 2I) f32 alone is 11.3 MB at Bp=64 and
    the kernel's scoped VMEM must stay under ~16 MB (the XLA path computes
    these intermediates in compute dtype anyway)."""
    return jnp.dtype(cdtype) if Bp >= 48 else jnp.float32


def _round8(b: int) -> int:
    return max(8, -(-b // 8) * 8)


@functools.partial(
    jax.jit, static_argnames=("B", "D", "gs", "cdtype", "interpret")
)
def block_head_fused(x, rms1, cos3, sin3, ca, *, B, D, gs, cdtype,
                     interpret=False):
    """x (B, D) -> rotated qkv (B, 3D). ``cos3``/``sin3`` (B, 3D) f32 lane
    tables (see models/llama.py `_slot_rope_tables`)."""
    Bp = _round8(B)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        cos3 = jnp.pad(cos3, ((0, Bp - B), (0, 0)))
        sin3 = jnp.pad(sin3, ((0, Bp - B), (0, 0)))
    lora = "lora_af" in ca
    lora_ops = (ca["lora_af"], ca["lora_bf"]) if lora else ()
    kernel = functools.partial(
        _block_head_kernel, B=B, D=D, gs=gs, bn=_pick_bn(3 * D, D),
        cdtype=jnp.dtype(cdtype), lora=lora,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3 * D), jnp.dtype(cdtype)),
        in_specs=[vmem] * (4 + len(lora_ops)) + [hbm, hbm, hbm],
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((Bp, D), jnp.float32),
            pltpu.VMEM((Bp, 3 * D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * D * 3 * D, bytes_accessed=3 * D * D // 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, rms1.reshape(1, D), cos3, sin3, *lora_ops, ca["qw"], *_scale_pair(ca))


@functools.partial(
    jax.jit, static_argnames=("B", "D", "I", "gs", "cdtype", "interpret")
)
def block_tail_fused(x, y, rms2, cp, f12, mp, *, B, D, I, gs, cdtype,
                     interpret=False):
    """(x residual stream, y attention output), both (B, D) -> new x (B, D)."""
    Bp = _round8(B)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        y = jnp.pad(y, ((0, Bp - B), (0, 0)))
    import os

    bn_cp, bn_f12, bn_mp = _pick_bn(D, D), _pick_bn(2 * I, D), _pick_bn(D, I)
    pipelined = (
        os.environ.get("LIT_LLAMA_TPU_TAIL_PIPE", "1") == "1"
        # the shared stage buffers (~7.6 MB) don't fit next to (Bp, 2I)
        # scratch at large B; the stage bubbles they hide amortize over the
        # batch rows anyway
        and Bp < 48
        and cp.get("qscale_b") is not None
        and f12.get("qscale_b") is not None
        and mp.get("qscale_b") is not None
    )
    kernel = functools.partial(
        _block_tail_kernel, B=B, D=D, I=I, gs=gs,
        bn_cp=bn_cp, bn_f12=bn_f12, bn_mp=bn_mp,
        cdtype=jnp.dtype(cdtype), pipelined=pipelined,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.dtype(cdtype)),
        in_specs=[vmem, vmem, vmem] + [hbm] * 9,
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((Bp, D), jnp.float32),
            pltpu.VMEM((Bp, D), jnp.float32),
            pltpu.VMEM((Bp, 2 * I), _tail_mid_dtype(Bp, cdtype)),
            pltpu.VMEM((Bp, I), _tail_mid_dtype(Bp, cdtype)),
        ]
        + (
            [
                pltpu.VMEM((2, D // 2, max(bn_cp, bn_f12)), jnp.uint8),
                pltpu.VMEM((2, _round8(D // gs), max(bn_cp, bn_f12)), jnp.float32),
                pltpu.VMEM((2, _round8(D // gs), max(bn_cp, bn_f12)), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
                pltpu.VMEM((2, I // 2, bn_mp), jnp.uint8),
                pltpu.VMEM((2, _round8(I // gs), bn_mp), jnp.float32),
                pltpu.VMEM((2, _round8(I // gs), bn_mp), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ]
            if pipelined
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * (D * D + 3 * D * I),
            bytes_accessed=D * D // 2 + 3 * D * I // 2,
            transcendentals=Bp * I,
        ),
        interpret=interpret,
    )(
        x, y, rms2.reshape(1, D),
        cp["qw"], *_scale_pair(cp),
        f12["qw"], *_scale_pair(f12),
        mp["qw"], *_scale_pair(mp),
    )


# Measured on-chip (TPU v5e, 7B int4, S=256, mixed prompts, 128 requests):
# with the round-4 BlockSpec-pipelined write+attention kernel the fused path
# wins at every measured slot count — 448 vs 386 tok/s at 8 slots (r3) and
# 837 vs 685 at 32 (the r3 manual-DMA kernel lost 570 vs 602 there, which is
# why this crossover existed). The VPU multiply-reduce formulation beats the
# MXU cross-head GEMM one at 32 slots (837 vs 666). No practical slot count
# reaches the cap; it stays env-overridable for re-measurement on new
# toolchains/models.
SERVE_KERNEL_MAX_B = 4096


def use_serve_fused(config, layer_params, batch: int | None = None) -> bool:
    """Dispatch for the batched block-half kernels (slot_pos decode).

    ``batch``: decode slot count when known (engine init); the measured
    crossover SERVE_KERNEL_MAX_B gates large batches onto the XLA path.
    """
    import os

    if os.environ.get("LIT_LLAMA_TPU_SERVE_KERNEL", "1") == "0":
        return False
    if os.environ.get("LIT_LLAMA_TPU_NO_PALLAS"):
        return False
    raw = os.environ.get("LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B", "")
    try:
        max_b = int(raw) if raw.strip() else SERVE_KERNEL_MAX_B
    except ValueError as e:
        raise ValueError(
            f"LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B must be an integer, got {raw!r}"
        ) from e
    if batch is not None and batch > max_b:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if config.rope_layout != "half" or config.head_size != 128:
        return False
    c_attn = layer_params.get("attn", {}).get("c_attn", {})
    if config.lora is not None and "lora_af" not in c_attn:
        # the overlay must be folded into kernel operands (prepare_fused_params)
        return False
    return "qzero" in c_attn and "c_fc12" in layer_params.get("mlp", {})


def half_basis_perm(hs: int) -> jnp.ndarray:
    """Per-head column permutation interleaved -> half-rotation basis:
    new column j < hs/2 holds old column 2j; new j >= hs/2 holds old 2(j-hs/2)+1
    (the inverse of convert.hf_to_lit's un-permute)."""
    half = hs // 2
    return jnp.concatenate(
        [jnp.arange(half) * 2, jnp.arange(half) * 2 + 1]
    )


def _head_perm(D: int, hs: int) -> jnp.ndarray:
    """Per-head interleaved -> half-rotation column permutation over D lanes."""
    H = D // hs
    per_head = half_basis_perm(hs)
    return (jnp.arange(H)[:, None] * hs + per_head[None, :]).reshape(-1)


def permute_qk_columns(c_attn: Params, D: int, hs: int) -> Params:
    """Permute the q and k head columns of the fused QKV weight to the
    half-rotation basis (v untouched). Applies to every (…, 3D)-trailing leaf;
    LoRA leaves (trailing n_en*r / D) are handled by prepare_lora_operands."""
    head_perm = _head_perm(D, hs)
    full = jnp.concatenate([head_perm, D + head_perm, 2 * D + jnp.arange(D)])
    return {
        k: (v[..., full] if v.shape[-1] == 3 * D else v) for k, v in c_attn.items()
    }


def prepare_lora_operands(c_attn: Params, lora_cfg, D: int, hs: int) -> Params:
    """Kernel-facing LoRA operands for the fused decode paths.

    The runtime update is qkv += scaling * zero_pad(x @ A grouped-expanded by
    B) (peft/lora.py lora_delta; reference lit_llama/lora.py:297-325). Folded
    here into two dense matrices the kernels chain as two small dots:
      ``lora_af`` (D, R8): A zero-padded to an 8-multiple rank column count;
      ``lora_bf`` (R8, 3D): per-group B blocks scattered into their enabled
        q/k/v output slots with ``scaling`` folded in and the q/k sections
        permuted to the half-rotation basis (matching permute_qk_columns).
    Also permutes the stored ``lora_b`` q/k groups so the XLA half-basis path
    (prefill, parity reference) produces the same rotated delta."""
    a = c_attn["lora_a"]
    b = c_attn["lora_b"]  # (n_en, r, D)
    n_en, r = b.shape[0], b.shape[1]
    R = n_en * r
    R8 = _round8(R)
    head_perm = _head_perm(D, hs)
    bf = jnp.zeros((R, 3 * D), jnp.float32)
    b_perm = []
    g = 0
    for i, enabled in enumerate(lora_cfg.enable):  # groups are (q, k, v)
        if not enabled:
            continue
        bg = b[g].astype(jnp.float32)
        if i < 2:  # q and k columns live in the half-rotation basis
            bg = bg[..., head_perm]
        b_perm.append(bg)
        bf = bf.at[g * r : (g + 1) * r, i * D : (i + 1) * D].set(
            bg * lora_cfg.scaling
        )
        g += 1
    out = dict(c_attn)
    out["lora_b"] = jnp.stack(b_perm).astype(b.dtype)
    out["lora_af"] = jnp.pad(a.astype(jnp.float32), ((0, 0), (0, R8 - R))).astype(
        a.dtype
    )
    out["lora_bf"] = jnp.pad(bf, ((0, R8 - R), (0, 0))).astype(a.dtype)
    return out


def fused_layer_supported(config, params) -> bool:
    """Static dispatch predicate for the fused decode path."""
    if config.quantize != "int4" or config.kv_cache_dtype is not None:
        return False
    if config.adapter is not None:
        return False
    if config.lora is not None:
        # the kernels take the low-rank update as two dense side operands
        # (prepare_lora_operands); requires the overlay to be loaded
        h0 = params.get("h")
        lp0 = h0[0] if isinstance(h0, (list, tuple)) else h0
        if "lora_a" not in (lp0 or {}).get("attn", {}).get("c_attn", {}):
            return False
    if config.head_size != 128:
        return False
    D, I, gs = config.n_embd, config.intermediate_size, config.quant_groupsize
    if gs <= 0:
        return False
    for K in (D, I):
        G = K // gs if gs > 0 else 0
        # even group count (half-split planes) and group-aligned planes
        if K % gs or G % 2 or (K // 2) % gs:
            return False
    if D % 256 or (3 * D) % 128 or (2 * I) % 128:
        return False
    h = params.get("h")
    if not isinstance(h, (list, tuple)):
        return False
    lp = h[0]
    return (
        "qw" in lp.get("attn", {}).get("c_attn", {})
        and "c_fc12" in lp.get("mlp", {})
    )


def warm_kernels(params: Params, config, seq_lengths=(80,)) -> float:
    """Compile the fused decode kernels CONCURRENTLY before the first
    generate call. The remote TPU compile service runs independent compiles
    in parallel (measured: layer kernel 57.8 s + lm_head 38.4 s serial ->
    66.4 s concurrent), so warming the per-layer kernel (per cache length)
    and the lm_head kernel in threads takes the ~40 s lm_head compile off
    the cold-start critical path; the first generate then only pays its XLA
    graph compile. No-op off the fused path. Returns seconds spent."""
    import threading
    import time as _time

    if config.rope_layout != "half" or not isinstance(
        params.get("h"), (list, tuple)
    ):
        return 0.0
    if jax.default_backend() == "cpu":
        return 0.0
    from lit_llama_tpu.models import llama as _llama
    from lit_llama_tpu.ops.rope import build_rope_cache, rope_half_row

    D, hs = config.n_embd, config.head_size
    dtype = jnp.dtype(config.compute_dtype)
    x = jnp.zeros((1, D), dtype)
    rope = build_rope_cache(config.block_size, hs)
    cosf, sinf = rope_half_row(rope, jnp.int32(1), hs)
    t0 = _time.perf_counter()
    jobs = []
    for S in seq_lengths:
        packed = dtype == jnp.bfloat16 and config.kv_cache_dtype is None
        if packed and S % 16:
            continue
        kv = _llama.unstack_kv_cache(
            _llama.init_kv_cache(config, 1, S, dtype, packed=packed)
        )[0]

        def warm_layer(kv=kv):
            out, _ = decode_layer_fused(
                x, params["h"][0], kv, cosf, sinf, jnp.int32(1), jnp.int32(1),
                config,
            )
            jax.block_until_ready(out)

        jobs.append(warm_layer)
    if "qzero" in params.get("lm_head", {}):
        jobs.append(
            lambda: jax.block_until_ready(
                lm_head_fused(x, params["ln_f"], params["lm_head"], config)
            )
        )
    threads = [threading.Thread(target=j, daemon=True) for j in jobs]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return _time.perf_counter() - t0


def maybe_prepare_fused(params: Params, config, mega: bool = False) -> Tuple[Params, Any]:
    """Dispatch wrapper for CLIs: prepare the fused-kernel layout when the
    model qualifies and we're on real TPU hardware (interpret mode covers CPU
    in tests). Opt out with LIT_LLAMA_TPU_FUSED=0 (A/B tool).

    ``mega`` is accepted and ignored (the whole-step megakernel was deleted
    in round 5: with in-layer DMA chaining it measured 146.2 tok/s vs 164.9
    for the per-layer chain — one launch per step removes the queue-level
    overlap XLA provides BETWEEN launches, a strictly worse trade on this
    hardware; scripts/probe_mosaic.py keeps the per-construct probes)."""
    import os

    if config.rope_layout == "half":  # already prepared — never permute twice
        return params, config
    if os.environ.get("LIT_LLAMA_TPU_FUSED", "1") == "0":
        return params, config
    if jax.default_backend() not in ("tpu", "axon"):
        return params, config
    if not fused_layer_supported(config, params):
        return params, config
    return prepare_fused_params(params, config)


def _add_blocked_scales(w: Params, gs: int) -> Params:
    """Attach the kernel's DMA-friendly scale layout (see blocked_scales) as
    ``qscale_b``/``qzero_b`` next to the (G, N) planes the XLA path uses."""
    if "qscale" not in w:
        return w
    K = 2 * w["qw"].shape[-2]
    N = w["qw"].shape[-1]
    try:
        qs_b = blocked_scales(w["qscale"], K, N, gs)
        qz_b = blocked_scales(w["qzero"], K, N, gs)
    except ValueError:
        return w  # no 128-multiple block divisor (tiny test vocabs): keep raw
    out = dict(w)
    out["qscale_b"] = qs_b
    out["qzero_b"] = qz_b
    return out


def _scale_pair(w: Params):
    """Kernel operands: blocked planes when prepared, legacy (G, N) otherwise."""
    if "qscale_b" in w:
        return w["qscale_b"], w["qzero_b"]
    return w["qscale"], w["qzero"]


def prepare_fused_params(params: Params, config) -> Tuple[Params, Any]:
    """Convert unstacked int4 inference params to the fused-kernel layout:
    c_attn q/k columns permuted to the half-rotation basis, and every
    quantized weight's scale/zero planes pre-blocked into the kernel's DMA
    unit (blocked_scales — awkward group counts like 7B mlp.c_proj's G=86
    cannot be DMA'd as column slices on this toolchain). Returns
    (params, config) with ``config.rope_layout == "half"`` so the standard
    XLA forward (used for prefill and as the parity reference) applies the
    matching rotation."""
    D, hs, gs = config.n_embd, config.head_size, config.quant_groupsize
    out = dict(params)
    layers = []
    for lp in params["h"]:
        lp = dict(lp)
        attn = dict(lp["attn"])
        c_attn = permute_qk_columns(dict(attn["c_attn"]), D, hs)
        if "lora_a" in c_attn and getattr(config, "lora", None) is not None:
            c_attn = prepare_lora_operands(c_attn, config.lora, D, hs)
        attn["c_attn"] = _add_blocked_scales(c_attn, gs)
        attn["c_proj"] = _add_blocked_scales(dict(attn["c_proj"]), gs)
        lp["attn"] = attn
        mlp = dict(lp["mlp"])
        for name in mlp:
            mlp[name] = _add_blocked_scales(dict(mlp[name]), gs)
        lp["mlp"] = mlp
        layers.append(lp)
    out["h"] = tuple(layers)
    if "qscale" in params.get("lm_head", {}):
        out["lm_head"] = _add_blocked_scales(dict(params["lm_head"]), gs)
    return out, config.replace(rope_layout="half")
