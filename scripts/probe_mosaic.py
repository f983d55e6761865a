"""Bisect probes for Mosaic remote-compile crashes (HTTP 500, no diagnostics).

The whole-step megakernel and the MXU-mode pipelined attention crash the
tpu_compile_helper subprocess on this toolchain. Each case here compiles ONE
minimal kernel isolating a construct those kernels use; `--all` runs every
case in a subprocess (a backend crash kills the process) and prints a table.

Usage:
    python scripts/probe_mosaic.py --all            # full table
    python scripts/probe_mosaic.py --case mv_dyn    # one case, in-process
"""

from __future__ import annotations

import functools
import subprocess
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

H, ROWS, HS = 4, 64, 128  # smoke geometry (7B-like hs)
L, K, N, GS = 2, 512, 1536, 128  # tiny stacked weight planes


def _pallas():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return jax, jnp, pl, pltpu


def case_dot_nt():
    """2-D dot with contracting ((1,),(1,)) — the NT GEMM the MXU path uses."""
    jax, jnp, pl, pltpu = _pallas()

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    a = jnp.ones((H, HS), jnp.float32)
    b = jnp.ones((H * ROWS, HS), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((H, H * ROWS), jnp.float32)
    )(a, b)
    return float(out[0, 0])


def case_iota_mask_dots():
    """The full 2-D mask + compaction-GEMM structure of dots(mxu=True)."""
    jax, jnp, pl, pltpu = _pallas()

    def kernel(q_ref, k_ref, o_ref):
        rows = ROWS
        s_all = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = jax.lax.broadcasted_iota(jnp.int32, (H, H * rows), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (H, H * rows), 1)
        mask = (c // rows == r).astype(jnp.float32)
        kk = jax.lax.broadcasted_iota(jnp.int32, (H * rows, rows), 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (H * rows, rows), 1)
        sel = (kk % rows == rr).astype(jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            s_all * mask, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    q = jnp.ones((H, HS), jnp.float32)
    k = jnp.ones((H * ROWS, HS), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((H, ROWS), jnp.float32)
    )(q, k)
    return float(out[0, 0])


def case_reshape3():
    """Collapse (H, ROWS, HS) -> (H*ROWS, HS) inside a kernel, then dot."""
    jax, jnp, pl, pltpu = _pallas()

    def kernel(q_ref, k_ref, o_ref):
        k2 = k_ref[:].reshape(H * ROWS, HS)
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    q = jnp.ones((H, HS), jnp.float32)
    k = jnp.ones((H, ROWS, HS), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((H, H * ROWS), jnp.float32)
    )(q, k)
    return float(out[0, 0])


def _stacked_planes(quad: bool):
    import jax.numpy as jnp

    from lit_llama_tpu.ops.fused_layer import (
        _pick_bn, blocked_scales, quad_view,
    )

    rng = np.random.default_rng(0)
    bn = _pick_bn(N, K)
    qw = jnp.asarray(rng.integers(0, 255, size=(L, K // 2, N)), jnp.uint8)
    qs = jnp.stack(
        [
            blocked_scales(jnp.full((K // GS, N), 0.01, jnp.float32), K, N, GS)
            for _ in range(L)
        ]
    )
    qz = jnp.stack(
        [
            blocked_scales(jnp.full((K // GS, N), -0.05, jnp.float32), K, N, GS)
            for _ in range(L)
        ]
    )
    if quad:
        qw = quad_view(qw, bn)
    return qw, qs, qz, bn


def _mv_case(quad: bool, loop: bool):
    """fori_loop (or unrolled) over stacked planes driving _mv_int4 with a
    dynamic layer index — the megakernel's weight-streaming core."""
    jax, jnp, pl, pltpu = _pallas()
    from lit_llama_tpu.ops.fused_layer import _mv_int4

    qw, qs, qz, bn = _stacked_planes(quad)

    def kernel(x_ref, qw_ref, qs_ref, qz_ref, o_ref, xs, dst):
        xs[:] = x_ref[:].astype(jnp.float32)

        def body(l, carry):
            _mv_int4(xs, dst, qw_ref, qs_ref, qz_ref, K=K, N=N, gs=GS, bn=bn,
                     cdtype=jnp.bfloat16, layer=l)
            xs[:, :N // 4] = dst[:, :N // 4]  # feed forward so layers chain
            return carry

        if loop:
            jax.lax.fori_loop(0, L, body, 0)
        else:
            for l in range(L):
                body(l, 0)
        o_ref[:] = dst[:].astype(o_ref.dtype)

    x = jnp.ones((8, K), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, K), jnp.float32),
            pltpu.VMEM((8, N), jnp.float32),
        ],
    )(x, qw, qs, qz)
    return float(out[0, 0])


def case_mv_dyn():
    return _mv_case(quad=False, loop=True)


def case_mv_dyn_quad():
    return _mv_case(quad=True, loop=True)


def case_mv_unrolled():
    return _mv_case(quad=False, loop=False)


def _attn_case(packed: bool):
    """In-kernel _decode_attention over a layer-stacked HBM cache ref inside
    a fori_loop (the megakernel's attention stage)."""
    jax, jnp, pl, pltpu = _pallas()
    from lit_llama_tpu.ops.fused_layer import _decode_attention, pack_kv

    S = 128
    rng = np.random.default_rng(1)
    kc = jnp.asarray(rng.normal(size=(L, 1, H, S, HS)) * 0.3, jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, 1, H, S, HS)) * 0.3, jnp.bfloat16)
    if packed:
        kc, vc = pack_kv(kc), pack_kv(vc)

    def kernel(q_ref, kc_ref, vc_ref, o_ref):
        def body(l, carry):
            def att(y_s):
                _decode_attention(
                    q_ref, kc_ref, vc_ref, y_s, jnp.int32(S - 1), H=H, S=S,
                    hs=HS, bs=64, packed=packed, cdtype=jnp.bfloat16, layer=l,
                )
                o_ref[:] = y_s[:]

            pl.run_scoped(att, pltpu.VMEM((H, HS), jnp.float32))
            return carry

        jax.lax.fori_loop(0, L, body, 0)

    q = jnp.ones((H, HS), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, HS), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(q, kc, vc)
    return float(out[0, 0])


def case_mv_small_n():
    """_mv_int4 at the smoke lm_head geometry (N=256 < one natural block) —
    the megakernel crashes at the tiny smoke config but runs at 7B."""
    jax, jnp, pl, pltpu = _pallas()
    from lit_llama_tpu.ops.fused_layer import _mv_int4, _pick_bn, blocked_scales

    K2, N2, GS2 = 512, 256, 128
    bn = _pick_bn(N2, K2)
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(0, 255, size=(K2 // 2, N2)), jnp.uint8)
    qs = blocked_scales(jnp.full((K2 // GS2, N2), 0.01, jnp.float32), K2, N2, GS2)
    qz = blocked_scales(jnp.full((K2 // GS2, N2), -0.05, jnp.float32), K2, N2, GS2)

    def kernel(x_ref, qw_ref, qs_ref, qz_ref, o_ref, xs, dst):
        xs[:] = x_ref[:].astype(jnp.float32)
        _mv_int4(xs, dst, qw_ref, qs_ref, qz_ref, K=K2, N=N2, gs=GS2, bn=bn,
                 cdtype=jnp.bfloat16)
        o_ref[:] = dst[:].astype(o_ref.dtype)

    x = jnp.ones((8, K2), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, N2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, K2), jnp.float32),
            pltpu.VMEM((8, N2), jnp.float32),
        ],
    )(x, qw, qs, qz)
    return float(out[0, 0])


def case_attn_dyn():
    return _attn_case(packed=False)


def case_attn_dyn_packed():
    return _attn_case(packed=True)


def case_write_dyn2():
    """Cache-row RMW with BOTH indices dynamic (layer + row), packed u32 —
    the megakernel's packed write_rows."""
    jax, jnp, pl, pltpu = _pallas()

    Sw = 64  # packed word rows
    vc = jnp.zeros((L, 1, H, Sw, HS), jnp.uint32)

    def kernel(wp_ref, row_ref, vc_in, o_ref, vc_out):
        wr = wp_ref[0] // 2
        hi = jax.lax.rem(wp_ref[0], 2) == 1

        def body(l, carry):
            def rmw(vb, sems):
                rd = pltpu.make_async_copy(
                    vc_out.at[l, 0, :, pl.ds(wr, 1), :], vb, sems.at[0]
                )
                rd.start(); rd.wait()
                old = vb[:, 0, :]
                vb[:, 0, :] = jnp.where(
                    hi,
                    (old & jnp.uint32(0xFFFF)) | (row_ref[:] << 16),
                    (old & jnp.uint32(0xFFFF0000)) | row_ref[:],
                )
                wb = pltpu.make_async_copy(
                    vb, vc_out.at[l, 0, :, pl.ds(wr, 1), :], sems.at[0]
                )
                wb.start(); wb.wait()

            pl.run_scoped(
                rmw, pltpu.VMEM((H, 1, HS), jnp.uint32),
                pltpu.SemaphoreType.DMA((1,)),
            )
            return carry

        jax.lax.fori_loop(0, L, body, 0)
        o_ref[:] = jnp.ones((1, 1), jnp.float32)

    wp = jnp.asarray([13], jnp.int32)
    row = jnp.full((H, HS), 0x3F80, jnp.uint32)
    out, vc2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={2: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(wp, row, vc)
    return float(np.asarray(vc2[1, 0, 0, 6, 0]))


def case_write_dyn():
    """Dynamic-layer cache-row write DMA (VMEM -> HBM .at[l, 0, :, wp, :])."""
    jax, jnp, pl, pltpu = _pallas()

    S = 128
    vc = jnp.zeros((L, 1, H, S, HS), jnp.float32)

    def kernel(row_ref, vc_in, o_ref, vc_out):
        def body(l, carry):
            def write(sems):
                d = pltpu.make_async_copy(
                    row_ref, vc_out.at[l, 0, :, pl.ds(7, 1), :], sems.at[0]
                )
                d.start()
                d.wait()

            pl.run_scoped(write, pltpu.SemaphoreType.DMA((1,)))
            return carry

        jax.lax.fori_loop(0, L, body, 0)
        o_ref[:] = jnp.ones((1, 1), jnp.float32)

    row = jnp.ones((H, 1, HS), jnp.float32)
    out, vc2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct(vc.shape, vc.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(row, vc)
    return float(np.asarray(vc2[1, 0, 0, 7, 0]))


def case_concat():
    """jnp.concatenate of four (8, bn/4) pieces inside a kernel."""
    jax, jnp, pl, pltpu = _pallas()

    def kernel(x_ref, o_ref):
        parts = [x_ref[:, i * 128 : (i + 1) * 128] * (i + 1.0) for i in range(4)]
        o_ref[:] = jnp.concatenate(parts, axis=1)

    x = jnp.ones((8, 512), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32)
    )(x)
    return float(out[0, 130])


CASES = {
    "dot_nt": case_dot_nt,
    "iota_mask_dots": case_iota_mask_dots,
    "reshape3": case_reshape3,
    "concat": case_concat,
    "mv_small_n": case_mv_small_n,
    "mv_unrolled": case_mv_unrolled,
    "mv_dyn": case_mv_dyn,
    "mv_dyn_quad": case_mv_dyn_quad,
    "attn_dyn": case_attn_dyn,
    "attn_dyn_packed": case_attn_dyn_packed,
    "write_dyn": case_write_dyn,
    "write_dyn2": case_write_dyn2,
}


def main() -> None:
    args = sys.argv[1:]
    if args[:1] == ["--case"]:
        name = args[1]
        val = CASES[name]()
        print(f"{name}: OK ({val})")
        return
    fails = 0
    for name in CASES:
        r = subprocess.run(
            [sys.executable, __file__, "--case", name],
            capture_output=True, text=True, timeout=900,
        )
        if r.returncode == 0:
            print(r.stdout.strip().splitlines()[-1])
        else:
            fails += 1
            tail = (r.stderr.strip().splitlines() or ["?"])[-1][:200]
            print(f"{name}: CRASH rc={r.returncode} {tail}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
