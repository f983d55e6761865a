"""Bisect probes for Mosaic remote-compile crashes (HTTP 500, no diagnostics).

Historically the whole-step megakernel (deleted in round 5 — it measured
slower than per-layer launches) and the MXU-mode pipelined attention crashed the
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
