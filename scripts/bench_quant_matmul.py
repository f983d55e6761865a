"""Pallas vs XLA quantized-matmul timing across M (decode -> prefill sizes).

Times the fused Pallas int4 kernel against the XLA dequantize-to-bf16 path for
the 7B linear shapes at M in {1, 128, 256, 512, 2048}, to set the dispatch
cutoff in ops/quant_matmul._use_pallas from measurement (VERDICT r1 missing #5).

Timing: each sample chains ``iters`` dependent matmuls (output column 0 summed
into the next input's first column) and fetches a scalar — the only pattern the
axon relay times truthfully.
"""

import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp

from lit_llama_tpu.ops import quant_matmul
from lit_llama_tpu.ops.linear import quantize_int4
from lit_llama_tpu.utils.cli import cli, enable_compilation_cache

SHAPES_7B = {
    "c_attn": (4096, 12288),
    "attn.c_proj": (4096, 4096),
    "c_fc": (4096, 11008),
    "mlp.c_proj": (11008, 4096),
}


def _chain(fn, x0, iters):
    def body(x, _):
        y = fn(x)
        # fold a FULL reduction of y into the carry: slicing one column would
        # let XLA dead-code-eliminate the other N-1 output columns of the
        # dequant+dot path (the Pallas custom call is opaque so only the XLA
        # side gets pruned — observed as "negative" slope timings)
        x = x * 0.999 + y.sum(axis=-1, keepdims=True).astype(x.dtype) * 1e-6
        return x, None

    out, _ = jax.lax.scan(body, x0, None, length=iters)
    return out.sum()


def main(
    iters: int = 20,
    groupsize: int = 128,
    ms: str = "1,128,256,512,2048",
) -> None:
    """Time Pallas vs XLA int4 matmul per 7B shape and M."""
    enable_compilation_cache()
    from lit_llama_tpu.ops import quant_matmul_pallas

    key = jax.random.PRNGKey(0)
    for name, (K, N) in SHAPES_7B.items():
        w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
        q = quantize_int4(w, groupsize=groupsize)
        qw, qs, qz = q["qw"], q["qscale"], q["qzero"]
        for M in [int(m) for m in ms.split(",")]:
            x = jax.random.normal(key, (M, K), jnp.bfloat16)

            def f_pallas(x):
                return quant_matmul_pallas.matmul_int4(x, qw, qs, qz, jnp.bfloat16)

            def f_xla(x):
                return quant_matmul.matmul_int4_xla(x, qw, qs, qz, jnp.bfloat16)

            row = [f"{name:12s} M={M:5d}"]
            for label, f in (("pallas", f_pallas), ("xla", f_xla)):
                # slope timing: the axon relay adds ~tens of ms of fixed
                # dispatch+fetch cost per call; timing two chain lengths and
                # taking the difference cancels it.
                lo, hi = max(1, iters // 5), iters
                g_lo = jax.jit(lambda x0: _chain(f, x0, lo))
                g_hi = jax.jit(lambda x0: _chain(f, x0, hi))
                try:
                    float(g_lo(x)), float(g_hi(x))  # compile
                    t0 = time.perf_counter()
                    float(g_lo(x))
                    t1 = time.perf_counter()
                    float(g_hi(x))
                    t2 = time.perf_counter()
                    dt = ((t2 - t1) - (t1 - t0)) / (hi - lo)
                    gbs = K / 2 * N / dt / 1e9
                    row.append(f"{label} {dt*1e6:8.0f} us ({gbs:6.0f} GB/s eff)")
                except Exception as e:
                    row.append(f"{label} FAIL {type(e).__name__}")
            print("  ".join(row), flush=True)


if __name__ == "__main__":
    cli(main)
