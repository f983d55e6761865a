"""Cold-compile anatomy of the headline decode path (VERDICT r4 weak #1).

BENCH_r04 recorded 599.7 s for the headline (S=80) generate compile vs 136.3 s
for the S=2048 row in the same process — the S=2048 jit reuses the in-process
Mosaic kernel compilations (the _mv_int4 weight-stream kernels are identical
across S), so the delta is the cost of compiling the kernel set itself. This
script times each piece in one process, in dependency order, so every line's
increment is attributable:

  1. per-layer fused kernel (_call_layers) at headline S
  2. lm_head kernel
  3. whole generate at headline S (prefill + loop + sampling — kernels now
     in-process-cached)
  4. whole generate at S=2048 (attention kernel recompiles for the new S)

Run with LIT_LLAMA_TPU_COMPILE_CACHE=off for honest cold numbers (the default
honors the persistent cache, which is what real users feel on a second run).

Usage: timeout 3600 python scripts/compile_anatomy.py [--s2048 false]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(s2048: bool = True, fused: bool = True) -> None:
    """Time the cold compiles of the headline decode path piecewise.

    Args:
        s2048: Also compile the S=2048 generate (the long-context row).
        fused: Use the fused-kernel path (False = pure XLA, the FUSED=0 arm).
    """
    import os

    if not fused:
        os.environ["LIT_LLAMA_TPU_FUSED"] = "0"
    from lit_llama_tpu.utils.cli import _apply_platform_override

    _apply_platform_override()
    import jax

    if jax.default_backend() == "cpu":
        print(json.dumps({"error": "compile_anatomy requires an accelerator"}))
        sys.exit(1)
    import jax.numpy as jnp

    from bench import build_decode_params
    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.models import generate as gen

    timings = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out) if out is not None else None
        timings[name] = round(time.perf_counter() - t0, 1)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return out

    config = LLaMAConfig.from_name(
        "7B", param_dtype="bfloat16", compute_dtype="bfloat16", quantize="int4"
    )
    t0 = time.perf_counter()
    params, config = build_decode_params(config)
    timings["params_build"] = round(time.perf_counter() - t0, 1)

    if config.rope_layout == "half":
        # 1+2: the Pallas kernels on their own (one layer + lm_head), at the
        # headline cache geometry
        from lit_llama_tpu.ops import fused_layer as fl
        from lit_llama_tpu.models import llama
        from lit_llama_tpu.ops.rope import build_rope_cache, rope_half_row

        S = 80
        lp = params["h"][0]
        kv = llama.unstack_kv_cache(
            llama.init_kv_cache(config, 1, S, jnp.bfloat16, packed=True)
        )[0]
        rope = build_rope_cache(config.block_size, config.head_size)
        cosf, sinf = rope_half_row(rope, jnp.int32(8), config.head_size)
        x = jnp.zeros((1, config.n_embd), jnp.bfloat16)

        clock(
            "layer_kernel_compile",
            lambda: fl.decode_layer_fused(
                x, lp, kv, cosf, sinf, jnp.int32(8), jnp.int32(8), config
            )[0],
        )
        clock(
            "lm_head_kernel_compile",
            lambda: fl.lm_head_fused(x, params["ln_f"], params["lm_head"], config),
        )

    prompt = jnp.arange(8, dtype=jnp.int32) + 1
    kwargs = dict(
        config=config, temperature=0.8, top_k=200, key=jax.random.PRNGKey(0)
    )
    clock(
        "generate_headline_compile",
        lambda: gen.generate(params, prompt, 64, max_seq_length=72, **kwargs),
    )
    clock(
        "generate_headline_rerun",
        lambda: gen.generate(params, prompt, 64, max_seq_length=72, **kwargs),
    )
    if s2048:
        clock(
            "generate_s2048_compile",
            lambda: gen.generate(params, prompt, 64, max_seq_length=2048, **kwargs),
        )
    print(json.dumps({"metric": "compile_anatomy", "fused": fused, **timings}))


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
