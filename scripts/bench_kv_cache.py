"""Decode throughput: bf16 vs int8 KV cache at long max_seq (VERDICT r1 weak #6/#8).

The int8 cache claim is "half the cache read bandwidth"; this measures it where
it matters — decode with a LONG cache (attention reads the whole cache every
step, so at max_seq 2048 the cache read is a visible slice of the step).
Reports tok/s for each cache dtype at the given sequence lengths.
"""

import json
import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp


def main(
    model_size: str = "7B",
    max_new_tokens: int = 64,
    seq_lengths: str = "256,2048",
) -> None:
    """Compare decode tok/s across KV-cache dtypes and sequence lengths.

    Args:
        model_size: Config preset (random int4 weights).
        max_new_tokens: Decode length per measurement.
        seq_lengths: Comma-separated max_seq_length values.
    """
    from bench import random_int4_params
    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.models import generate as gen
    from lit_llama_tpu.models import llama
    from lit_llama_tpu.utils.cli import enable_compilation_cache

    enable_compilation_cache()
    on_accel = jax.default_backend() != "cpu"
    results = {}
    for kv_dtype in ("bfloat16", "int8"):
        if on_accel:
            config = LLaMAConfig.from_name(
                model_size,
                param_dtype="bfloat16",
                compute_dtype="bfloat16",
                quantize="int4",
                kv_cache_dtype=kv_dtype,
            )
        else:
            config = LLaMAConfig(
                block_size=2048, vocab_size=256, n_layer=2, n_head=4, n_embd=64,
                quantize="int4", quant_groupsize=32, kv_cache_dtype=kv_dtype,
            )
        params = jax.jit(random_int4_params, static_argnums=0)(
            config, jax.random.PRNGKey(0)
        )
        params = llama.unstack_layers(params)
        jax.block_until_ready(params)
        for S in [int(s) for s in seq_lengths.split(",")]:
            prompt = jnp.arange(8, dtype=jnp.int32) + 1
            kwargs = dict(
                config=config,
                max_seq_length=min(config.block_size, S),
                temperature=0.8,
                top_k=200,
                key=jax.random.PRNGKey(1234),
            )
            gen.generate(params, prompt, max_new_tokens, **kwargs)  # compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = gen.generate(params, prompt, max_new_tokens, **kwargs)
                times.append(time.perf_counter() - t0)
            tok_s = (len(out) - len(prompt)) / min(times)
            results[f"{kv_dtype}@S{S}"] = round(tok_s, 2)
            print(f"kv={kv_dtype:9s} max_seq={S:5d}: {tok_s:7.2f} tok/s", flush=True)

    print(json.dumps({"metric": "decode_tok_s_by_kv_dtype", "results": results}))


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
