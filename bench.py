"""Headline benchmark: LLaMA-7B int4 weight-only decode, tokens/sec on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The baseline is
the only decode rate the reference publishes on TPU hardware: ~10 tokens/sec for
LLaMA-7B bf16 on a TPU v4-8 (reference: howto/tpus.md:37-41 — ~5 s per sample at
the default 50 new tokens, generate.py:98).

Weights are random (zero-egress environment): decode throughput is independent of
weight values. On a real accelerator this runs the full 7B int4 stack; on CPU it falls
back to a tiny config so the harness stays runnable anywhere.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

wd = Path(__file__).parent.resolve()
sys.path.insert(0, str(wd))

import jax
import jax.numpy as jnp

from lit_llama_tpu import LLaMAConfig
from lit_llama_tpu.models import generate as gen
from lit_llama_tpu.models import llama
from lit_llama_tpu.utils.cli import enable_compilation_cache

enable_compilation_cache()

BASELINE_TOK_S = 10.0  # reference TPU v4-8 bf16 decode (howto/tpus.md:37-41)


def random_int4_params(config: LLaMAConfig, key) -> dict:
    """Build the quantized pytree directly at int4 shapes — never materializes the
    fp32 7B weights (26 GB) on the host."""
    D, V, I, L = (
        config.n_embd,
        config.padded_vocab_size,
        config.intermediate_size,
        config.n_layer,
    )
    gs = config.quant_groupsize
    ks = iter(jax.random.split(key, 16))
    dtype = jnp.dtype(config.param_dtype)

    def dense(shape, scale=0.02):
        return (jax.random.normal(next(ks), shape, jnp.float32) * scale).astype(dtype)

    def q4(shape):
        in_f, out_f = shape[-2], shape[-1]
        lead = shape[:-2]
        qw = jax.random.randint(
            next(ks), lead + (in_f // 2, out_f), 0, 255, jnp.uint8
        )
        qscale = jnp.full(lead + (in_f // gs, out_f), 0.004, jnp.float32)
        qzero = jnp.full(lead + (in_f // gs, out_f), -0.03, jnp.float32)
        return {"qw": qw, "qscale": qscale, "qzero": qzero}

    return {
        "wte": dense((V, D)),
        "h": {
            "rms_1": jnp.ones((L, D), dtype),
            "attn": {"c_attn": q4((L, D, 3 * D)), "c_proj": q4((L, D, D))},
            "rms_2": jnp.ones((L, D), dtype),
            "mlp": {
                "c_fc1": q4((L, D, I)),
                "c_fc2": q4((L, D, I)),
                "c_proj": q4((L, I, D)),
            },
        },
        "ln_f": jnp.ones((D,), dtype),
        "lm_head": q4((D, V)),
    }


def main() -> None:
    on_accel = jax.default_backend() != "cpu"
    if on_accel:
        config = LLaMAConfig.from_name(
            "7B",
            param_dtype="bfloat16",
            compute_dtype="bfloat16",
            quantize="int4",
        )
        metric = "decode_tok_s_7b_int4"
        max_new = 64
    else:
        config = LLaMAConfig(
            block_size=128,
            vocab_size=256,
            n_layer=2,
            n_head=4,
            n_embd=64,
            quantize="int4",
            quant_groupsize=32,
        )
        metric = "decode_tok_s_tiny_int4_cpu"
        max_new = 32

    params = jax.jit(random_int4_params, static_argnums=0)(
        config, jax.random.PRNGKey(0)
    )
    params = llama.unstack_layers(params)
    jax.block_until_ready(params)

    prompt = jnp.arange(8, dtype=jnp.int32) + 1
    kwargs = dict(
        config=config,
        max_seq_length=min(config.block_size, 8 + max_new),
        temperature=0.8,
        top_k=200,
        key=jax.random.PRNGKey(1234),
    )
    # compile
    t0 = time.perf_counter()
    gen.generate(params, prompt, max_new, **kwargs)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen.generate(params, prompt, max_new, **kwargs)
        times.append(time.perf_counter() - t0)
    n_tok = len(out) - len(prompt)
    tok_s = n_tok / min(times)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(tok_s, 2),
                "unit": "tokens/sec/chip",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            }
        )
    )
    print(
        f"# compile {compile_s:.1f}s, decode runs {[f'{t:.2f}' for t in times]}, "
        f"{n_tok} tokens, backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
