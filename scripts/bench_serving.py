"""Continuous-batching throughput benchmark.

Measures aggregate decode tokens/sec and p50/p95 TTFT for a batch of
concurrent requests through the serving engine, against the sequential
one-request-at-a-time baseline (the reference's only mode).
"""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np


def main(
    checkpoint_path: Optional[Path] = None,
    model_size: str = "7B",
    quantize: Optional[str] = "gptq.int4",
    n_requests: int = 16,
    max_batch: int = 8,
    prompt_len: int = 32,
    max_new_tokens: int = 64,
    max_seq_length: int = 256,
    steps_per_sync: int = 8,
    prefill_chunk: int = 512,
    prefill_budget: int = 1024,
    mixed_prompts: bool = False,
    compare_sequential: bool = False,
) -> None:
    """Benchmark the continuous-batching engine.

    Args:
        checkpoint_path: Checkpoint to load; random weights if omitted.
        model_size: Preset when using random weights.
        quantize: Quantization mode for random weights ("gptq.int4"/"llm.int8"/None).
        n_requests: Total requests to run.
        max_batch: Concurrent decode slots.
        prompt_len: Prompt tokens per request.
        max_new_tokens: Decode length per request.
        max_seq_length: KV-cache length.
        steps_per_sync: Decode steps per host sync.
        prefill_chunk: Chunked-prefill width (tokens) for long prompts.
        prefill_budget: Max prefill tokens admitted per engine step.
        mixed_prompts: Draw prompt lengths log-uniform in [8, max_seq/2]
            (stresses admission: long prompts must not starve decodes).
        compare_sequential: Also run the one-at-a-time baseline.
    """
    import jax
    import jax.numpy as jnp

    from lit_llama_tpu import LLaMAConfig
    from lit_llama_tpu.serve.engine import DecodeEngine

    if checkpoint_path is not None:
        from lit_llama_tpu.utils.loader import load_model

        params, config = load_model(Path(checkpoint_path), quantize, model_size)
    else:
        import bench as benchmod

        on_accel = jax.default_backend() != "cpu"
        if on_accel:
            config = LLaMAConfig.from_name(
                model_size,
                param_dtype="bfloat16",
                compute_dtype="bfloat16",
                quantize={"gptq.int4": "int4", "llm.int8": "int8"}.get(quantize, quantize),
            )
        else:
            config = LLaMAConfig(
                block_size=256, vocab_size=256, n_layer=2, n_head=4, n_embd=64,
                quantize="int4", quant_groupsize=32,
            )
        maker = (
            benchmod.random_int8_params
            if config.quantize == "int8"
            else benchmod.random_int4_params
        )
        params = jax.jit(maker, static_argnums=0)(config, jax.random.PRNGKey(0))
        jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    if mixed_prompts:
        lens = np.exp(
            rng.uniform(np.log(8), np.log(max(9, max_seq_length // 2)), n_requests)
        ).astype(int)
    else:
        lens = np.full(n_requests, prompt_len)
    prompts = [
        rng.integers(1, config.vocab_size, size=int(n)).astype(np.int32) for n in lens
    ]

    engine = DecodeEngine(
        params, config, max_batch=max_batch, max_seq_length=max_seq_length,
        steps_per_sync=steps_per_sync, prefill_chunk=prefill_chunk,
        prefill_budget=prefill_budget,
    )
    # compile every prefill bucket + the decode chunk before timing
    engine.warmup()

    t0 = time.perf_counter()
    for p in prompts:
        engine.submit(p, max_new_tokens)
    done = engine.run()
    wall = time.perf_counter() - t0
    total_tokens = sum(len(r.generated) for r in done.values())
    ttfts = sorted(r.ttft for r in done.values())
    print(
        f"continuous batching: {total_tokens} tokens in {wall:.2f}s = "
        f"{total_tokens / wall:.1f} tok/s aggregate; "
        f"TTFT p50 {ttfts[len(ttfts) // 2] * 1e3:.0f} ms, "
        f"p95 {ttfts[int(len(ttfts) * 0.95)] * 1e3:.0f} ms"
    )

    if compare_sequential:
        eng1 = DecodeEngine(
            params, config, max_batch=1, max_seq_length=max_seq_length,
            steps_per_sync=steps_per_sync,
        )
        eng1.warmup()
        t0 = time.perf_counter()
        for p in prompts:
            eng1.submit(p, max_new_tokens)
        done1 = eng1.run()
        wall1 = time.perf_counter() - t0
        total1 = sum(len(r.generated) for r in done1.values())
        print(
            f"sequential (batch=1): {total1} tokens in {wall1:.2f}s = "
            f"{total1 / wall1:.1f} tok/s -> continuous batching speedup "
            f"{(total_tokens / wall) / (total1 / wall1):.2f}x"
        )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
