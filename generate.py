"""Generate text samples from a LLaMA checkpoint (reference: generate.py:94-172).

Loads lit-llama ``.pth`` checkpoints (via the torch-free reader) or our native
checkpoint directories, optionally applies weight-only quantization, and samples
with the single-compile decode engine.
"""

import sys
import time
from pathlib import Path
from typing import Optional

# support running without installing as a package (reference: generate.py:12-14)
wd = Path(__file__).parent.resolve()
sys.path.insert(0, str(wd))

import jax
import numpy as np

from lit_llama_tpu.data.tokenizer import Tokenizer
from lit_llama_tpu.models.generate import generate
from lit_llama_tpu.utils.loader import load_model


def main(
    prompt: str = "Hello, my name is",
    num_samples: int = 1,
    max_new_tokens: int = 50,
    top_k: int = 200,
    temperature: float = 0.8,
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    model_size: Optional[str] = None,
    kv_cache_dtype: Optional[str] = None,
    seed: int = 1234,
) -> None:
    """Generates text samples based on a pre-trained LLaMA model and tokenizer.

    Args:
        prompt: The prompt string to use for generating the samples.
        num_samples: The number of text samples to generate.
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: A value controlling the randomness of the sampling process. Higher values result in more random samples.
        checkpoint_path: The checkpoint path to load (lit-llama .pth or native dir).
        tokenizer_path: The tokenizer path to load (.model or tokenizer.json).
        quantize: Whether to quantize the model: "llm.int8" (8-bit weight-only) or "gptq.int4" (4-bit round-to-nearest; for true GPTQ run quantize/gptq.py first and pass its output).
        model_size: Override the model preset (7B/13B/30B/65B) if it cannot be inferred.
        kv_cache_dtype: KV-cache storage: None (compute dtype) or "int8".
        seed: Random seed for sampling.
    """
    checkpoint_path, tokenizer_path = Path(checkpoint_path), Path(tokenizer_path)
    assert checkpoint_path.exists(), checkpoint_path
    assert tokenizer_path.is_file(), tokenizer_path

    print("Loading model ...", file=sys.stderr)
    t0 = time.time()
    params, config = load_model(checkpoint_path, quantize, model_size)
    if kv_cache_dtype:
        config = config.replace(kv_cache_dtype=kv_cache_dtype)
    from lit_llama_tpu.models.llama import unstack_layers
    from lit_llama_tpu.ops.fused_layer import maybe_prepare_fused

    params = unstack_layers(params)
    # whole-layer fused decode kernels (one Pallas launch per block) when the
    # model qualifies (int4, hs=128, bf16 cache) and we're on TPU
    params, config = maybe_prepare_fused(params, config)
    print(f"Time to load model: {time.time() - t0:.02f} seconds.", file=sys.stderr)

    tokenizer = Tokenizer(tokenizer_path)
    encoded = tokenizer.encode(prompt, bos=True, eos=False)
    prompt_length = len(encoded)

    # Cold-start: compile the per-layer and lm_head kernels CONCURRENTLY (the
    # remote compile service parallelizes) so the first sample's compile pays
    # only the XLA graph build on top (ops/fused_layer.warm_kernels).
    if config.rope_layout == "half":
        from lit_llama_tpu.models.generate import plan_seq_length
        from lit_llama_tpu.ops.fused_layer import warm_kernels

        S_plan = plan_seq_length(
            config, prompt_length + max_new_tokens
        )
        warm = warm_kernels(params, config, seq_lengths=(S_plan,))
        if warm:
            print(f"Kernel warm-up: {warm:.1f} seconds.", file=sys.stderr)

    key = jax.random.PRNGKey(seed)
    for i in range(num_samples):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        y = generate(
            params,
            encoded,
            max_new_tokens,
            config=config,
            temperature=temperature,
            top_k=top_k,
            key=sub,
        )
        t = time.perf_counter() - t0
        print(tokenizer.decode(y))
        tokens_generated = len(y) - prompt_length
        print(
            f"Time for inference {i + 1}: {t:.02f} sec total, "
            f"{tokens_generated / t:.02f} tokens/sec",
            file=sys.stderr,
        )

    from lit_llama_tpu.utils.memory import print_peak_memory

    print_peak_memory()  # reference: generate.py:154-155


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
