"""Generate from a fully-finetuned checkpoint with the alpaca prompt template
(reference: generate/full.py — instruction prompt + optional quantization)."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax


def main(
    prompt: str = "Hello, my name is",
    num_samples: int = 1,
    max_new_tokens: int = 50,
    top_k: int = 200,
    temperature: float = 0.8,
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    model_size: Optional[str] = None,
    quantize: Optional[str] = None,
    instruction_tuning: bool = True,
    seed: int = 1234,
) -> None:
    """Generates text samples with the alpaca instruction template.

    Args:
        prompt: The prompt/instruction string.
        num_samples: The number of text samples to generate.
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: A value controlling the randomness of the sampling process. Higher values result in more random samples.
        checkpoint_path: The checkpoint path to load (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        model_size: Override the model preset if it cannot be inferred.
        quantize: Whether to quantize the model: "llm.int8" or "gptq.int4".
        instruction_tuning: Wrap the prompt in the alpaca instruction template.
        seed: Random seed for sampling.
    """
    from lit_llama_tpu.data import sft
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.utils.loader import load_model

    params, config = load_model(Path(checkpoint_path), quantize, model_size)
    from lit_llama_tpu.models.llama import unstack_layers

    params = unstack_layers(params)
    tokenizer = Tokenizer(tokenizer_path)
    if instruction_tuning:
        prompt = sft.generate_prompt({"instruction": prompt, "input": ""})
    encoded = tokenizer.encode(prompt, bos=True, eos=False)

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
            eos_id=tokenizer.eos_id,
            key=sub,
        )
        t = time.perf_counter() - t0
        print(tokenizer.decode(y))
        print(
            f"Time for inference {i + 1}: {t:.02f} sec total, "
            f"{(len(y) - len(encoded)) / t:.02f} tokens/sec",
            file=sys.stderr,
        )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
