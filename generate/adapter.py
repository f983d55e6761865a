"""Generate with Adapter v1 weights overlaid on a base checkpoint
(reference: generate/adapter.py:64-73)."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax

ADAPTER_V2 = False


def main(
    prompt: str = "What food do lamas eat?",
    input: str = "",
    adapter_path: Path = Path("out/adapter/alpaca/lit-llama-adapter-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    seed: int = 1234,
) -> None:
    """Generates a response based on a given instruction with an Adapter overlay.

    Args:
        prompt: The instruction string.
        input: Optional input for the instruction template.
        adapter_path: Adapter checkpoint directory (from finetune/adapter.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        quantize: Quantize the BASE weights at load: "llm.int8" or "gptq.int4"
            (round-to-nearest; pass a quantize/gptq.py output dir for true
            GPTQ). The adapter weights stay dense and apply on top.
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: A value controlling the randomness of the sampling process.
        seed: Random seed for sampling.
    """
    from lit_llama_tpu.data import sft
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.models.config import AdapterConfig
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.peft import adapter as adapter_mod
    from lit_llama_tpu.utils.loader import load_model, load_peft_checkpoint

    params, config = load_model(Path(checkpoint_path), quantize)
    # native dir from finetune/adapter*.py OR a reference-format .pth adapter
    # state dict (incl. old scalar-gate checkpoints, reference adapter.py:176-190)
    kind, state, info = load_peft_checkpoint(Path(adapter_path), config)
    if kind != "adapter":
        raise ValueError(f"{adapter_path} is a {kind} checkpoint, not adapter")
    config = config.replace(
        adapter=AdapterConfig(
            v2=ADAPTER_V2 or info["v2"],
            prompt_length=info["prompt_length"],
            start_layer=info["start_layer"],
        )
    )
    params = adapter_mod.add_adapter_params(params, config)
    params = adapter_mod.load_adapter_state(params, state)
    from lit_llama_tpu.models.llama import unstack_layers

    params = unstack_layers(params)

    tokenizer = Tokenizer(tokenizer_path)
    full_prompt = sft.generate_prompt({"instruction": prompt, "input": input})
    encoded = tokenizer.encode(full_prompt, bos=True, eos=False)

    t0 = time.perf_counter()
    y = generate(
        params,
        encoded,
        max_new_tokens,
        config=config,
        temperature=temperature,
        top_k=top_k,
        eos_id=tokenizer.eos_id,
        key=jax.random.PRNGKey(seed),
    )
    t = time.perf_counter() - t0
    output = tokenizer.decode(y)
    output = output.split("### Response:")[-1].strip()
    print(output)
    print(
        f"Time for inference: {t:.02f} sec total, "
        f"{(len(y) - len(encoded)) / t:.02f} tokens/sec",
        file=sys.stderr,
    )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
