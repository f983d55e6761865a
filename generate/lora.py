"""Generate with LoRA weights overlaid on a base checkpoint
(reference: generate/lora.py — two-stage load, rank inferred from lora_B)."""

import sys
import time
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import jax


def main(
    prompt: str = "What food do lamas eat?",
    input: str = "",
    lora_path: Path = Path("out/lora/alpaca/lit-llama-lora-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    lora_alpha: float = 16.0,
    quantize: Optional[str] = None,
    max_new_tokens: int = 100,
    top_k: int = 200,
    temperature: float = 0.8,
    seed: int = 1234,
    model_parallel: int = 1,
) -> None:
    """Generates a response based on a given instruction with a LoRA overlay.

    Args:
        prompt: The instruction string.
        input: Optional input for the instruction template.
        lora_path: LoRA checkpoint directory (from finetune/lora.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        lora_alpha: LoRA alpha used at finetune time (rank is inferred from the weights).
        quantize: Quantize the BASE weights at load: "llm.int8" or "gptq.int4"
            (round-to-nearest; pass a quantize/gptq.py output dir for true
            GPTQ). The LoRA update stays dense and applies on top — the
            reference declines this combination (generate/lora.py:61-62).
        max_new_tokens: The number of generation steps to take.
        top_k: The number of top most probable tokens to consider in the sampling process.
        temperature: A value controlling the randomness of the sampling process.
        seed: Random seed for sampling.
        model_parallel: Tensor-parallel degree — shard_map over the model mesh
            axis with the LoRA update applied on each device's head shard
            (beyond the reference, which has no runtime TP).
    """
    from lit_llama_tpu.data import sft
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.models.config import LoRAConfig
    from lit_llama_tpu.models.generate import generate
    from lit_llama_tpu.peft import lora as lora_mod
    from lit_llama_tpu.utils.loader import load_model, load_peft_checkpoint

    params, config = load_model(Path(checkpoint_path), quantize)
    # native dir from finetune/lora.py OR a reference-format .pth adapter
    # (rank inferred from the weights, reference: convert_lora_weights.py:28-32)
    kind, lora_params, info = load_peft_checkpoint(Path(lora_path), config)
    if kind != "lora":
        raise ValueError(f"{lora_path} is a {kind} checkpoint, not LoRA")
    config = config.replace(lora=LoRAConfig(r=info["r"], alpha=lora_alpha, dropout=0.0))
    params = lora_mod.load_lora_state(params, lora_params)
    from lit_llama_tpu.models.llama import unstack_layers
    from lit_llama_tpu.ops.fused_layer import maybe_prepare_fused

    tokenizer = Tokenizer(tokenizer_path)
    full_prompt = sft.generate_prompt({"instruction": prompt, "input": input})
    encoded = tokenizer.encode(full_prompt, bos=True, eos=False)

    if model_parallel > 1:
        from lit_llama_tpu.parallel import mesh as mesh_lib, tp

        mesh = mesh_lib.make_mesh(
            data=1, model=model_parallel,
            devices=jax.devices()[:model_parallel],
        )
        params = tp.shard_params_tp(unstack_layers(params), mesh, config)
        t0 = time.perf_counter()
        y = tp.generate_tp(
            params,
            encoded,
            max_new_tokens,
            config=config,
            mesh=mesh,
            temperature=temperature,
            top_k=top_k,
            eos_id=tokenizer.eos_id,
            key=jax.random.PRNGKey(seed),
        )
        t = time.perf_counter() - t0
    else:
        params = unstack_layers(params)
        params, config = maybe_prepare_fused(params, config)

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
