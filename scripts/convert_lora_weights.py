"""Merge LoRA weights into the base model for standalone inference
(reference: scripts/convert_lora_weights.py — merge then strip lora_ keys; rank
inferred from lora_B)."""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))


def main(
    lora_path: Path = Path("out/lora/alpaca/lit-llama-lora-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    output_path: Path = Path("out/lora/alpaca/lit-llama-lora-merged.pth"),
    lora_alpha: float = 16.0,
) -> None:
    """Merge a LoRA checkpoint into base weights and save a plain checkpoint.

    Args:
        lora_path: LoRA checkpoint directory (from finetune/lora.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        output_path: Output path (.pth writes torch format; else a native dir).
        lora_alpha: LoRA alpha used at finetune time (rank inferred from weights).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lit_llama_tpu.models.config import LoRAConfig
    from lit_llama_tpu.peft import lora as lora_mod
    from lit_llama_tpu.training.loop import _config_meta
    from lit_llama_tpu.utils import checkpoint as ckpt
    from lit_llama_tpu.utils import convert
    from lit_llama_tpu.utils.loader import load_model, load_peft_checkpoint
    from lit_llama_tpu.utils.pth_reader import save_pth

    params, config = load_model(Path(checkpoint_path), dtype="float32")
    # native dir from finetune/lora.py OR a reference-format .pth LoRA state dict
    kind, lora_params, info = load_peft_checkpoint(Path(lora_path), config)
    if kind != "lora":
        raise ValueError(f"{lora_path} is a {kind} checkpoint, not LoRA")
    config = config.replace(lora=LoRAConfig(r=info["r"], alpha=lora_alpha, dropout=0.0))
    params = lora_mod.load_lora_state(params, lora_params)
    merged = lora_mod.merge_lora(params, config)

    output_path = Path(output_path)
    if output_path.suffix == ".pth":
        sd = convert.pytree_to_lit(merged, config.replace(lora=None))
        output_path.parent.mkdir(parents=True, exist_ok=True)
        save_pth(output_path, sd)
    else:
        ckpt.save_checkpoint(
            output_path,
            {"params": jax.tree_util.tree_map(np.asarray, merged)},
            metadata={"config": _config_meta(config.replace(lora=None))},
        )
    print(f"merged checkpoint written to {output_path}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
