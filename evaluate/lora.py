"""Perplexity evaluation with LoRA weights overlaid
(reference: evaluate/lora.py — same protocol as evaluate/full.py with the PEFT
overlay from generate/lora.py)."""

import importlib.util
import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

_spec = importlib.util.spec_from_file_location(
    "_evaluate_full", Path(__file__).parent / "full.py"
)
_full = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_full)


def main(
    datasets: str = "wikitext",
    lora_path: Path = Path("out/lora/alpaca/lit-llama-lora-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    lora_alpha: float = 16.0,
    quantize: Optional[str] = None,
    block_size: int = 2048,
    max_windows: Optional[int] = None,
    data_file: Optional[Path] = None,
) -> None:
    """Evaluate perplexity of a LoRA-finetuned model.

    Args:
        datasets: Comma-separated dataset names (wikitext, ptb, c4).
        lora_path: LoRA checkpoint directory (from finetune/lora.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        lora_alpha: LoRA alpha used at finetune time.
        quantize: Quantize the BASE weights at load: "llm.int8" or
            "gptq.int4" (the LoRA update stays dense, applied on top).
        block_size: Window length (reference: 2048).
        max_windows: Cap the number of windows (quick checks).
        data_file: Local text (or pre-tokenized .bin) file instead of downloading.
    """
    import jax.numpy as jnp

    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.eval.perplexity import perplexity
    from lit_llama_tpu.models.config import LoRAConfig
    from lit_llama_tpu.peft import lora as lora_mod
    from lit_llama_tpu.utils import checkpoint as ckpt
    from lit_llama_tpu.utils.loader import load_model

    params, config = load_model(Path(checkpoint_path), quantize)
    tree = ckpt.load_checkpoint(Path(lora_path), transform=lambda n, a: jnp.asarray(a))
    lora_params = tree["params"] if "params" in tree else tree
    r = int(lora_params["h"]["attn"]["c_attn"]["lora_b"].shape[-2])
    config = config.replace(lora=LoRAConfig(r=r, alpha=lora_alpha, dropout=0.0))
    params = lora_mod.load_lora_state(params, lora_params)
    from lit_llama_tpu.models.llama import unstack_layers

    params = unstack_layers(params)

    tokenizer = Tokenizer(tokenizer_path)
    tokens = _full.load_eval_tokens(datasets, data_file, tokenizer)
    ppl = perplexity(params, tokens, config, block_size=block_size, max_windows=max_windows)
    print(f"perplexity: {ppl:.4f}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
