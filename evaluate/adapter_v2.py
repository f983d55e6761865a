"""Perplexity evaluation with Adapter v2 weights overlaid
(reference: evaluate/adapter_v2.py)."""

import importlib.util
import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

_spec = importlib.util.spec_from_file_location(
    "_evaluate_adapter", Path(__file__).parent / "adapter.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
_mod.ADAPTER_V2 = True


def main(
    datasets: str = "wikitext",
    adapter_path: Path = Path("out/adapter_v2/alpaca/lit-llama-adapter-v2-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    block_size: int = 2048,
    max_windows: Optional[int] = None,
    data_file: Optional[Path] = None,
) -> None:
    """Evaluate perplexity of an Adapter-v2-finetuned model.

    Args:
        datasets: Comma-separated dataset names (wikitext, ptb, c4).
        adapter_path: Adapter v2 checkpoint directory (from finetune/adapter_v2.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        quantize: Quantize the BASE weights at load: "llm.int8" or
            "gptq.int4" (the adapter weights stay dense, applied on top).
        block_size: Window length (reference: 2048).
        max_windows: Cap the number of windows (quick checks).
        data_file: Local text (or pre-tokenized .bin) file instead of downloading.
    """
    _mod.main(
        datasets=datasets,
        adapter_path=adapter_path,
        checkpoint_path=checkpoint_path,
        tokenizer_path=tokenizer_path,
        quantize=quantize,
        block_size=block_size,
        max_windows=max_windows,
        data_file=data_file,
    )


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
