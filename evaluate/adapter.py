"""Perplexity evaluation with Adapter v1 weights overlaid
(reference: evaluate/adapter.py)."""

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

ADAPTER_V2 = False


def main(
    datasets: str = "wikitext",
    adapter_path: Path = Path("out/adapter/alpaca/lit-llama-adapter-finetuned"),
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    quantize: Optional[str] = None,
    block_size: int = 2048,
    max_windows: Optional[int] = None,
    data_file: Optional[Path] = None,
) -> None:
    """Evaluate perplexity of an Adapter-finetuned model.

    Args:
        datasets: Comma-separated dataset names (wikitext, ptb, c4).
        adapter_path: Adapter checkpoint directory (from finetune/adapter.py).
        checkpoint_path: The base model checkpoint (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        quantize: Quantize the BASE weights at load: "llm.int8" or
            "gptq.int4" (the adapter weights stays dense, applied on top).
        block_size: Window length (reference: 2048).
        max_windows: Cap the number of windows (quick checks).
        data_file: Local text (or pre-tokenized .bin) file instead of downloading.
    """
    import jax.numpy as jnp

    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.eval.perplexity import perplexity
    from lit_llama_tpu.models.config import AdapterConfig
    from lit_llama_tpu.peft import adapter as adapter_mod
    from lit_llama_tpu.utils import checkpoint as ckpt
    from lit_llama_tpu.utils.loader import load_model

    params, config = load_model(Path(checkpoint_path), quantize)
    config = config.replace(adapter=AdapterConfig(v2=ADAPTER_V2))
    params = adapter_mod.add_adapter_params(params, config)
    tree = ckpt.load_checkpoint(Path(adapter_path), transform=lambda n, a: jnp.asarray(a))
    state = tree["params"] if "params" in tree else tree
    params = adapter_mod.load_adapter_state(params, state)
    from lit_llama_tpu.models.llama import unstack_layers

    params = unstack_layers(params)

    tokenizer = Tokenizer(tokenizer_path)
    tokens = _full.load_eval_tokens(datasets, data_file, tokenizer)
    ppl = perplexity(params, tokens, config, block_size=block_size, max_windows=max_windows)
    print(f"perplexity: {ppl:.4f}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
