"""Perplexity evaluation (reference: evaluate/full.py — wikitext/ptb/c4,
2048-token windows, exp(sum nll / tokens)).

The reference pulls datasets from the HuggingFace hub; in no-network
environments pass ``--data_file`` (raw text or pre-tokenized .bin of uint16/int32).
"""

import sys
from pathlib import Path
from typing import Optional

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

def load_eval_text(name: str) -> str:
    """Fetch one eval corpus from the HF hub (reference: evaluate/full.py:25-45
    — same datasets, splits, doc joiners, and the 1100-doc C4 cap). The c4 repo
    dropped its legacy ``allenai--c4`` config name; selecting the single
    validation shard via ``data_files`` (as the reference already did) is the
    call that still resolves on current ``datasets`` releases."""
    from datasets import load_dataset  # HF hub (needs network)

    if name == "wikitext":
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split="test")
        return "\n\n".join(ds["text"])
    if name == "ptb":
        ds = load_dataset("ptb_text_only", "penn_treebank", split="test")
        return "\n\n".join(ds["sentence"])
    if name == "c4":
        ds = load_dataset(
            "allenai/c4",
            data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
            split="validation",
        )
        return " ".join(ds[:1100]["text"])
    raise ValueError(f"unknown dataset {name!r}; pass --data_file for local data")


def load_eval_tokens(
    datasets: str, data_file: Optional[Path], tokenizer
) -> np.ndarray:
    if data_file is not None:
        data_file = Path(data_file)
        if data_file.suffix == ".bin":
            raw = np.fromfile(data_file, dtype=np.uint16)
            return raw.astype(np.int32)
        text = data_file.read_text()
        return tokenizer.encode(text, bos=True, eos=False)
    name = datasets.split(",")[0]
    return tokenizer.encode(load_eval_text(name), bos=True, eos=False)


def main(
    datasets: str = "wikitext",
    checkpoint_path: Path = Path("checkpoints/lit-llama/7B/lit-llama.pth"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    model_size: Optional[str] = None,
    quantize: Optional[str] = None,
    block_size: int = 2048,
    max_windows: Optional[int] = None,
    data_file: Optional[Path] = None,
) -> None:
    """Evaluate model perplexity (GPTQ protocol).

    Args:
        datasets: Comma-separated dataset names (wikitext, ptb, c4).
        checkpoint_path: The checkpoint path to load (.pth or native dir).
        tokenizer_path: The tokenizer path to load.
        model_size: Override the model preset if it cannot be inferred.
        quantize: Whether to quantize the model: "llm.int8" or "gptq.int4".
        block_size: Window length (reference: 2048).
        max_windows: Cap the number of windows (quick checks).
        data_file: Local text (or pre-tokenized .bin) file instead of downloading.
    """
    from lit_llama_tpu.data.tokenizer import Tokenizer
    from lit_llama_tpu.eval.perplexity import perplexity
    from lit_llama_tpu.utils.loader import load_model

    params, config = load_model(Path(checkpoint_path), quantize, model_size)
    from lit_llama_tpu.models.llama import unstack_layers

    params = unstack_layers(params)
    tokenizer = Tokenizer(tokenizer_path)
    tokens = load_eval_tokens(datasets, data_file, tokenizer)
    ppl = perplexity(params, tokens, config, block_size=block_size, max_windows=max_windows)
    print(f"perplexity: {ppl:.4f}")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(main)
