"""Prepare databricks-dolly-15k for finetuning (reference: scripts/prepare_dolly.py
— same pipeline as alpaca with context/response field renames and
max_seq_length 1024).

Pass ``--data_file`` to use a local copy of the jsonl (no-network environments).
"""

import json
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

DATA_FILE = "https://huggingface.co/datasets/databricks/databricks-dolly-15k/resolve/main/databricks-dolly-15k.jsonl"
DATA_FILE_NAME = "dolly_data_cleaned.json"


def prepare(
    destination_path: Path = Path("data/dolly"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    test_split_size: int = 2000,
    max_seq_length: int = 1024,
    seed: int = 42,
    mask_inputs: bool = False,
    data_file: Path = None,
) -> None:
    """Prepare the Dolly dataset for instruction tuning.

    Args:
        destination_path: Output directory for train.pt / test.pt.
        tokenizer_path: SentencePiece tokenizer model.
        test_split_size: Number of held-out test samples.
        max_seq_length: Token truncation length (reference: 1024).
        seed: Split shuffle seed.
        mask_inputs: Mask the prompt out of the labels with IGNORE_INDEX.
        data_file: Local jsonl file; skips the download when given.
    """
    from lit_llama_tpu.data import sft
    from lit_llama_tpu.data.tokenizer import Tokenizer

    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    file_path = destination_path / DATA_FILE_NAME
    if data_file is not None:
        file_path = Path(data_file)
    elif not file_path.exists():
        from urllib.request import urlopen

        file_path.write_bytes(urlopen(DATA_FILE, timeout=60).read())

    tokenizer = Tokenizer(tokenizer_path)
    with open(file_path) as f:
        data = [json.loads(line) for line in f if line.strip()]
    # field renames (reference: prepare_dolly.py:48-51)
    for item in data:
        item["input"] = item.pop("context", "")
        item["output"] = item.pop("response", "")

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data))
    test_ids = set(perm[:test_split_size].tolist())
    train_set = [data[i] for i in range(len(data)) if i not in test_ids]
    test_set = [data[i] for i in range(len(data)) if i in test_ids]
    print(f"train has {len(train_set):,} samples, test has {len(test_set):,}")

    train = [sft.prepare_sample(s, tokenizer, max_seq_length, mask_inputs) for s in train_set]
    sft.save_samples(train, destination_path / "train.pt")
    test = [sft.prepare_sample(s, tokenizer, max_seq_length, mask_inputs) for s in test_set]
    sft.save_samples(test, destination_path / "test.pt")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
