"""Prepare the alpaca-cleaned instruction dataset for finetuning
(reference: scripts/prepare_alpaca.py:24-133 — download JSON, train/test split,
prompt template, tokenize with input-masked labels).

This environment may have no network; pass ``--data_file`` to use a local copy
of the JSON.
"""

import json
import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

DATA_FILE = "https://raw.githubusercontent.com/tloen/alpaca-lora/main/alpaca_data_cleaned_archive.json"
DATA_FILE_NAME = "alpaca_data_cleaned_archive.json"
IGNORE_INDEX = -1


def prepare(
    destination_path: Path = Path("data/alpaca"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    test_split_size: int = 2000,
    max_seq_length: int = 256,
    seed: int = 42,
    mask_inputs: bool = False,
    data_file: Path = None,
) -> None:
    """Prepare the Alpaca dataset for instruction tuning.

    Args:
        destination_path: Output directory for train.pt / test.pt.
        tokenizer_path: SentencePiece tokenizer model.
        test_split_size: Number of held-out test samples (reference: 2000).
        max_seq_length: Token truncation length (reference: 256).
        seed: Split shuffle seed.
        mask_inputs: Mask the prompt out of the labels with IGNORE_INDEX.
        data_file: Local JSON file; skips the download when given.
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
        data = json.load(f)

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data))
    test_ids = set(perm[:test_split_size].tolist())
    train_set = [data[i] for i in range(len(data)) if i not in test_ids]
    test_set = [data[i] for i in range(len(data)) if i in test_ids]
    print(f"train has {len(train_set):,} samples, test has {len(test_set):,}")

    print("Processing train split ...")
    train = [
        sft.prepare_sample(s, tokenizer, max_seq_length, mask_inputs) for s in train_set
    ]
    sft.save_samples(train, destination_path / "train.pt")
    print("Processing test split ...")
    test = [
        sft.prepare_sample(s, tokenizer, max_seq_length, mask_inputs) for s in test_set
    ]
    sft.save_samples(test, destination_path / "test.pt")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
