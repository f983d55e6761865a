"""Prepare unstructured line-per-sample text for finetuning
(reference: scripts/prepare_any_text.py:24-99 — labels = input_ids, no masking).
"""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

IGNORE_INDEX = -1


def prepare(
    train_data_path: Path = Path("data/any_text/input.txt"),
    destination_path: Path = Path("data/any_text"),
    tokenizer_path: Path = Path("checkpoints/lit-llama/tokenizer.model"),
    test_split_ratio: float = 0.9,
    max_seq_length: int = 256,
    seed: int = 42,
) -> None:
    """Prepare a plain-text dataset (one sample per line).

    Args:
        train_data_path: Input text file, one sample per line.
        destination_path: Output directory for train.pt / test.pt.
        tokenizer_path: SentencePiece tokenizer model.
        test_split_ratio: Fraction of lines kept for training.
        max_seq_length: Token truncation length.
        seed: Split shuffle seed.
    """
    from lit_llama_tpu.data import sft
    from lit_llama_tpu.data.tokenizer import Tokenizer

    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    tokenizer = Tokenizer(tokenizer_path)
    lines = [l for l in Path(train_data_path).read_text().splitlines() if l.strip()]

    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(lines))
    n_train = int(len(lines) * test_split_ratio)
    train_lines = [lines[i] for i in perm[:n_train]]
    test_lines = [lines[i] for i in perm[n_train:]]
    print(f"train has {len(train_lines):,} samples, test has {len(test_lines):,}")

    def sample(line: str):
        ids = tokenizer.encode(line, bos=True, eos=True, max_length=max_seq_length)
        return {
            "input_ids": ids.astype(np.int32),
            "input_ids_no_response": ids.astype(np.int32),
            "labels": ids.astype(np.int32),  # labels = input_ids (reference :86-90)
        }

    sft.save_samples([sample(l) for l in train_lines], destination_path / "train.pt")
    sft.save_samples([sample(l) for l in test_lines], destination_path / "test.pt")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
