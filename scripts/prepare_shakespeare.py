"""Prepare tiny-shakespeare: train a small tokenizer, write train/val token bins
(reference: scripts/prepare_shakespeare.py:35-71 — downloads the corpus, trains a
100-token SentencePiece model, writes uint16 train.bin/val.bin).

This environment may have no network; pass ``--input_file`` to use a local copy.
"""

import sys
from pathlib import Path

wd = Path(__file__).parent.parent.resolve()
sys.path.insert(0, str(wd))

import numpy as np

DATA_URL = "https://raw.githubusercontent.com/karpathy/char-rnn/master/data/tinyshakespeare/input.txt"


def prepare(
    destination_path: Path = Path("data/shakespeare"),
    vocab_size: int = 100,
    input_file: Path = None,
) -> None:
    """Prepare the tiny-shakespeare dataset.

    Args:
        destination_path: Output directory (input.txt, tokenizer.model, train.bin, val.bin).
        vocab_size: Tokenizer vocabulary size (reference trains 100).
        input_file: Local corpus file; skips the download when given.
    """
    from lit_llama_tpu.data.tokenizer import Tokenizer

    destination_path = Path(destination_path)
    destination_path.mkdir(parents=True, exist_ok=True)
    target = destination_path / "input.txt"
    if input_file is not None:
        target.write_text(Path(input_file).read_text())
    elif not target.exists():
        from urllib.request import urlopen

        target.write_bytes(urlopen(DATA_URL, timeout=60).read())

    text = target.read_text()
    # reference split: 90/10 train/val (prepare_shakespeare.py:47-49)
    n = len(text)
    train_text, val_text = text[: int(n * 0.9)], text[int(n * 0.9) :]

    (destination_path / "_train_corpus.txt").write_text(train_text)
    Tokenizer.train(
        str(destination_path / "_train_corpus.txt"), str(destination_path), vocab_size
    )
    (destination_path / "_train_corpus.txt").unlink()
    tok = Tokenizer(destination_path / "tokenizer.model")

    for name, part in (("train", train_text), ("val", val_text)):
        ids = tok.encode(part, bos=False).astype(np.uint16)
        ids.tofile(destination_path / f"{name}.bin")
        print(f"{name} has {len(ids):,} tokens")


if __name__ == "__main__":
    from lit_llama_tpu.utils.cli import cli

    cli(prepare)
