"""LLaMA tokenizer: encode flags, decode, and a from-scratch BPE trainer.

API parity with the reference wrapper (lit_llama/tokenizer.py:11-51):
``encode(string, bos, eos, max_length, pad)`` → int32 array, ``decode``,
``vocab_size``, static ``train``. Backed by the dependency-free SentencePiece
implementation in :mod:`lit_llama_tpu.data.sp_model` instead of the C++ library,
so Meta's shipped ``tokenizer.model`` loads without sentencepiece installed.
"""

from __future__ import annotations

import os
from collections import Counter
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from lit_llama_tpu.data import sp_model
from lit_llama_tpu.data.sp_model import CONTROL, UNKNOWN, WS, Piece, SPModel


class Tokenizer:
    """Tokenizer for LLaMA (reference: lit_llama/tokenizer.py:11)."""

    def __init__(self, model_path: Union[str, Path]) -> None:
        self.processor = sp_model.load_model(model_path)
        self.bos_id = self.processor.bos_id
        self.eos_id = self.processor.eos_id
        self.pad_id = self.processor.pad_id

    @property
    def vocab_size(self) -> int:
        return self.processor.vocab_size()

    def encode(
        self,
        string: str,
        bos: bool = True,
        eos: bool = False,
        max_length: int = -1,
        pad: bool = False,
    ) -> np.ndarray:
        """Reference flag semantics (lit_llama/tokenizer.py:24-43): bos prepend,
        eos append, truncate to max_length, right-pad with pad_id."""
        tokens: List[int] = self.processor.encode(string)
        if bos:
            tokens = [self.bos_id] + tokens
        if eos:
            tokens = tokens + [self.eos_id]
        if max_length > 0:
            tokens = tokens[:max_length]
        if pad and len(tokens) < max_length:
            tokens += [self.pad_id] * (max_length - len(tokens))
        return np.asarray(tokens, dtype=np.int32)

    def decode(self, tokens) -> str:
        if hasattr(tokens, "tolist"):
            tokens = tokens.tolist()
        return self.processor.decode(tokens)

    @staticmethod
    def train(input: str, destination: str, vocab_size: int = 32000) -> None:
        """Train a BPE tokenizer on a text file → ``<destination>/tokenizer.model``
        (reference: lit_llama/tokenizer.py:48-51 delegates to SentencePieceTrainer;
        this is a from-scratch frequency-ranked pair-merge trainer)."""
        text = Path(input).read_text(encoding="utf-8")
        model = train_bpe(text, vocab_size)
        out = os.path.join(destination, "tokenizer.model")
        with open(out, "wb") as f:
            f.write(sp_model.serialize_model(model))


def train_bpe(text: str, vocab_size: int) -> SPModel:
    """Classic BPE training over a word-frequency table.

    Words are whitespace-split and prefixed with ▁ (mirroring spm's
    escape-whitespace + dummy-prefix normalization), then the most frequent
    adjacent symbol pair is merged until the vocab is full. Merged pieces get
    scores -1, -2, … in merge order — exactly the ordering the BPE encoder
    replays — and leftover single characters rank below all merges.
    """
    words: Counter = Counter()
    for line in text.splitlines():
        for w in line.split():
            words[WS + w] += 1

    chars = sorted({c for w in words for c in w})
    specials = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
    ]
    n_base = len(specials) + len(chars)
    if vocab_size < n_base:
        raise ValueError(
            f"vocab_size={vocab_size} < {n_base} (specials + distinct characters)"
        )

    seqs = {w: tuple(w) for w in words}
    merges: List[str] = []
    while n_base + len(merges) < vocab_size:
        pairs: Counter = Counter()
        for w, seq in seqs.items():
            f = words[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # highest frequency; ties broken lexicographically for determinism
        (a, b), _ = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        merged = a + b
        merges.append(merged)
        for w, seq in seqs.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)

    pieces = list(specials)
    pieces += [Piece(m, -(i + 1.0)) for i, m in enumerate(merges)]
    pieces += [Piece(c, -(len(merges) + j + 1.0)) for j, c in enumerate(chars)]
    return SPModel(pieces=pieces, model_type=2)
