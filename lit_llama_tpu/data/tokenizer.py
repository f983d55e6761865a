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

    # Incremental merge loop: a full rescan of every word per merge is
    # O(vocab x unique_words) and takes DAYS at a corpus worth training a
    # real model on (the 0.44B run: 8 MB sample, vocab 8192). Instead keep
    # pair counts live, update only the words containing the merged pair, and
    # find the max through a lazily-invalidated heap. Merge order (including
    # the (count, pair) lexicographic-max tie-break) is IDENTICAL to the
    # rescan version, so trained models are bit-identical.
    import heapq

    class _RevStr:
        """Inverts lexicographic order so the min-heap pops the LARGEST pair
        among equal counts (the rescan version's max() tie-break)."""

        __slots__ = ("s",)

        def __init__(self, s):
            self.s = s

        def __lt__(self, other):
            return self.s > other.s

    seqs = {w: tuple(w) for w in words}
    pairs: Counter = Counter()
    pair_words: dict = {}
    for w, seq in seqs.items():
        f = words[w]
        for p in zip(seq, seq[1:]):
            pairs[p] += f
            pair_words.setdefault(p, set()).add(w)
    heap = [(-c, _RevStr(p), p) for p, c in pairs.items()]
    heapq.heapify(heap)

    def _push(p):
        heapq.heappush(heap, (-pairs[p], _RevStr(p), p))

    merges: List[str] = []
    while n_base + len(merges) < vocab_size:
        best = None
        while heap:
            negc, _, p = heapq.heappop(heap)
            if pairs.get(p, 0) == -negc and -negc > 0:
                best = p
                break
        if best is None:
            break
        a, b = best
        merged = a + b
        merges.append(merged)
        for w in pair_words.pop(best, ()):  # only words containing the pair
            seq = seqs[w]
            f = words[w]
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seq = tuple(out)
            if new_seq == seq:
                continue  # stale membership (pair already merged away)
            changed = set()
            for p in zip(seq, seq[1:]):
                pairs[p] -= f
                changed.add(p)
            for p in zip(new_seq, new_seq[1:]):
                pairs[p] += f
                changed.add(p)
                pair_words.setdefault(p, set()).add(w)
            seqs[w] = new_seq
            for p in changed:
                if pairs.get(p, 0) <= 0:
                    pairs.pop(p, None)
                    pair_words.pop(p, None)
                else:
                    _push(p)  # newest count; older heap entries go stale
        pairs.pop(best, None)

    pieces = list(specials)
    pieces += [Piece(m, -(i + 1.0)) for i, m in enumerate(merges)]
    pieces += [Piece(c, -(len(merges) + j + 1.0)) for j, c in enumerate(chars)]
    return SPModel(pieces=pieces, model_type=2)
