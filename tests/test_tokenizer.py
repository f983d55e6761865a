"""Tokenizer tests: SP proto round-trip, BPE/unigram encoding, reference API flags
(mirrors the reference's strategy of training a tiny tokenizer inside the test,
reference: tests/test_packed_dataset.py:10-30)."""

import numpy as np
import pytest

from lit_llama_tpu.data import sp_model
from lit_llama_tpu.data.sp_model import BYTE, CONTROL, NORMAL, UNKNOWN, Piece, SPModel
from lit_llama_tpu.data.tokenizer import Tokenizer


def make_bpe_model():
    """Hand-built BPE model: merges 'he'(-1) < 'll'(-2) < 'hell'(-3) < 'hello'(-4)."""
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
        Piece("▁", -10.0),
        Piece("h", -11.0),
        Piece("e", -12.0),
        Piece("l", -13.0),
        Piece("o", -14.0),
        Piece("he", -1.0),
        Piece("ll", -2.0),
        Piece("hell", -3.0),
        Piece("hello", -4.0),
        Piece("▁hello", -5.0),
    ]
    return SPModel(pieces=pieces, model_type=2, add_dummy_prefix=True)


def test_bpe_merge_order():
    m = make_bpe_model()
    # "hello" -> ▁,h,e,l,l,o -> he, ll -> hell -> hello -> ▁hello
    ids = m.encode("hello")
    assert [m.pieces[i].piece for i in ids] == ["▁hello"]
    ids = m.encode("hello hello")
    assert [m.pieces[i].piece for i in ids] == ["▁hello", "▁hello"]


def test_bpe_unk_and_decode():
    m = make_bpe_model()
    ids = m.encode("hellox")
    assert m.unk_id in ids  # 'x' not in vocab, no byte fallback
    assert m.decode(m.encode("hello hello")) == "hello hello"


def test_byte_fallback():
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
    ]
    pieces += [Piece(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [Piece("hi", -1.0), Piece("▁hi", -2.0)]
    m = SPModel(pieces=pieces, model_type=2, byte_fallback=True)
    ids = m.encode("hi é")
    # h+i -> hi, ▁+hi -> ▁hi; " é" has no pieces -> byte fallback
    assert ids[0] == m.vocab["▁hi"]
    assert m.decode(ids) == "hi é"


def test_normalize_preserves_newlines():
    # sentencepiece's remove_extra_whitespaces collapses ONLY ASCII space
    # (0x20); \n, \t, NBSP survive normalization and round-trip via byte
    # fallback (advisor round-1: str.split() was eating them).
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
    ]
    pieces += [Piece(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [Piece("hi", -1.0), Piece("▁hi", -2.0)]
    m = SPModel(pieces=pieces, model_type=2, byte_fallback=True)
    assert m._normalize("a\nb") == "▁a\nb"
    assert m._normalize("  a   b\t c  ") == "▁a▁b\t▁c"
    text = "hi\nhi\thi hi"
    assert m.decode(m.encode(text)) == text
    assert m.vocab["<0x0A>"] in m.encode("hi\nhi")


def test_unigram_viterbi():
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
        Piece("▁", -2.0),
        Piece("a", -3.0),
        Piece("b", -3.0),
        Piece("ab", -4.0),
        Piece("▁ab", -3.5),
    ]
    m = SPModel(pieces=pieces, model_type=1)
    ids = m.encode("ab")
    # ▁ab (-3.5) beats ▁+ab (-6.0) and ▁+a+b (-8.0)
    assert [m.pieces[i].piece for i in ids] == ["▁ab"]


def test_proto_roundtrip(tmp_path):
    m = make_bpe_model()
    m.byte_fallback = True
    m.pad_id = 3
    data = sp_model.serialize_model(m)
    m2 = sp_model.parse_model(data)
    assert [p.piece for p in m2.pieces] == [p.piece for p in m.pieces]
    assert [p.type for p in m2.pieces] == [p.type for p in m.pieces]
    assert np.allclose([p.score for p in m2.pieces], [p.score for p in m.pieces])
    assert (m2.model_type, m2.unk_id, m2.bos_id, m2.eos_id, m2.pad_id) == (2, 0, 1, 2, 3)
    assert m2.byte_fallback and m2.add_dummy_prefix


def test_proto_readable_by_sentencepiece_if_available(tmp_path):
    spm = pytest.importorskip("sentencepiece")
    m = make_bpe_model()
    path = tmp_path / "t.model"
    path.write_bytes(sp_model.serialize_model(m))
    proc = spm.SentencePieceProcessor(model_file=str(path))
    assert proc.vocab_size() == m.vocab_size()
    assert proc.encode("hello") == m.encode("hello")


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    corpus = d / "corpus.txt"
    corpus.write_text(
        "the quick brown fox jumps over the lazy dog\n"
        "pack my box with five dozen liquor jugs\n" * 20
    )
    Tokenizer.train(str(corpus), str(d), vocab_size=96)
    return Tokenizer(d / "tokenizer.model")


def test_trained_tokenizer_roundtrip(trained):
    text = "the quick brown fox"
    ids = trained.encode(text, bos=False)
    assert trained.decode(ids) == text


def test_encode_flags(trained):
    """bos/eos/max_length/pad semantics (reference: lit_llama/tokenizer.py:24-43)."""
    ids = trained.encode("the dog", bos=True, eos=True)
    assert ids[0] == trained.bos_id and ids[-1] == trained.eos_id
    ids = trained.encode("the quick brown fox", bos=True, max_length=3)
    assert len(ids) == 3
    ids = trained.encode("the", bos=True, max_length=10, pad=True)
    assert len(ids) == 10 and ids[-1] == trained.pad_id
    assert ids.dtype == np.int32


def test_train_bpe_incremental_equals_rescan():
    """The incremental-pair-count trainer must reproduce the naive
    rescan-every-merge loop exactly (same merges, same order) — trained
    models are bit-identical."""
    import random
    from collections import Counter

    from lit_llama_tpu.data import tokenizer as tk
    from lit_llama_tpu.data.tokenizer import WS

    def train_rescan_merges(text, vocab_size):
        words = Counter()
        for line in text.splitlines():
            for w in line.split():
                words[WS + w] += 1
        chars = sorted({c for w in words for c in w})
        n_base = 3 + len(chars)
        seqs = {w: tuple(w) for w in words}
        merges = []
        while n_base + len(merges) < vocab_size:
            pairs = Counter()
            for w, seq in seqs.items():
                f = words[w]
                for a, b in zip(seq, seq[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            (a, b), _ = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
            merged = a + b
            merges.append(merged)
            for w, seq in seqs.items():
                out, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = tuple(out)
        return merges

    rng = random.Random(0)
    lex = ["".join(rng.choices("abcdef", k=rng.randint(1, 8))) for _ in range(200)]
    text = "\n".join(" ".join(rng.choices(lex, k=10)) for _ in range(60))
    ref = train_rescan_merges(text, 120)
    model = tk.train_bpe(text, 120)
    specials = {"<unk>", "<s>", "</s>"}
    got = [p.piece for p in model.pieces if p.score < 0 and p.piece not in specials]
    assert got[: len(ref)] == ref
