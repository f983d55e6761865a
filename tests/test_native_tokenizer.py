"""C++ tokenizer encoder vs the pure-Python reference implementation."""

import numpy as np
import pytest

from lit_llama_tpu.data import sp_model
from lit_llama_tpu.data.sp_model import BYTE, CONTROL, UNKNOWN, Piece, SPModel
from lit_llama_tpu.data.tokenizer import train_bpe
from lit_llama_tpu.native import tokenizer as native_tok

pytestmark = pytest.mark.skipif(
    not native_tok.available(), reason="no C++ toolchain"
)

CORPUS = (
    "the quick brown fox jumps over the lazy dog\n"
    "pack my box with five dozen liquor jugs\n"
    "how vexingly quick daft zebras jump\n"
) * 10

TEXTS = [
    "the quick brown fox",
    "hello unseen WORDS here",
    "  extra   spaces\tand\nnewlines  ",
    "",
    " ",
    "unicode: déjà vu — ça va? ✓",
    "a",
    "the " * 200,
    # normalization must collapse ONLY ASCII space (0x20): \n / \t / NBSP are
    # preserved for byte fallback (sentencepiece semantics; advisor round-1).
    "line one\nline two\n\nline four",
    "tab\tseparated\tvalues",
    "nbsp here and  doubled",
    " \n leading mix \n ",
]


def parity(model, texts):
    enc = native_tok.NativeEncoder(model)
    for t in texts:
        assert enc.encode(t) == model.encode_py(t), repr(t)


def test_bpe_parity_trained_model():
    model = train_bpe(CORPUS, 96)
    parity(model, TEXTS + [CORPUS])


def test_bpe_parity_byte_fallback():
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
    ]
    pieces += [Piece(f"<0x{b:02X}>", 0.0, BYTE) for b in range(256)]
    pieces += [Piece("hi", -1.0), Piece("▁hi", -2.0), Piece("▁", -3.0)]
    m = SPModel(pieces=pieces, model_type=2, byte_fallback=True)
    parity(m, TEXTS)


def test_unigram_parity():
    pieces = [
        Piece("<unk>", 0.0, UNKNOWN),
        Piece("<s>", 0.0, CONTROL),
        Piece("</s>", 0.0, CONTROL),
        Piece("▁", -2.0),
        Piece("a", -3.0),
        Piece("b", -3.5),
        Piece("ab", -4.0),
        Piece("▁ab", -3.2),
        Piece("ba", -3.1),
        Piece("▁the", -2.5),
        Piece("t", -4.0),
        Piece("h", -4.0),
        Piece("e", -4.0),
    ]
    m = SPModel(pieces=pieces, model_type=1)
    parity(m, ["ab", "abba", "the ab", "abab ba", "xyz ab"])


def test_default_encode_uses_native_and_matches():
    model = train_bpe(CORPUS, 96)
    for t in TEXTS:
        assert model.encode(t) == model.encode_py(t)


def test_native_is_faster_on_long_input():
    import time

    model = train_bpe(CORPUS, 96)
    enc = native_tok.NativeEncoder(model)
    text = CORPUS * 3  # the pure-Python pair-rescan is O(n^2); keep this modest
    t0 = time.perf_counter()
    a = enc.encode(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = model.encode_py(text)
    t_py = time.perf_counter() - t0
    assert a == b
    assert t_native < t_py, (t_native, t_py)
