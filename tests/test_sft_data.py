"""SFT data pipeline tests: prompt template, label masking, batching,
reference-.pt interop (reference: prepare_alpaca semantics)."""

import numpy as np
import pytest

from lit_llama_tpu.data import sft


class FakeTokenizer:
    bos_id, eos_id, pad_id = 1, 2, -1

    def encode(self, s, bos=True, eos=False, max_length=-1, pad=False):
        toks = [3 + (ord(c) % 50) for c in s[:200]]
        if bos:
            toks = [self.bos_id] + toks
        if eos:
            toks = toks + [self.eos_id]
        if max_length > 0:
            toks = toks[:max_length]
        return np.asarray(toks, np.int32)


def test_generate_prompt_with_and_without_input():
    with_input = sft.generate_prompt({"instruction": "do X", "input": "ctx"})
    assert "### Input:" in with_input and "ctx" in with_input
    without = sft.generate_prompt({"instruction": "do X", "input": ""})
    assert "### Input:" not in without
    assert without.endswith("### Response:")


def test_prepare_sample_masks_prompt():
    tok = FakeTokenizer()
    ex = {"instruction": "say hi", "input": "", "output": " hi there"}
    s = sft.prepare_sample(ex, tok, max_length=512, mask_inputs=True)
    n_prompt = len(s["input_ids_no_response"])
    assert (s["labels"][:n_prompt] == sft.IGNORE_INDEX).all()
    assert (s["labels"][n_prompt:] != sft.IGNORE_INDEX).all()
    # unmasked variant keeps labels == input_ids
    s2 = sft.prepare_sample(ex, tok, max_length=512, mask_inputs=False)
    np.testing.assert_array_equal(s2["labels"], s2["input_ids"])


def test_save_load_npz_roundtrip(tmp_path):
    tok = FakeTokenizer()
    samples = [
        sft.prepare_sample(
            {"instruction": f"i{k}", "input": "", "output": "o" * (k + 1)}, tok, 64
        )
        for k in range(5)
    ]
    sft.save_samples(samples, tmp_path / "train.npz")
    loaded = sft.load_samples(tmp_path / "train.npz")
    assert len(loaded) == 5
    for a, b in zip(samples, loaded):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_save_load_reference_pt_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    tok = FakeTokenizer()
    samples = [
        sft.prepare_sample({"instruction": "a", "input": "", "output": "bb"}, tok, 64)
    ]
    sft.save_samples(samples, tmp_path / "train.pt")
    # the file is a regular torch artifact
    raw = torch.load(tmp_path / "train.pt", weights_only=False)
    assert isinstance(raw, list) and "input_ids" in raw[0]
    loaded = sft.load_samples(tmp_path / "train.pt")
    np.testing.assert_array_equal(loaded[0]["input_ids"], samples[0]["input_ids"])


def test_get_batch_padding_and_bucketing():
    rng = np.random.default_rng(0)
    data = [
        {"input_ids": np.arange(1, n, dtype=np.int32), "labels": np.arange(1, n, dtype=np.int32)}
        for n in (5, 9, 30, 70)
    ]
    x, y = sft.get_batch(data, batch_size=4, rng=rng, accum_steps=2, pad_multiple=64)
    assert x.shape[0] == 2 and x.shape[1] == 4
    assert x.shape[2] % 64 == 0
    # inputs pad 0, labels pad -1 (reference: finetune/full.py:209-216)
    lens = {id(d["input_ids"]): len(d["input_ids"]) for d in data}
    assert (y[x == 0] == sft.IGNORE_INDEX).all()


def test_get_batch_is_next_token_aligned():
    # Regression: labels must be the NEXT token for each input position, not a
    # copy objective (advisor round-1 high finding). With input_ids == labels ==
    # [10, 11, 12, ...], y[t] must equal x[t] + 1 at every valid position.
    rng = np.random.default_rng(0)
    seq = np.arange(10, 30, dtype=np.int32)
    data = [{"input_ids": seq, "labels": seq.copy()}]
    x, y = sft.get_batch(data, batch_size=1, rng=rng, accum_steps=1, pad_multiple=8)
    valid = y != sft.IGNORE_INDEX
    assert valid.any()
    np.testing.assert_array_equal(y[valid], x[valid] + 1)
    # the final input token of the sample is dropped (it has no next token)
    assert x.max() == seq[-2]


def test_length_grouped_indices_longest_first():
    rng = np.random.default_rng(0)
    lengths = list(rng.integers(1, 100, size=500))
    lengths[123] = 1000
    idx = sft.length_grouped_indices(lengths, batch_size=4, rng=rng)
    assert idx[0] == 123  # global longest first to OOM early (reference :26-101)
    assert sorted(idx.tolist()) == list(range(500))
