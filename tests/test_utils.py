"""Serialization and helper tests (reference: tests/test_utils.py:13-75)."""

import numpy as np
import pytest

from lit_llama_tpu.utils.checkpoint import load_checkpoint, load_metadata, save_checkpoint
from lit_llama_tpu.utils.math import find_multiple
from lit_llama_tpu.utils.pth_reader import llama_model_lookup, load_pth, save_pth


def test_find_multiple():
    # reference: tests/test_utils.py find_multiple cases
    assert find_multiple(17, 5) == 20
    assert find_multiple(30, 7) == 35
    assert find_multiple(10, 2) == 10
    assert find_multiple(5, 10) == 10


def test_pth_roundtrip_ours(tmp_path):
    import ml_dtypes

    sd = {
        "x": np.random.randn(3, 5).astype(np.float32),
        "y": np.arange(7, dtype=np.int64),
        "z": np.random.randn(4, 4).astype(ml_dtypes.bfloat16),
    }
    save_pth(tmp_path / "a.pth", sd)
    back = load_pth(tmp_path / "a.pth")
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(np.asarray(back[k]), sd[k])


def test_pth_torch_interop(tmp_path):
    torch = pytest.importorskip("torch")
    # torch.save -> our reader (incl. non-contiguous and bf16)
    sd = {
        "w": torch.randn(4, 6),
        "b": torch.randn(8, 2).to(torch.bfloat16),
        "t": torch.randn(6, 6).t(),
        "flag": torch.tensor([True, False]),
    }
    torch.save(sd, tmp_path / "t.pth")
    ours = load_pth(tmp_path / "t.pth")
    for k, v in sd.items():
        got = np.asarray(ours[k])
        want = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        np.testing.assert_allclose(got.astype(np.float32), want.astype(np.float32) if want.dtype != np.bool_ else want, rtol=0, atol=0)

    # our writer -> torch.load with the strict weights_only unpickler
    ours_sd = {"x": np.random.randn(3, 2).astype(np.float32)}
    save_pth(tmp_path / "o.pth", ours_sd)
    back = torch.load(tmp_path / "o.pth", weights_only=True)
    np.testing.assert_array_equal(back["x"].numpy(), ours_sd["x"])


def test_llama_model_lookup():
    sd = {"transformer.wte.weight": np.zeros((32000, 5120), np.float32)}
    assert llama_model_lookup(sd) == "13B"


def test_checkpoint_roundtrip(tmp_path):
    import ml_dtypes

    tree = {
        "a": {"w": np.random.randn(4, 4).astype(np.float32)},
        "b": [np.arange(3), np.arange(4, dtype=np.int32)],
        "scale": np.random.randn(8).astype(ml_dtypes.bfloat16),
    }
    save_checkpoint(tmp_path / "ckpt", tree, metadata={"step": 7})
    back = load_checkpoint(tmp_path / "ckpt")
    np.testing.assert_array_equal(back["a"]["w"], tree["a"]["w"])
    np.testing.assert_array_equal(back["b"]["0"], tree["b"][0])
    np.testing.assert_array_equal(
        back["scale"].astype(np.float32), tree["scale"].astype(np.float32)
    )
    assert load_metadata(tmp_path / "ckpt") == {"step": 7}


def test_cli_parses_types(capsys):
    from lit_llama_tpu.utils.cli import cli

    calls = {}

    def main(a: int = 1, b: float = 0.5, flag: bool = False, name: str = "x") -> None:
        """Doc.

        Args:
            a: The a value.
        """
        calls.update(a=a, b=b, flag=flag, name=name)

    cli(main, ["--a", "3", "--b", "2.5", "--flag", "true", "--name", "hi"])
    assert calls == {"a": 3, "b": 2.5, "flag": True, "name": "hi"}


def test_comm_anatomy_census_parses_hlo_collectives():
    """scripts/comm_anatomy.py HLO census: op kinds and byte counts."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "_comm_anatomy",
        Path(__file__).parent.parent / "scripts" / "comm_anatomy.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    hlo = """
  %ar = f32[8,1,5120]{2,1,0} all-reduce(f32[8,1,5120] %x), replica_groups={{0,1}}
  %ag = f32[8,1,32000]{1,0,2} all-gather(f32[8,1,16000] %y), dimensions={2}
  %dot = bf16[8,128]{1,0} dot(bf16[8,64] %a, bf16[64,128] %b)
"""
    rows = mod.census(hlo)
    kinds = sorted(k for k, _, _ in rows)
    assert kinds == ["all-gather", "all-reduce"]
    by_kind = {k: b for k, _, b in rows}
    assert by_kind["all-reduce"] == 8 * 1 * 5120 * 4
    assert by_kind["all-gather"] == 8 * 1 * 32000 * 4
