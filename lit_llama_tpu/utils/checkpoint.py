"""Native checkpoint format: JSON manifest + single raw data file.

Replaces the reference's torch zip-pickle checkpoints (written via
``incremental_save``, reference: lit_llama/utils.py:347-499) with a format built
for TPU loading: every leaf of the parameter pytree is a contiguous record in
``data.bin`` (64-byte aligned), described by ``manifest.json``. Reads are
``np.memmap``-backed, so loading streams from disk straight into device transfers
without materializing the full tree in host RAM; writes stream one leaf at a
time. Works for arbitrary pytrees (params, optimizer state, PEFT-filtered
subsets, quantized tensors).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)
import numpy as np

_ALIGN = 64

_SEP = "/"


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(path, tree: Any, metadata: Optional[dict] = None) -> None:
    """Write a pytree of arrays to ``path`` (a directory)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = _flatten(tree)
    records = {}
    offset = 0
    with open(path / "data.bin", "wb") as f:
        for name, leaf in flat.items():
            arr = np.asarray(leaf)
            pad = (-offset) % _ALIGN
            if pad:
                f.write(b"\0" * pad)
                offset += pad
            data = np.ascontiguousarray(arr).tobytes()
            f.write(data)
            records[name] = {
                "dtype": arr.dtype.name,
                "shape": list(arr.shape),
                "offset": offset,
                "nbytes": len(data),
            }
            offset += len(data)
    manifest = {"format": "lit-llama-tpu.ckpt.v1", "records": records}
    if metadata:
        manifest["metadata"] = metadata
    (path / "manifest.json").write_text(json.dumps(manifest, indent=1))


def load_checkpoint(
    path,
    *,
    transform: Optional[Callable[[str, np.ndarray], Any]] = None,
) -> Any:
    """Load a pytree saved by :func:`save_checkpoint`.

    ``transform(name, array) -> leaf`` runs per record (e.g. ``jax.device_put``
    with a per-leaf sharding); arrays passed to it are memmap-backed slices, so
    peak host memory stays at one leaf.
    """
    path = Path(path)
    manifest = json.loads((path / "manifest.json").read_text())
    mm = np.memmap(path / "data.bin", dtype=np.uint8, mode="r")
    flat = {}
    for name, rec in manifest["records"].items():
        dtype = np.dtype(rec["dtype"]) if rec["dtype"] != "bfloat16" else np.dtype(ml_dtypes.bfloat16)
        raw = mm[rec["offset"] : rec["offset"] + rec["nbytes"]]
        arr = raw.view(dtype).reshape(rec["shape"])
        flat[name] = transform(name, arr) if transform else np.array(arr)
    return _unflatten(flat)


def load_metadata(path) -> dict:
    manifest = json.loads((Path(path) / "manifest.json").read_text())
    return manifest.get("metadata", {})
