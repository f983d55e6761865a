"""From-scratch reader for PyTorch zip-serialized checkpoints (.pth/.bin).

Replaces the reference's use of torch serialization internals (``lazy_load``,
reference: lit_llama/utils.py:168-344) so lit-llama / Meta / HF checkpoints can be
ingested without torch: a torch>=1.6 checkpoint is a zip archive containing
``<prefix>/data.pkl`` (a pickle whose tensors are persistent-ID references) plus one
raw little-endian buffer per storage under ``<prefix>/data/<key>``.

Implementation: a restricted ``pickle.Unpickler`` that
  * resolves only a whitelist of globals (torch storage classes -> dtype tags,
    ``torch._utils._rebuild_tensor_v2`` -> a lazy tensor constructor, containers),
  * maps persistent IDs ``('storage', storage_type, key, location, numel)`` to lazy
    storage handles backed by the zip file.

Tensors materialize as numpy arrays only when accessed (``LazyTensor.numpy()``),
so a 65B checkpoint never lives in RAM at once — the same memory-boundedness the
reference gets from ``NotYetLoadedTensor`` (utils.py:168-299). bfloat16 buffers are
viewed via ``ml_dtypes.bfloat16`` (numpy has no native bf16).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from pathlib import Path
from typing import Any, Dict

import ml_dtypes
import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "DoubleStorage": np.dtype(np.float64),
    "FloatStorage": np.dtype(np.float32),
    "HalfStorage": np.dtype(np.float16),
    "BFloat16Storage": np.dtype(ml_dtypes.bfloat16),
    "LongStorage": np.dtype(np.int64),
    "IntStorage": np.dtype(np.int32),
    "ShortStorage": np.dtype(np.int16),
    "CharStorage": np.dtype(np.int8),
    "ByteStorage": np.dtype(np.uint8),
    "BoolStorage": np.dtype(np.bool_),
    "ComplexFloatStorage": np.dtype(np.complex64),
    "ComplexDoubleStorage": np.dtype(np.complex128),
}


class _StorageTag:
    """Stands in for a torch storage class resolved from the pickle GLOBAL."""

    def __init__(self, dtype: np.dtype):
        self.dtype = dtype


class _LazyStorage:
    def __init__(self, zf: zipfile.ZipFile, record: str, dtype: np.dtype):
        self.zf = zf
        self.record = record
        self.dtype = dtype
        self._data = None

    def read(self) -> np.ndarray:
        if self._data is None:
            raw = self.zf.read(self.record)
            self._data = np.frombuffer(raw, dtype=self.dtype)
        return self._data


class LazyTensor:
    """A tensor deserialized from a torch checkpoint; materializes on access."""

    def __init__(self, storage: _LazyStorage, offset: int, size, stride):
        self.storage = storage
        self.offset = offset
        self.shape = tuple(size)
        self.stride = tuple(stride)
        self.dtype = storage.dtype

    def numpy(self) -> np.ndarray:
        flat = self.storage.read()
        itemsize = flat.dtype.itemsize
        arr = np.lib.stride_tricks.as_strided(
            flat[self.offset :],
            shape=self.shape,
            strides=tuple(s * itemsize for s in self.stride),
        )
        return np.ascontiguousarray(arr)

    def __array__(self, dtype=None):
        out = self.numpy()
        return out.astype(dtype) if dtype is not None else out

    def __repr__(self):
        return f"LazyTensor(shape={self.shape}, dtype={self.dtype})"


def _rebuild_tensor_v2(
    storage, storage_offset, size, stride, requires_grad=False, backward_hooks=None, metadata=None
):
    return LazyTensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _RestrictedUnpickler(pickle.Unpickler):
    """Only resolves the globals a torch checkpoint legitimately needs."""

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file, encoding="latin1")
        self.zf = zf
        self.prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTag(_STORAGE_DTYPES[name])
        if module == "torch" and name == "UntypedStorage":
            return _StorageTag(np.dtype(np.uint8))
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return _rebuild_tensor_v2
        if (module, name) == ("torch._utils", "_rebuild_parameter"):
            return _rebuild_parameter
        if (module, name) == ("collections", "OrderedDict"):
            import collections

            return collections.OrderedDict
        if (module, name) == ("torch.serialization", "_get_layout"):
            return lambda *a, **k: None
        if module == "torch" and name in ("float32", "float16", "bfloat16", "int64", "Size"):
            return {"Size": tuple}.get(name, name)
        raise pickle.UnpicklingError(
            f"global {module}.{name} is not allowed in checkpoint files"
        )

    def persistent_load(self, pid):
        typename, storage_type, key, _location, _numel = pid[0], pid[1], pid[2], pid[3], pid[4]
        if typename != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {typename!r}")
        record = f"{self.prefix}/data/{key}"
        dtype = (
            storage_type.dtype
            if isinstance(storage_type, _StorageTag)
            else np.dtype(np.uint8)
        )
        return _LazyStorage(self.zf, record, dtype)


def load_pth(path) -> Dict[str, Any]:
    """Load a torch zip checkpoint as a dict of :class:`LazyTensor` (lazy: tensor
    buffers are read from the zip only when materialized)."""
    path = Path(path)
    zf = zipfile.ZipFile(path)  # stays open; LazyStorage reads on demand
    pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl_names:
        raise ValueError(
            f"{path} is not a torch zip checkpoint (no data.pkl member); "
            "legacy (pre-1.6) torch checkpoints are not supported"
        )
    prefix = pkl_names[0][: -len("/data.pkl")]
    with zf.open(pkl_names[0]) as f:
        data = f.read()
    unpickler = _RestrictedUnpickler(io.BytesIO(data), zf, prefix)
    return unpickler.load()


def llama_model_lookup(state_dict: Dict[str, Any]) -> str:
    """Infer model preset from the embedding width (reference: lit_llama/utils.py:21-35)."""
    embd_to_name = {4096: "7B", 5120: "13B", 6656: "30B", 8192: "65B"}
    for key in ("transformer.wte.weight", "tok_embeddings.weight", "model.embed_tokens.weight"):
        if key in state_dict:
            t = state_dict[key]
            return embd_to_name[t.shape[1]]
    raise ValueError("cannot find an embedding weight in the checkpoint")


# ---------------------------------------------------------------------------
# Minimal torch zip WRITER — so artifacts we produce (converted or quantized
# checkpoints) remain loadable by torch-side tooling, mirroring the reference's
# incremental_save (lit_llama/utils.py:347-499). Storages are streamed into the
# zip one tensor at a time, then a small hand-built pickle references them — a
# full state dict never lives in RAM.
#
# Implementation detail: we need to pickle references to torch globals
# (torch.FloatStorage, torch._utils._rebuild_tensor_v2) *without importing
# torch*, so we use the pure-Python pickler with a ``save`` override that emits
# raw GLOBAL opcodes for sentinel objects.
# ---------------------------------------------------------------------------

_DTYPE_TO_STORAGE = {v: k for k, v in _STORAGE_DTYPES.items()}


class _Global:
    """Sentinel pickled as ``GLOBAL module.name`` without resolving it locally."""

    def __init__(self, module: str, name: str):
        self.module = module
        self.name = name

    def __call__(self, *a, **k):  # pickle's save_reduce requires a callable func
        raise NotImplementedError


class _StorageRef:
    def __init__(self, key: str, storage_name: str, numel: int):
        self.key = key
        self.storage_name = storage_name
        self.numel = numel


class _TensorRef:
    def __init__(self, ref: _StorageRef, shape, strides):
        self.ref = ref
        self.shape = tuple(shape)
        self.strides = tuple(strides)

    def __reduce__(self):
        import collections

        return (
            _Global("torch._utils", "_rebuild_tensor_v2"),
            (self.ref, 0, self.shape, self.strides, False, collections.OrderedDict()),
        )


class _PthPickler(pickle._Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageRef):
            return ("storage", _Global("torch", obj.storage_name), obj.key, "cpu", obj.numel)
        return None

    def save(self, obj, save_persistent_id=True):
        if isinstance(obj, _Global):
            self.write(pickle.GLOBAL + f"{obj.module}\n{obj.name}\n".encode("ascii"))
            self.memoize(obj)
            return
        super().save(obj, save_persistent_id)


def _contiguous_strides(shape):
    strides, acc = [], 1
    for dim in reversed(shape):
        strides.append(acc)
        acc *= dim
    return tuple(reversed(strides))


def save_pth(path, state_dict: Dict[str, np.ndarray], prefix: str = "archive") -> None:
    """Write ``{name: array}`` as a torch-loadable zip checkpoint."""
    out = {}
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        for i, (name, arr) in enumerate(state_dict.items()):
            arr = np.ascontiguousarray(np.asarray(arr))
            if arr.dtype not in _DTYPE_TO_STORAGE:
                raise ValueError(f"cannot save dtype {arr.dtype} to .pth")
            zf.writestr(f"{prefix}/data/{i}", arr.tobytes())
            ref = _StorageRef(str(i), _DTYPE_TO_STORAGE[arr.dtype], arr.size)
            out[name] = _TensorRef(ref, arr.shape, _contiguous_strides(arr.shape))
        buf = io.BytesIO()
        _PthPickler(buf, protocol=2).dump(out)
        zf.writestr(f"{prefix}/data.pkl", buf.getvalue())
        zf.writestr(f"{prefix}/version", "3\n")
