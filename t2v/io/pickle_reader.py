"""Torch-free reader for PyTorch zip checkpoints (.pth/.bin/.ckpt).

The framework must ingest the reference model zoo —
``text2video_pytorch_model.pth``, ``VQGAN_autoencoder.pth``,
``open_clip_pytorch_model.bin`` (SURVEY.md §5.4) and VideoCrafter Lightning
``model.ckpt`` files — without importing torch on the serving path. A torch
checkpoint is a zip archive holding ``<name>/data.pkl`` (a pickle of the
state_dict with tensors replaced by persistent-id storage references) plus
one raw little-endian buffer per storage under ``<name>/data/<key>``.

Security: unpickling is restricted to an allowlist (container types +
``torch._utils._rebuild_tensor_v2``); any other global raises. This is the
"small restricted unpickler" SURVEY.md §7 calls for.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from dataclasses import dataclass
from typing import Any, BinaryIO

import numpy as np

try:  # bfloat16 support without torch
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "HalfStorage": np.dtype("<f2"),
    "DoubleStorage": np.dtype("<f8"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("bool"),
    "BFloat16Storage": _BFLOAT16,
}


@dataclass
class _Storage:
    key: str
    dtype: np.dtype
    numel: int


@dataclass
class _TensorStub:
    storage: _Storage
    offset: int
    shape: tuple[int, ...]
    stride: tuple[int, ...]


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False, backward_hooks=None, metadata=None):
    return _TensorStub(storage, offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _StorageType:
    """Stands in for torch.FloatStorage etc. during unpickling."""

    def __init__(self, name: str):
        self.dtype = _STORAGE_DTYPES.get(name)
        self.name = name


class _DictShim(dict):
    """dict subclass standing in for collections.OrderedDict: real torch
    checkpoints carry the state_dict's ``_metadata`` attribute through the
    pickle BUILD opcode, which needs an instance ``__dict__`` (a plain dict
    has none and fails to unpickle)."""


_SAFE_GLOBALS: dict[tuple[str, str], Any] = {
    ("collections", "OrderedDict"): _DictShim,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("torch", "Size"): tuple,
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, f: BinaryIO):
        super().__init__(f, encoding="latin1")
        self.storages: dict[str, _Storage] = {}

    def find_class(self, module: str, name: str):
        if (module, name) in _SAFE_GLOBALS:
            return _SAFE_GLOBALS[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _StorageType(name)
        # scalar dtype globals occasionally appear in newer checkpoints
        if module == "torch" and name in ("float32", "float16", "bfloat16", "float64", "int64", "int32", "bool"):
            return name
        raise pickle.UnpicklingError(
            f"blocked global {module}.{name} in checkpoint (restricted unpickler)"
        )

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unsupported persistent id {pid!r}")
        _, storage_type, key, _location, numel = pid
        dtype = storage_type.dtype if isinstance(storage_type, _StorageType) else None
        if dtype is None:
            raise pickle.UnpicklingError(
                f"unsupported storage dtype {getattr(storage_type, 'name', storage_type)}"
            )
        st = _Storage(str(key), dtype, int(numel))
        self.storages[st.key] = st
        return st


def _materialise(stub: _TensorStub, raw: bytes) -> np.ndarray:
    base = np.frombuffer(raw, dtype=stub.storage.dtype)
    if not stub.shape:
        if not 0 <= stub.offset < base.size:
            raise ValueError("tensor offset out of storage bounds")
        return base[stub.offset].copy()
    # bound-check before as_strided: a crafted shape/stride/offset must not
    # read outside the storage buffer (the restricted unpickler's threat
    # model extends to tensor metadata)
    max_index = stub.offset + sum(
        (dim - 1) * st for dim, st in zip(stub.shape, stub.stride) if dim > 0
    )
    numel = 1
    for dim in stub.shape:
        numel *= dim
    if (
        stub.offset < 0
        or any(d < 0 for d in stub.shape)
        or any(s < 0 for s in stub.stride)
        or (numel > 0 and max_index >= base.size)
    ):
        raise ValueError(
            f"tensor view out of storage bounds: offset={stub.offset} "
            f"shape={stub.shape} stride={stub.stride} storage={base.size}"
        )
    arr = np.lib.stride_tricks.as_strided(
        base[stub.offset :],
        shape=stub.shape,
        strides=tuple(s * base.itemsize for s in stub.stride),
    )
    return np.ascontiguousarray(arr)


def load_torch_checkpoint(path: str, *, float32: bool = True) -> dict[str, np.ndarray]:
    """Read a torch zip checkpoint into a flat {key: np.ndarray} dict.

    float32=True upcasts fp16/bf16 tensors (fp16-pruned model variants,
    reference README.md:93). Nested containers (Lightning ckpts with
    'state_dict'/'global_step') are preserved; tensors inside become arrays.
    """
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            unpickler = _RestrictedUnpickler(f)
            obj = unpickler.load()

        cache: dict[str, bytes] = {}

        def read_storage(key: str) -> bytes:
            if key not in cache:
                cache[key] = zf.read(f"{prefix}data/{key}")
            return cache[key]

        def resolve(x):
            if isinstance(x, _TensorStub):
                arr = _materialise(x, read_storage(x.storage.key))
                if float32 and arr.dtype in (np.dtype("<f2"), _BFLOAT16):
                    arr = arr.astype(np.float32)
                return arr
            if isinstance(x, dict):
                return {k: resolve(v) for k, v in x.items()}
            if isinstance(x, (list, tuple)):
                return type(x)(resolve(v) for v in x)
            return x

        return resolve(obj)
