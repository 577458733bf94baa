"""Safetensors reading (LoRA files and converted checkpoints).

Self-contained header parser — the format is a u64 header length, a JSON
header mapping names to {dtype, shape, data_offsets}, then a flat byte
buffer. Falls back gracefully for bf16 via ml_dtypes. Used for the
stable-lora ``.safetensors`` files the reference discovers by metadata tag
(lora_processor.py:18-34) — metadata is exposed alongside the tensors.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "BF16": _BF16,
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("bool"),
}


def load_safetensors(
    path: str, *, float32: bool = True
) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """Returns (tensors, metadata)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len))
        body = f.read()

    metadata = header.pop("__metadata__", {}) or {}
    tensors: dict[str, np.ndarray] = {}
    for name, info in header.items():
        dtype = _DTYPES[info["dtype"]]
        if dtype is None:
            raise ValueError(f"bf16 tensor {name} needs ml_dtypes")
        start, end = info["data_offsets"]
        arr = np.frombuffer(body[start:end], dtype=dtype).reshape(info["shape"])
        if float32 and info["dtype"] in ("F16", "BF16"):
            arr = arr.astype(np.float32)
        tensors[name] = arr
    return tensors, metadata
