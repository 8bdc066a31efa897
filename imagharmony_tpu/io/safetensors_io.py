"""Pure-numpy safetensors reader/writer (no torch, no safetensors dep).

Format: 8-byte LE header length, JSON header {name: {dtype, shape,
data_offsets}, "__metadata__": {...}}, then the raw little-endian buffer.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _np_dtype(code):
    if code == "BF16":
        return _bf16()
    return np.dtype(_DTYPES[code])


def _code(dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype.name == "bfloat16":
        return "BF16"
    for code, d in _DTYPES.items():
        if np.dtype(d) == dtype:
            return code
    raise ValueError(f"unsupported dtype {dtype}")


def load(path):
    """-> ({name: np.ndarray}, metadata dict)."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        buf = f.read()
    meta = header.pop("__metadata__", {})
    out = {}
    for name, info in header.items():
        start, end = info["data_offsets"]
        arr = np.frombuffer(buf[start:end], dtype=_np_dtype(info["dtype"]))
        out[name] = arr.reshape(info["shape"])
    return out, meta


def save(path, tensors, metadata=None):
    """tensors: {name: array-like}; metadata: {str: str}."""
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        a = np.ascontiguousarray(arr)
        b = a.tobytes()
        header[name] = {
            "dtype": _code(a.dtype),
            "shape": list(a.shape),
            "data_offsets": [offset, offset + len(b)],
        }
        blobs.append(b)
        offset += len(b)
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    hjson = json.dumps(header).encode()
    # pad header to 8-byte alignment (spec recommendation)
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
