"""Native (C++) host kernels, bound via ctypes.

Built on demand with g++ (no pybind11 dependency); everything has a pure
numpy/PIL fallback so the framework works without a toolchain. The compute
path on TPU is jax/XLA/Pallas — this covers the *host* hot loops (training
data preprocessing) the reference leaves to torchvision.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "image_ops.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "_image_ops.so")
_HASH = _OUT + ".src-sha256"


def _src_hash() -> str:
    import hashlib

    with open(os.path.abspath(_SRC), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str):
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        os.path.abspath(_SRC), "-o", _OUT,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_HASH, "w") as f:
        f.write(src_hash)


def load():
    """Load (building if needed) the native library, or None.

    The .so is never checked in (unreviewable binary); it is rebuilt from
    csrc/image_ops.cpp whenever the recorded source hash doesn't match, so
    a stale or foreign binary can't be silently loaded.
    """
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            want = _src_hash()
            have = None
            if os.path.exists(_OUT) and os.path.exists(_HASH):
                with open(_HASH) as f:
                    have = f.read().strip()
            if have != want:
                _build(want)
            lib = ctypes.CDLL(_OUT)
            lib.image_ops_abi_version.restype = ctypes.c_int
            assert lib.image_ops_abi_version() == 1
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return load() is not None


def batch_preprocess(images, out_size, *, tops, lefts, mean, std, num_threads=0):
    """Fused shortest-edge-resize + crop + normalize for a batch.

    images: list of HWC uint8 arrays (any sizes). tops/lefts: crop offsets in
    resized coordinates. -> (N, out_size, out_size, 3) float32.
    """
    lib = load()
    n = len(images)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    if lib is None:
        from PIL import Image

        for i, img in enumerate(images):
            im = Image.fromarray(img)
            w, h = im.size
            short = min(w, h)
            nw, nh = round(w * out_size / short), round(h * out_size / short)
            im = im.resize((nw, nh), Image.BILINEAR)
            im = im.crop((lefts[i], tops[i], lefts[i] + out_size, tops[i] + out_size))
            arr = np.asarray(im, np.float32) / 255.0
            out[i] = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
        return out

    images = [np.ascontiguousarray(im) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    shs = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    sws = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    tops_c = (ctypes.c_int * n)(*[int(t) for t in tops])
    lefts_c = (ctypes.c_int * n)(*[int(l) for l in lefts])
    mean_c = (ctypes.c_float * 3)(*[float(m) for m in mean])
    std_c = (ctypes.c_float * 3)(*[float(s) for s in std])
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    lib.batch_resize_crop_normalize(
        ptrs, shs, sws, ctypes.c_int(n), ctypes.c_int(out_size),
        tops_c, lefts_c, mean_c, std_c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(num_threads),
    )
    return out
