"""Torch checkpoint (.bin / .pt zip-pickle) reader AND writer — no torch.

The reference's checkpoint interchange format is ``torch.save`` zip
archives (reference convert_bin.py:14,43; ip_adapter/ip_adapter.py:149).
A torch zip contains ``<name>/data.pkl`` (a pickle whose tensors are
persistent-id references) plus ``<name>/data/<key>`` raw storages.

Reader: a restricted Unpickler — only the torch rebuild functions and
storage persistent-ids are honored; everything else raises (this is also
the safe-unpickling posture: no arbitrary class construction).

Writer: emits the same schema with hand-rolled pickle opcodes, so files we
write load with stock ``torch.load`` — giving bit-for-bit interchange with
the reference ecosystem without importing torch.
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile

import numpy as np

# torch storage class name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": "float32",
    "DoubleStorage": "float64",
    "HalfStorage": "float16",
    "LongStorage": "int64",
    "IntStorage": "int32",
    "ShortStorage": "int16",
    "CharStorage": "int8",
    "ByteStorage": "uint8",
    "BoolStorage": "bool",
    "BFloat16Storage": "bfloat16",
}
_DTYPE_TO_STORAGE = {v: k for k, v in _STORAGE_DTYPES.items()}


def _np_dtype(name):
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class _StorageRef:
    __slots__ = ("dtype", "key", "numel")

    def __init__(self, dtype, key, numel):
        self.dtype, self.key, self.numel = dtype, key, numel


class _TypeTag:
    """Stands in for torch dtype/storage classes referenced by the pickle."""

    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    return ("tensor", storage, storage_offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, *_args):
    return data


_ALLOWED_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): dict,
}


class _Unpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _ALLOWED_GLOBALS:
            return _ALLOWED_GLOBALS[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _TypeTag(name)
        if module == "torch" and name.endswith((".float32", "float16")):
            return _TypeTag(name)
        if module == "torch":  # dtypes like torch.float32 arrive as getattr
            return _TypeTag(name)
        raise pickle.UnpicklingError(f"blocked global {module}.{name}")

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = storage_type.name if isinstance(storage_type, _TypeTag) else str(storage_type)
        return _StorageRef(_STORAGE_DTYPES[name.split(".")[-1]], key, numel)


def _materialize(obj, read_storage):
    if isinstance(obj, tuple) and obj and obj[0] == "tensor":
        _, ref, offset, size, stride = obj
        dt = _np_dtype(ref.dtype)
        buf = read_storage(ref.key)
        flat = np.frombuffer(buf, dtype=dt)
        # Bounds validation: a crafted .bin could otherwise drive
        # as_strided out of the storage (OOB read / segfault).
        if offset < 0 or any(s < 0 for s in stride) or any(d < 0 for d in size):
            raise ValueError(
                f"tensor with negative offset/stride/size rejected: "
                f"offset={offset} size={size} stride={stride}"
            )
        if not size:
            if offset >= flat.size:
                raise ValueError(f"scalar offset {offset} beyond storage {flat.size}")
            return flat[offset].copy()
        if all(d > 0 for d in size):
            last = offset + sum(s * (d - 1) for s, d in zip(stride, size))
            if last >= flat.size:
                raise ValueError(
                    f"tensor view out of bounds: needs element {last}, "
                    f"storage has {flat.size} (offset={offset} size={size} "
                    f"stride={stride})"
                )
        strides_bytes = tuple(s * dt.itemsize for s in stride)
        arr = np.lib.stride_tricks.as_strided(
            flat[offset:], shape=size, strides=strides_bytes
        )
        return np.ascontiguousarray(arr)
    if isinstance(obj, dict):
        return {k: _materialize(v, read_storage) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_materialize(v, read_storage) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v, read_storage) for v in obj)
    return obj


def load(path):
    """torch.save zip archive -> nested dict of numpy arrays."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl") or n == "data.pkl")
        root = pkl_name[: -len("data.pkl")]
        with zf.open(pkl_name) as f:
            obj = _Unpickler(f).load()

        def read_storage(key):
            return zf.read(f"{root}data/{key}")

        return _materialize(obj, read_storage)


# ---------------------------------------------------------------------------
# Writer — hand-rolled pickle opcodes for the torch schema
# ---------------------------------------------------------------------------


class _Writer:
    def __init__(self):
        self.out = io.BytesIO()
        self.storages = []  # (key, bytes)
        self.memo_count = 0

    def w(self, b):
        self.out.write(b)

    def put_str(self, s):
        b = s.encode("utf-8")
        if len(b) < 256:
            self.w(b"\x8c" + struct.pack("<B", len(b)) + b)  # SHORT_BINUNICODE
        else:
            self.w(b"X" + struct.pack("<I", len(b)) + b)  # BINUNICODE

    def put_int(self, i):
        if 0 <= i < 256:
            self.w(b"K" + struct.pack("<B", i))  # BININT1
        elif 0 <= i < 65536:
            self.w(b"M" + struct.pack("<H", i))  # BININT2
        elif -(2**31) <= i < 2**31:
            self.w(b"J" + struct.pack("<i", i))  # BININT
        else:
            self.w(b"\x8a")  # LONG1
            data = i.to_bytes((i.bit_length() + 8) // 8, "little", signed=True)
            self.w(struct.pack("<B", len(data)) + data)

    def put_bool(self, b):
        self.w(b"\x88" if b else b"\x89")

    def put_global(self, module, name):
        self.w(b"c" + module.encode() + b"\n" + name.encode() + b"\n")

    def put_tuple(self, emit_items):
        self.w(b"(")  # MARK
        emit_items()
        self.w(b"t")  # TUPLE

    def put_tensor(self, arr):
        a = np.ascontiguousarray(arr)
        dtype_name = "bfloat16" if a.dtype.name == "bfloat16" else a.dtype.name
        storage_cls = _DTYPE_TO_STORAGE[dtype_name]
        key = str(len(self.storages))
        self.storages.append((key, a.tobytes()))

        # REDUCE(_rebuild_tensor_v2, (pid, 0, shape, stride, False, OrderedDict()))
        self.put_global("torch._utils", "_rebuild_tensor_v2")
        self.w(b"(")  # MARK for args tuple
        # persistent id tuple: ('storage', StorageClass, key, 'cpu', numel)
        self.w(b"(")
        self.put_str("storage")
        self.put_global("torch", storage_cls)
        self.put_str(key)
        self.put_str("cpu")
        self.put_int(a.size)
        self.w(b"t")
        self.w(b"Q")  # BINPERSID
        self.put_int(0)  # storage_offset
        self.put_tuple(lambda: [self.put_int(s) for s in a.shape])
        # contiguous strides in elements
        strides = []
        acc = 1
        for s in reversed(a.shape):
            strides.insert(0, acc)
            acc *= s
        self.put_tuple(lambda: [self.put_int(s) for s in strides])
        self.put_bool(False)  # requires_grad
        self.put_global("collections", "OrderedDict")
        self.w(b")R")  # EMPTY_TUPLE + REDUCE -> backward_hooks
        self.w(b"t")  # close args tuple
        self.w(b"R")  # REDUCE

    def put_obj(self, obj):
        if isinstance(obj, dict):
            self.w(b"}")  # EMPTY_DICT
            if obj:
                self.w(b"(")  # MARK
                for k, v in obj.items():
                    self.put_obj(k)
                    self.put_obj(v)
                self.w(b"u")  # SETITEMS
        elif isinstance(obj, str):
            self.put_str(obj)
        elif isinstance(obj, bool):
            self.put_bool(obj)
        elif isinstance(obj, (int, np.integer)):
            self.put_int(int(obj))
        elif isinstance(obj, (float, np.floating)):
            self.w(b"G" + struct.pack(">d", float(obj)))
        elif obj is None:
            self.w(b"N")
        elif isinstance(obj, np.ndarray):
            self.put_tensor(obj)
        elif isinstance(obj, (list, tuple)):
            self.w(b"]")  # EMPTY_LIST
            if obj:
                self.w(b"(")
                for v in obj:
                    self.put_obj(v)
                self.w(b"e")  # APPENDS
        else:
            raise TypeError(f"cannot serialize {type(obj)}")

    def dumps(self, obj):
        self.w(b"\x80\x02")  # PROTO 2
        self.put_obj(obj)
        self.w(b".")  # STOP
        return self.out.getvalue()


def save(path, obj, *, archive_name="archive"):
    """Write a nested dict of numpy arrays as a torch.load-compatible zip."""
    w = _Writer()
    pkl = w.dumps(obj)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", pkl)
        for key, blob in w.storages:
            zf.writestr(f"{archive_name}/data/{key}", blob)
        zf.writestr(f"{archive_name}/version", "3\n")
