"""Torch-free `.pt` checkpoint codec.

BASELINE.json requires the reference's snapshot formats to stay byte-portable
so artworks move between backends: clip_fft saves a params *list*
(clip_fft.py:315), illustra a bare tensor (illustra.py:308), and resume paths
accept either (image.py:130-150).  This module reads and writes the torch
zipfile serialization format (data.pkl + raw storage records) with no torch
dependency: reading uses a restricted Unpickler, writing emits the pickle
bytecode directly.  Round-trip compatibility with real torch.load/save is
covered by tests/test_checkpoint.py.
"""
from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile

import numpy as np

_DTYPE_TO_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("bool"): "BoolStorage",
}
_STORAGE_TO_DTYPE = {v: k for k, v in _DTYPE_TO_STORAGE.items()}
_STORAGE_TO_DTYPE["BFloat16Storage"] = None  # handled specially


# --------------------------------------------------------------- reading

class _StorageRef:
    def __init__(self, storage_name, key, numel):
        self.storage_name = storage_name
        self.key = key
        self.numel = numel


class _StorageTypeStub:
    """Stands in for torch.FloatStorage etc. during unpickling."""
    def __init__(self, name):
        self.name = name


def _rebuild_tensor_v2(storage, storage_offset, size, stride, requires_grad,
                       backward_hooks, metadata=None):
    return ("__tensor__", storage, storage_offset, tuple(size), tuple(stride))


def _rebuild_parameter(data, requires_grad, backward_hooks):
    return data


class _Unpickler(pickle.Unpickler):
    ALLOWED = {
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        ("collections", "OrderedDict"): dict,
    }

    def find_class(self, module, name):
        if (module, name) in self.ALLOWED:
            return self.ALLOWED[(module, name)]
        if module == "torch" and name.endswith("Storage"):
            return _StorageTypeStub(name)
        if module == "torch" and name == "Size":
            return tuple
        raise pickle.UnpicklingError(
            f"blocked global during .pt load: {module}.{name}")

    def persistent_load(self, pid):
        kind = pid[0]
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        name = (storage_type.name if isinstance(storage_type, _StorageTypeStub)
                else str(storage_type))
        return _StorageRef(name, key, numel)


def _materialize(obj, read_record):
    """Replace tensor placeholders with numpy arrays (recursively)."""
    if isinstance(obj, tuple) and len(obj) == 5 and obj[0] == "__tensor__":
        _, ref, offset, size, stride = obj
        raw = read_record(ref.key)
        if ref.storage_name == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            arr = np.frombuffer(raw, dtype=_STORAGE_TO_DTYPE[ref.storage_name])
        arr = arr[offset:]
        if size == ():
            return arr[:1].reshape(())
        itemsize = arr.dtype.itemsize
        return np.lib.stride_tricks.as_strided(
            arr, shape=size, strides=[s * itemsize for s in stride]).copy()
    if isinstance(obj, dict):
        return {k: _materialize(v, read_record) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_materialize(v, read_record) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_materialize(v, read_record) for v in obj)
    return obj


def load_pt(path: str):
    """Load a torch-format .pt file into numpy structures (torch-free)."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] != b"PK":
        raise ValueError(
            f"{path}: not a torch zipfile checkpoint (legacy format "
            "unsupported; re-save with torch>=1.6)")
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]

    def read_record(key):
        return zf.read(f"{prefix}data/{key}")

    obj = _Unpickler(io.BytesIO(zf.read(pkl_name))).load()
    return _materialize(obj, read_record)


# --------------------------------------------------------------- writing

class _PickleWriter:
    """Minimal pickle protocol-2 emitter for .pt object graphs: containers,
    scalars, strings, and torch-tensor records with persistent storage ids."""

    def __init__(self):
        self.out = io.BytesIO()
        self.storages = []          # list of numpy arrays, index = record key
        self.memo_count = 0
        self.out.write(b"\x80\x02")  # PROTO 2

    def _memo(self):
        # put into memo (required structure torch emits; keeps refs valid)
        i = self.memo_count
        self.memo_count += 1
        if i < 256:
            self.out.write(b"q" + struct.pack("<B", i))
        else:
            self.out.write(b"r" + struct.pack("<I", i))

    def global_(self, module, name):
        self.out.write(f"c{module}\n{name}\n".encode())
        self._memo()

    def save(self, obj):
        w = self.out.write
        if obj is None:
            w(b"N")
        elif obj is True:
            w(b"\x88")
        elif obj is False:
            w(b"\x89")
        elif isinstance(obj, int):
            if 0 <= obj < 256:
                w(b"K" + struct.pack("<B", obj))
            elif -2**31 <= obj < 2**31:
                w(b"J" + struct.pack("<i", obj))
            else:
                data = pickle.encode_long(obj)
                w(b"\x8a" + struct.pack("<B", len(data)) + data)
        elif isinstance(obj, float):
            w(b"G" + struct.pack(">d", obj))
        elif isinstance(obj, str):
            data = obj.encode("utf-8")
            w(b"X" + struct.pack("<I", len(data)) + data)
            self._memo()
        elif isinstance(obj, bytes):
            w(b"C" + struct.pack("<B", len(obj)) + obj) if len(obj) < 256 else \
                w(b"B" + struct.pack("<I", len(obj)) + obj)
            self._memo()
        elif isinstance(obj, (np.ndarray, np.generic)) or type(obj).__name__ == "ArrayImpl":
            self._save_tensor(np.asarray(obj))
        elif isinstance(obj, tuple):
            if len(obj) <= 3 and all(not isinstance(o, (list, dict)) for o in obj):
                for o in obj:
                    self.save(o)
                w({0: b")", 1: b"\x85", 2: b"\x86", 3: b"\x87"}[len(obj)])
            else:
                w(b"(")
                for o in obj:
                    self.save(o)
                w(b"t")
            self._memo()
        elif isinstance(obj, list):
            w(b"]")
            self._memo()
            w(b"(")
            for o in obj:
                self.save(o)
            w(b"e")
        elif isinstance(obj, dict):
            w(b"}")
            self._memo()
            w(b"(")
            for k, v in obj.items():
                self.save(k)
                self.save(v)
            w(b"u")
        else:
            raise TypeError(f"save_pt cannot serialize {type(obj)}")

    def _save_tensor(self, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.dtype("float64"):
            pass
        if arr.dtype not in _DTYPE_TO_STORAGE:
            arr = arr.astype(np.float32)
        storage_name = _DTYPE_TO_STORAGE[arr.dtype]
        key = str(len(self.storages))
        self.storages.append(arr)
        w = self.out.write
        # torch._utils._rebuild_tensor_v2(pid, offset, size, stride, False, OrderedDict())
        self.global_("torch._utils", "_rebuild_tensor_v2")
        w(b"(")
        # persistent id tuple: ('storage', StorageType, key, location, numel)
        w(b"(")
        self.save("storage")
        self.global_("torch", storage_name)
        self.save(key)
        self.save("cpu")
        self.save(int(arr.size))
        w(b"t")
        self._memo()
        w(b"Q")  # BINPERSID
        self.save(0)                                   # storage offset
        self.save(tuple(int(s) for s in arr.shape))    # size
        stride = tuple(int(s // arr.itemsize) for s in arr.strides)
        self.save(stride)
        w(b"\x89")                                     # requires_grad=False
        self.global_("collections", "OrderedDict")     # backward hooks
        w(b")R")
        self._memo()
        w(b"t")
        self._memo()
        w(b"R")  # REDUCE
        self._memo()

    def finish(self, obj) -> bytes:
        self.save(obj)
        self.out.write(b".")
        return self.out.getvalue()


def save_pt(path: str, obj) -> None:
    """Save numpy/jax structures as a torch-zipfile .pt readable by
    torch.load (and by load_pt)."""
    pw = _PickleWriter()
    data = pw.finish(obj)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", data)
        for i, arr in enumerate(pw.storages):
            zf.writestr(f"archive/data/{i}", arr.tobytes())
        zf.writestr("archive/version", "3\n")
        zf.writestr("archive/byteorder", "little")
