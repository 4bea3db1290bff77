"""ctypes bindings for the native packed-shard reader
(native/packed_reader.cpp)."""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsubgc_packed.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "packed_reader.cpp")
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O2", "-fPIC", "-shared", "-std=c++17",
                            "-o", _SO_PATH, src], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO_PATH)
        lib.subgc_packed_open.restype = ctypes.c_void_p
        lib.subgc_packed_open.argtypes = [ctypes.c_char_p]
        lib.subgc_packed_close.argtypes = [ctypes.c_void_p]
        lib.subgc_packed_count.restype = ctypes.c_uint32
        lib.subgc_packed_count.argtypes = [ctypes.c_void_p]
        lib.subgc_packed_header.argtypes = [ctypes.c_void_p,
                                            ctypes.POINTER(ctypes.c_uint8)]
        lib.subgc_packed_record.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.subgc_packed_record.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.subgc_packed_ids.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_int64)]
        lib.subgc_packed_gather.restype = ctypes.c_uint32
        lib.subgc_packed_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    except Exception as e:
        print(f"native packed reader unavailable ({e})")
        _lib = None
    return _lib


class _LazyRecord:
    """Dict-like field accessor over one packed record buffer."""
    __slots__ = ("_buf", "_offsets", "_cache")

    def __init__(self, buf, offsets):
        self._buf = buf
        self._offsets = offsets
        self._cache = {}

    def __getitem__(self, name):
        v = self._cache.get(name)
        if v is None:
            off, dt, shape, size = self._offsets[name]
            v = np.frombuffer(self._buf[off:off + size],
                              dtype=dt).reshape(shape)
            if name == "img_id":
                v = int(v[()])
            self._cache[name] = v
        return v

    def keys(self):
        return self._offsets.keys()


class NativePackedReader:
    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native packed reader unavailable")
        self.lib = lib
        self.handle = lib.subgc_packed_open(path.encode())
        if not self.handle:
            raise RuntimeError(f"cannot open shard {path}")
        hdr = (ctypes.c_uint8 * 48)()
        lib.subgc_packed_header(self.handle, hdr)
        (magic, self.n_images, obj_num, rel_num, feat_dim, n_obj_cls,
         n_rel_cls, max_subg, _res, self.record_size) = struct.unpack(
            "<QIIIIIIIIQ", bytes(hdr))
        from ..data.packed import PackedSpec
        self.spec = PackedSpec(obj_num, rel_num, feat_dim, n_obj_cls,
                               n_rel_cls, max_subg)
        self._offsets = {}
        off = 0
        for name, dt, shape in self.spec.record_fields():
            size = np.dtype(dt).itemsize * int(np.prod(shape) or 1)
            self._offsets[name] = (off, dt, shape, size)
            off += size

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.subgc_packed_close(self.handle)
        except Exception:
            pass

    def image_ids(self) -> np.ndarray:
        out = np.zeros(self.n_images, np.int64)
        self.lib.subgc_packed_ids(
            self.handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def record(self, i: int) -> "_LazyRecord":
        """Zero-copy lazy view over the mmap'ed record: fields materialize
        (as read-only numpy views) only when accessed, so a source that
        reads 3 of the 11 fields parses 3.  Views alias the mmap — keep the
        reader alive while they're in use (the loaders own it for their
        whole lifetime)."""
        ptr = self.lib.subgc_packed_record(self.handle, i)
        if not ptr:
            raise IndexError(i)
        buf = np.ctypeslib.as_array(ptr, shape=(self.record_size,))
        return _LazyRecord(buf, self._offsets)

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        """Batched contiguous copy of records -> [n, record_size] uint8.

        Raises IndexError on an out-of-range index (the C side stops at the
        first bad row instead of dereferencing a null record pointer)."""
        idx = np.asarray(indices, np.uint32)
        out = np.zeros((len(idx), self.record_size), np.uint8)
        done = self.lib.subgc_packed_gather(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(idx), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if done != len(idx):
            raise IndexError(f"record index {int(idx[done])} out of range "
                             f"(shard has {self.n_images} images)")
        return out
