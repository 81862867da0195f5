"""Native (C++) host-side components, loaded via ctypes.

The reference framework is entirely native (Fortran); the TPU build keeps
the *compute* path in JAX/XLA/Pallas and implements the host-side runtime
pieces natively in C++: currently the state-key hash table
(HashTable.f90 parity — see kfs_hash.cpp).  The shared library is built
on demand with g++ and cached next to the source; everything degrades
gracefully to the numpy fallback if no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "kfs_hash.cpp"
_LIB = _HERE / "_build" / "libkfs_hash.so"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _LIB.parent.mkdir(exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    str(_SRC), "-o", str(_LIB),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.kfs_hash_create.restype = ctypes.c_void_p
        lib.kfs_hash_create.argtypes = [ctypes.c_int64]
        lib.kfs_hash_destroy.argtypes = [ctypes.c_void_p]
        lib.kfs_hash_size.restype = ctypes.c_int64
        lib.kfs_hash_size.argtypes = [ctypes.c_void_p]
        p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.kfs_hash_insert_batch.argtypes = [
            ctypes.c_void_p, p_i64, p_i32, ctypes.c_int64, p_i32,
        ]
        lib.kfs_hash_lookup_batch.argtypes = [
            ctypes.c_void_p, p_i64, ctypes.c_int64, p_i32,
        ]
        lib.kfs_hash_delete_batch.argtypes = [
            ctypes.c_void_p, p_i64, ctypes.c_int64, p_i32,
        ]
        lib.kfs_hash_assign_fresh.restype = ctypes.c_int64
        lib.kfs_hash_assign_fresh.argtypes = [
            ctypes.c_void_p, p_i64, ctypes.c_int64, ctypes.c_int32, p_i32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


class NativeHashTable:
    """int64 key -> int32 row index open-addressing hash (C++ backed)."""

    def __init__(self, expected: int = 1024):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hash library unavailable")
        self._lib = lib
        self._h = lib.kfs_hash_create(int(expected))

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.kfs_hash_destroy(h)
            self._h = None

    def __len__(self) -> int:
        return int(self._lib.kfs_hash_size(self._h))

    def insert(self, keys, values) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        values = np.ascontiguousarray(values, dtype=np.int32)
        out = np.empty(keys.shape[0], dtype=np.int32)
        self._lib.kfs_hash_insert_batch(
            self._h, keys, values, keys.shape[0], out
        )
        return out

    def lookup(self, keys) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(keys.shape[0], dtype=np.int32)
        self._lib.kfs_hash_lookup_batch(self._h, keys, keys.shape[0], out)
        return out

    def delete(self, keys) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(keys.shape[0], dtype=np.int32)
        self._lib.kfs_hash_delete_batch(self._h, keys, keys.shape[0], out)
        return out.astype(bool)

    def assign_fresh(self, keys, next_row: int) -> tuple[np.ndarray, int]:
        """Row assignments for a candidate batch (see kfs_hash.cpp)."""
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(keys.shape[0], dtype=np.int32)
        fresh = self._lib.kfs_hash_assign_fresh(
            self._h, keys, keys.shape[0], int(next_row), out
        )
        return out, int(fresh)
