"""ctypes binding for the native feature loader (native/feature_loader.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes ``NativeFeatureLoader`` with the same subsample/pad semantics as
``data.features.subsample_or_pad`` plus threadpool prefetching — the
C++ replacement for the reference's DataLoader worker processes.
Falls back cleanly (``is_available``) when no compiler is present.
"""

from __future__ import annotations

import ctypes

import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "feature_loader.cpp"
_LIB = _SRC.with_suffix(".so")


def _build() -> Optional[Path]:
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True)
        return _LIB
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None


_handle = None


def _load_lib():
    global _handle
    if _handle is not None:
        return _handle
    lib_path = _build()
    if lib_path is None:
        return None
    lib = ctypes.CDLL(str(lib_path))
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.c_int, ctypes.c_long]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_load.restype = ctypes.c_long
    lib.fl_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                            ctypes.c_long]
    lib.fl_shape.restype = ctypes.c_long
    lib.fl_shape.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_long),
                             ctypes.POINTER(ctypes.c_long)]
    lib.fl_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.fl_cache_entries.restype = ctypes.c_long
    lib.fl_cache_entries.argtypes = [ctypes.c_void_p]
    _handle = lib
    return lib


def is_available() -> bool:
    return _load_lib() is not None


class NativeFeatureLoader:
    def __init__(self, num_threads: int = 4, cache_bytes: int = 1 << 30):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable (no g++?)")
        self._lib = lib
        self._h = lib.fl_create(num_threads, cache_bytes)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fl_destroy(self._h)
            self._h = None

    def shape(self, path: str):
        rows = ctypes.c_long()
        cols = ctypes.c_long()
        rc = self._lib.fl_shape(self._h, path.encode(), ctypes.byref(rows),
                                ctypes.byref(cols))
        if rc != 0:
            raise IOError(f"cannot read npy: {path}")
        return int(rows.value), int(cols.value)

    def load(self, path: str, max_rows: int, dim: int) -> np.ndarray:
        out = np.zeros((max_rows, dim), np.float32)
        rc = self._lib.fl_load(
            self._h, path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_rows, dim)
        if rc < 0:
            raise IOError(f"cannot load npy: {path} (dim mismatch?)")
        return out

    def prefetch(self, paths: Sequence[str] | str) -> None:
        if isinstance(paths, str):
            paths = [paths]
        for p in paths:
            self._lib.fl_prefetch(self._h, p.encode())

    def cache_entries(self) -> int:
        return int(self._lib.fl_cache_entries(self._h))
