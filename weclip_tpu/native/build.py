"""Build + load the native permutohedral/dense-CRF library (ctypes).

Compiled on first use into the package directory; no pybind11 / setuptools
extension machinery required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "permutohedral.cc")
_LIB = os.path.join(_HERE, "libpermutohedral.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    with _lock:
        if force or not os.path.exists(_LIB) or (
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", "-o", _LIB, _SRC]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _LIB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        path = build()
        lib = ctypes.CDLL(path)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.permutohedral_filter.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, f32p]
        lib.permutohedral_filter.restype = None
        lib.dense_crf_inference.argtypes = [
            f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float]
        lib.dense_crf_inference.restype = None
        _lib = lib
    return _lib
