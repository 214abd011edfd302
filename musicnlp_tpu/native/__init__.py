"""Native (C++) components, compiled on demand with the system toolchain.

The WordPiece trainer/encoder replaces the reference's Rust `tokenizers`
dependency (reference musicnlp/trainer/wordpiece_tokenizer.py:312).  A pure
NumPy/Python fallback with identical semantics lives in `_py_wordpiece.py`
for environments without a compiler (and as a cross-check in tests).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'wordpiece.cpp')
_SO = os.path.join(_DIR, 'libwordpiece.so')

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', _SRC, '-o', _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load_wordpiece_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native WordPiece lib; None on failure."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    needs_build = (not os.path.exists(_SO)
                   or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    if needs_build and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib_failed = True
        return None
    c_i64, c_i32p = ctypes.c_longlong, ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_longlong)
    c_i8p = ctypes.POINTER(ctypes.c_int8)
    lib.wp_train.restype = c_i64
    lib.wp_train.argtypes = [c_i32p, c_i64p, c_i64p, c_i64, c_i64, c_i64,
                             c_i32p, c_i64, c_i64p, c_i8p, c_i64]
    lib.wp_encoder_new.restype = ctypes.c_void_p
    lib.wp_encoder_new.argtypes = [c_i32p, c_i64p, c_i8p, c_i64]
    lib.wp_encoder_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode.restype = c_i64
    lib.wp_encode.argtypes = [ctypes.c_void_p, c_i32p, c_i64, c_i32p, c_i64]
    _lib = lib
    return _lib
