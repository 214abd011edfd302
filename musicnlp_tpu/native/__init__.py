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

_libs: dict = {}
_failed: set = set()


def _load(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if stale) + dlopen `<name>.cpp` -> `lib<name>.so`."""
    if name in _libs:
        return _libs[name]
    if name in _failed:
        return None
    src = os.path.join(_DIR, f'{name}.cpp')
    so = os.path.join(_DIR, f'lib{name}.so')
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', src, '-o', so],
                check=True, capture_output=True, timeout=300)
        except Exception:
            _failed.add(name)
            return None
    try:
        _libs[name] = ctypes.CDLL(so)
    except OSError:
        _failed.add(name)
        return None
    return _libs[name]


def load_wordpiece_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native WordPiece lib; None on failure."""
    lib = _load('wordpiece')
    if lib is None or hasattr(lib, '_configured'):
        return lib
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
    lib._configured = True
    return lib


def load_midi_extract_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native MIDI extraction kernel."""
    lib = _load('midi_extract')
    if lib is None or hasattr(lib, '_configured'):
        return lib
    c_i64 = ctypes.c_longlong
    lib.me_extract.restype = c_i64
    lib.me_extract.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), c_i64, c_i64, c_i64,
        ctypes.POINTER(ctypes.c_int32), c_i64]
    lib._configured = True
    return lib
