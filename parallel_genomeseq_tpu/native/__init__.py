"""ctypes loader for the native IO library (builds on first import).

Compiles pgsio.cpp with g++ into a cached shared object and binds the C
symbols. Falls back gracefully: ``lib()`` returns None when no compiler is
available, and callers keep their pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "build" / "libpgsio.so"
_SRC = _HERE / "pgsio.cpp"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[Path]:
    """Compile the shared object if needed; returns its path or None."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    _SO.parent.mkdir(parents=True, exist_ok=True)
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-shared",
        "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = build()
    if so is None:
        return None
    L = ctypes.CDLL(str(so))
    L.pgs_read_fasta.restype = ctypes.c_int64
    L.pgs_read_fasta.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
    L.pgs_read_records.restype = ctypes.c_int64
    L.pgs_read_records.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    L.pgs_count_records.restype = ctypes.c_int64
    L.pgs_count_records.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    L.pgs_parse_gt_csv.restype = ctypes.c_int64
    L.pgs_parse_gt_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    ]
    L.pgs_write_align_output.restype = ctypes.c_int64
    L.pgs_write_align_output.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    _lib = L
    return _lib
