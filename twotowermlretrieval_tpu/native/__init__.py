"""Native (C++) host data-plane components, built on demand.

The reference has zero native code (SURVEY.md §2); its host pipeline
re-tokenizes every example per epoch in Python (ref: backend/main.py:42-48).
Here the batch tokenizer — the host hot spot feeding the TPU — runs as a
C++ shared library (hash-map vocab + ASCII scanner, OpenMP over rows),
compiled once with g++ into the user cache and loaded via ctypes. Unicode
rows and environments without a toolchain fall back to the pure-Python
path with identical results.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).resolve().parent / "tokenizer.cc"
_CACHE_DIR = Path(os.environ.get("TTR_NATIVE_CACHE", Path.home() / ".cache" / "twotowermlretrieval_tpu"))

_lib = None
_lib_error: Optional[str] = None


def _build() -> Path:
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so_path = _CACHE_DIR / f"tokenizer_{tag}.so"
    if so_path.exists():
        return so_path
    # per-process temp name: two processes building concurrently must not
    # interleave writes into one .tmp and publish a corrupt .so forever
    tmp_path = so_path.with_suffix(f".tmp.{os.getpid()}")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", str(_SRC), "-o", str(tmp_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp_path, so_path)  # atomic publish
    finally:
        tmp_path.unlink(missing_ok=True)
    return so_path


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (with the reason recorded)."""
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        lib = ctypes.CDLL(str(_build()))
        lib.vocab_create.restype = ctypes.c_void_p
        lib.vocab_create.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ]
        lib.vocab_free.argtypes = [ctypes.c_void_p]
        lib.vocab_size.restype = ctypes.c_int64
        lib.vocab_size.argtypes = [ctypes.c_void_p]
        lib.encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
        _lib_error = f"{type(e).__name__}: {e}"
        print(f"native tokenizer unavailable ({_lib_error}); using Python path",
              file=sys.stderr)
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def native_error() -> Optional[str]:
    get_lib()
    return _lib_error
