"""Native (C++) quant codec bindings.

Compiles quants.cpp on first use (g++, cached by source hash) and exposes
ctypes wrappers. The numpy codecs in gguf/quants.py remain the semantic
reference; this library must be bit-identical (tests enforce it) and is the
default fast path for model loading and the quantize tool.

Set SLT_NO_NATIVE=1 to force the numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("quants.cpp")
_LIB = None
_TRIED = False


def _build_dir() -> Path:
    d = Path(os.environ.get("SLT_NATIVE_CACHE",
                            os.path.join(os.path.expanduser("~"), ".cache",
                                         "superllama_tpu")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SLT_NO_NATIVE"):
        return None
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _build_dir() / f"libslquants-{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 str(_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=240)
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.slq_supported.restype = ctypes.c_int
        lib.slq_supported.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.slq_dequantize.restype = ctypes.c_int
        lib.slq_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.slq_quantize.restype = ctypes.c_int
        lib.slq_quantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _LIB = lib
    except (OSError, subprocess.SubprocessError):
        _LIB = None
    return _LIB


def available(ttype: int, for_encode: bool = False) -> bool:
    lib = _load()
    return bool(lib and lib.slq_supported(int(ttype), int(for_encode)))


def dequantize(raw: np.ndarray, ttype: int, block_size: int,
               type_size: int) -> np.ndarray | None:
    """Native dequant; returns None when unsupported/unavailable."""
    lib = _load()
    if lib is None or not lib.slq_supported(int(ttype), 0):
        return None
    raw = np.ascontiguousarray(raw.reshape(-1), dtype=np.uint8)
    nb = raw.size // type_size
    out = np.empty(nb * block_size, np.float32)
    rc = lib.slq_dequantize(int(ttype), raw.ctypes.data, raw.size,
                            out.ctypes.data)
    return out if rc == 0 else None


def quantize(x: np.ndarray, ttype: int, block_size: int,
             type_size: int) -> np.ndarray | None:
    """Native encode; returns None when unsupported/unavailable."""
    lib = _load()
    if lib is None or not lib.slq_supported(int(ttype), 1):
        return None
    x = np.ascontiguousarray(x.reshape(-1), dtype=np.float32)
    nb = x.size // block_size
    out = np.empty(nb * type_size, np.uint8)
    rc = lib.slq_quantize(int(ttype), x.ctypes.data, x.size, out.ctypes.data)
    return out if rc == 0 else None
