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
                # -ffp-contract=off: the weighted K-quant searches must stay
                # bit-identical to the numpy reference (FMA contraction would
                # change accumulation results and flip search decisions)
                ["g++", "-O3", "-ffp-contract=off", "-std=c++17", "-shared",
                 "-fPIC", "-pthread", str(_SRC), "-o", str(tmp)],
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
        lib.slq_repack.restype = ctypes.c_int
        lib.slq_repack.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.slq_set_iq_grids.restype = ctypes.c_int
        lib.slq_set_iq_grids.argtypes = [ctypes.c_void_p] * 6
        _inject_iq_grids(lib)
        _LIB = lib
    except (OSError, subprocess.SubprocessError):
        _LIB = None
    return _LIB


def _inject_iq_grids(lib) -> None:
    """Hand the i-quant lattice codebooks (gguf/iq_grids.npz) to the C++
    decoders; failure just leaves the grid formats unsupported natively."""
    try:
        with np.load(Path(__file__).parent.parent / "gguf"
                     / "iq_grids.npz") as z:
            bufs = [np.ascontiguousarray(z[k].view(np.uint8))
                    for k in ("iq2xxs_grid", "iq2xs_grid", "iq2s_grid",
                              "iq3xxs_grid", "iq3s_grid", "iq1s_grid")]
        lib.slq_set_iq_grids(*[b.ctypes.data for b in bufs])
    except (OSError, KeyError):
        pass


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


# ---------------------------------------------------------------- tokenizer

_TOK_SRC = Path(__file__).with_name("tokenizer.cpp")
_TOK_LIB = None
_TOK_TRIED = False


def _load_tok() -> ctypes.CDLL | None:
    global _TOK_LIB, _TOK_TRIED
    if _TOK_LIB is not None or _TOK_TRIED:
        return _TOK_LIB
    _TOK_TRIED = True
    if os.environ.get("SLT_NO_NATIVE"):
        return None
    try:
        src = _TOK_SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _build_dir() / f"libsltok-{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 str(_TOK_SRC), "-o", str(tmp)],
                check=True, capture_output=True, timeout=240)
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.slt_spm_new.restype = ctypes.c_void_p
        lib.slt_spm_new.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32]
        lib.slt_spm_free.argtypes = [ctypes.c_void_p]
        lib.slt_spm_encode.restype = ctypes.c_int32
        lib.slt_spm_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32]
        lib.slt_bpe_new.restype = ctypes.c_void_p
        lib.slt_bpe_new.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int32]
        lib.slt_bpe_free.argtypes = [ctypes.c_void_p]
        lib.slt_bpe_encode_word.restype = ctypes.c_int32
        lib.slt_bpe_encode_word.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int32]
        _TOK_LIB = lib
    except (OSError, subprocess.SubprocessError):
        _TOK_LIB = None
    return _TOK_LIB


def _blob(strings: list[str]) -> tuple[bytes, np.ndarray]:
    enc = [s.encode("utf-8") for s in strings]
    off = np.zeros(len(enc) + 1, np.int64)
    np.cumsum([len(e) for e in enc], out=off[1:])
    return b"".join(enc), off


class NativeSPM:
    """Native SPM tokenize (bit-identical to Tokenizer._spm_tokenize)."""

    def __init__(self, vocab):
        lib = _load_tok()
        if lib is None:
            raise OSError("native tokenizer unavailable")
        self._lib = lib
        blob, off = _blob(vocab.tokens)
        scores = np.asarray(vocab.scores, np.float32)
        normal = np.asarray([1 if vocab.is_normal(i) else 0
                             for i in range(vocab.n_tokens)], np.uint8)
        bytes_map = np.asarray([vocab.byte_to_token(b) for b in range(256)],
                               np.int32)
        self._h = lib.slt_spm_new(
            blob, off.ctypes.data, scores.ctypes.data, normal.ctypes.data,
            vocab.n_tokens, bytes_map.ctypes.data,
            vocab.unk_id if vocab.unk_id >= 0 else 0)

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out = np.empty(max(len(data) * 2, 16), np.int32)
        n = self._lib.slt_spm_encode(self._h, data, len(data),
                                     out.ctypes.data, out.size)
        if n > out.size:  # retry with exact size (pathological)
            out = np.empty(n, np.int32)
            n = self._lib.slt_spm_encode(self._h, data, len(data),
                                         out.ctypes.data, out.size)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.slt_spm_free(self._h)
        except Exception:
            pass


class NativeBPE:
    """Native BPE merge+lookup for one byte-encoded word."""

    def __init__(self, vocab):
        lib = _load_tok()
        if lib is None:
            raise OSError("native tokenizer unavailable")
        self._lib = lib
        tblob, toff = _blob(vocab.tokens)
        mblob, moff = _blob(vocab.merges)
        self._h = lib.slt_bpe_new(tblob, toff.ctypes.data, vocab.n_tokens,
                                  mblob, moff.ctypes.data, len(vocab.merges))

    def encode_word(self, enc: str) -> list[int]:
        data = enc.encode("utf-8")
        out = np.empty(max(len(data) * 2, 16), np.int32)
        n = self._lib.slt_bpe_encode_word(self._h, data, len(data),
                                          out.ctypes.data, out.size)
        if n > out.size:
            out = np.empty(n, np.int32)
            n = self._lib.slt_bpe_encode_word(self._h, data, len(data),
                                              out.ctypes.data, out.size)
        return out[:n].tolist()

    def __del__(self):
        try:
            self._lib.slt_bpe_free(self._h)
        except Exception:
            pass


def native_spm(vocab) -> "NativeSPM | None":
    try:
        return NativeSPM(vocab)
    except OSError:
        return None


def native_bpe(vocab) -> "NativeBPE | None":
    try:
        return NativeBPE(vocab)
    except OSError:
        return None


# (ttype, gs, offset, nibble) for the natively repackable formats
_REPACK_META = {2: (32, 8, True), 8: (32, 0, False), 12: (32, 0, True),
                13: (32, 0, False), 14: (16, 0, False)}


def repack(raw: np.ndarray, ttype: int, N: int, K: int):
    """Native load-path repack → (codes, scales, adds, gs, offset, nibble)
    in the exact ops/qtensor.py layouts, or None when unsupported."""
    lib = _load()
    meta = _REPACK_META.get(int(ttype))
    if lib is None or meta is None or K % 256 and int(ttype) not in (2, 8):
        return None
    gs, offset, nibble = meta
    raw = np.ascontiguousarray(raw.reshape(-1), dtype=np.uint8)
    codes = np.empty((K // 2 if nibble else K, N), np.uint8)
    scales = np.empty((K // gs, N), np.float32)
    has_adds = int(ttype) in (12, 13)
    adds = np.empty((K // gs, N), np.float32) if has_adds else None
    rc = lib.slq_repack(int(ttype), raw.ctypes.data, N, K, codes.ctypes.data,
                        scales.ctypes.data,
                        adds.ctypes.data if has_adds else None)
    if rc != 0:
        return None
    if not nibble:
        codes = codes.view(np.int8)
    return codes, scales, adds, gs, offset, nibble
