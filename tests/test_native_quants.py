"""Native C++ codec vs numpy codec bit-equality (the native library is the
fast path; the numpy implementations are the semantic reference validated
against the upstream oracle in test_quants.py)."""

import os

import numpy as np
import pytest

from superllama_tpu import native
from superllama_tpu.gguf.constants import GGML_TYPE_TRAITS, GGMLType
from superllama_tpu.gguf.quants import DEQUANTIZERS, QUANTIZERS

DEQ_TYPES = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
             GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
             GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_K, GGMLType.IQ4_NL,
             GGMLType.IQ4_XS, GGMLType.MXFP4, GGMLType.TQ1_0, GGMLType.TQ2_0,
             GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
             GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M]
# i-quant encoders are codebook scale-searches (offline quantize path) — numpy
ENC_TYPES = [t for t in DEQ_TYPES
             if t not in (GGMLType.IQ4_XS, GGMLType.IQ2_XXS, GGMLType.IQ2_XS,
                          GGMLType.IQ2_S, GGMLType.IQ3_XXS, GGMLType.IQ3_S,
                          GGMLType.IQ1_S, GGMLType.IQ1_M)]

pytestmark = pytest.mark.skipif(
    not native.available(int(GGMLType.Q8_0)),
    reason="native toolchain unavailable")


def _data(t: GGMLType, n_blocks=64, seed=0):
    tr = GGML_TYPE_TRAITS[t]
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1.5, n_blocks * tr.block_size).astype(np.float32)
    # exercise edge cases: zero block, constant block, huge outlier
    x[: tr.block_size] = 0.0
    x[tr.block_size: 2 * tr.block_size] = 0.25
    x[2 * tr.block_size] = 1e4
    return x, tr


@pytest.mark.parametrize("t", ENC_TYPES, ids=[t.name for t in ENC_TYPES])
def test_native_encode_bitexact(t):
    x, tr = _data(t)
    ref = QUANTIZERS[t](x)
    got = native.quantize(x, int(t), tr.block_size, tr.type_size)
    assert got is not None
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("t", DEQ_TYPES, ids=[t.name for t in DEQ_TYPES])
def test_native_decode_bitexact(t):
    tr = GGML_TYPE_TRAITS[t]
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 64 * tr.type_size).astype(np.uint8)
    ref = DEQUANTIZERS[t](raw)
    got = native.dequantize(raw, int(t), tr.block_size, tr.type_size)
    assert got is not None
    # NaN-safe exact comparison (random f16 bytes may decode to NaN)
    np.testing.assert_array_equal(got.view(np.uint32), ref.view(np.uint32))


def test_native_roundtrip_through_public_api():
    """The public quantize/dequantize route through native and still match
    a pure-numpy run (SLT_NO_NATIVE)."""
    import importlib

    from superllama_tpu.gguf import quants as q

    x = np.random.default_rng(5).normal(0, 1, (8, 256)).astype(np.float32)
    packed = q.quantize(x, GGMLType.Q4_K)
    deq = q.dequantize(packed, GGMLType.Q4_K)
    ref_packed = q.QUANTIZERS[GGMLType.Q4_K](x)
    ref_deq = q.dequant_q4_k(np.frombuffer(np.asarray(ref_packed).tobytes(), np.uint8))
    np.testing.assert_array_equal(packed, ref_packed)
    np.testing.assert_array_equal(deq, ref_deq)


def test_native_speedup_large():
    """Sanity perf check: native decode of a big tensor is no slower than
    numpy (usually multiples faster)."""
    import time

    t = GGMLType.Q4_K
    tr = GGML_TYPE_TRAITS[t]
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, 20000 * tr.type_size).astype(np.uint8)
    t0 = time.perf_counter()
    a = native.dequantize(raw, int(t), tr.block_size, tr.type_size)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = DEQUANTIZERS[t](raw)
    t_numpy = time.perf_counter() - t0
    np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)


@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q8_0,
                                   GGMLType.Q4_K, GGMLType.Q5_K,
                                   GGMLType.Q6_K], ids=lambda t: t.name)
def test_native_repack_bit_identical(ttype):
    """slq_repack (C++ load path) must produce byte-identical planes to the
    numpy _extract+pack path."""
    from superllama_tpu import native
    from superllama_tpu.gguf.quants import quantize
    from superllama_tpu.ops.qtensor import _extract, _pack_nib4

    if native._load() is None:
        pytest.skip("no toolchain")
    rng = np.random.default_rng(int(ttype) + 5)
    N, K = 96, 512
    w = rng.normal(0, 0.3, (N, K)).astype(np.float32)
    raw = np.frombuffer(quantize(w, ttype).tobytes(), np.uint8)
    got = native.repack(raw, int(ttype), N, K)
    assert got is not None
    codes_n, scales_n, adds_n, gs, offset, nibble = got
    codes, scales, adds, gs2, off2, nib2 = _extract(raw, ttype, N, K)
    assert (gs, offset, nibble) == (gs2, off2, nib2)
    codes = codes.reshape(N, K).T
    codes = _pack_nib4(codes.astype(np.uint8)) if nibble else codes.astype(np.int8)
    np.testing.assert_array_equal(codes_n, codes)
    np.testing.assert_array_equal(scales_n,
                                  np.ascontiguousarray(scales.reshape(N, K // gs).T, np.float32))
    if adds is not None:
        np.testing.assert_array_equal(adds_n,
                                      np.ascontiguousarray(adds.reshape(N, K // gs).T, np.float32))
    else:
        assert adds_n is None
