"""QTensor repack + fused qmatmul conformance.

The harness design mirrors tests/test-backend-ops.cpp (SURVEY.md §4): every
optimized kernel is compared against the jnp reference with NMSE tolerance;
repack→dequant must additionally bit-match the GGUF block decoders.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType, dequantize, quantize
from superllama_tpu.ops.qmatmul import qmatmul, qmatmul_ref
from superllama_tpu.ops.qtensor import REPACKABLE, dequant_qtensor, repack

import ggml_oracle

RTYPES = sorted(REPACKABLE, key=int)


def _weight(N=64, K=512, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 0.5, (N, K)) + 0.05 * np.cos(np.arange(K))).astype(np.float32)


IQ_CODEBOOK = {GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
               GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
               GGMLType.IQ1_M}


def _packed(w, ttype):
    """Reference-encoded GGUF bytes when the oracle is available (exercises
    real encoder output incl. search-based scales), else our encoder. The
    codebook i-quants have no imatrix-free encoder, so conformance for them
    uses random wire bytes (every byte string is a valid block; the f16 block
    scale is kept finite)."""
    if ttype in IQ_CODEBOOK:
        from superllama_tpu.gguf.constants import GGML_TYPE_TRAITS
        tr = GGML_TYPE_TRAITS[ttype]
        nb = w.size // tr.block_size
        rng = np.random.default_rng(int(ttype))
        raw = rng.integers(0, 256, nb * tr.type_size, dtype=np.uint8)
        raw.reshape(nb, -1)[:, 1] &= 0x3F
        if ttype == GGMLType.IQ1_M:
            raw.reshape(nb, -1)[:, 48:56] &= 0x3F
        return raw
    if ttype == GGMLType.Q8_K:
        # the reference's ggml_quantize_chunk asserts on Q8_K (activation-
        # side format there); our encoder is oracle-validated via dequant
        return quantize(w, ttype)
    if ggml_oracle.available():
        return ggml_oracle.quantize_ref(w, ttype)
    return quantize(w, ttype)


@pytest.mark.parametrize("ttype", RTYPES, ids=lambda t: t.name)
def test_repack_dequant_bitexact(ttype):
    """repack → dequant must equal the GGUF block decoder bit-for-bit."""
    w = _weight()
    raw = _packed(w, ttype)
    ref = dequantize(raw, ttype, w.shape)           # (N, K)
    qt = repack(raw, ttype, w.shape)
    got = np.asarray(dequant_qtensor(qt))           # (K, N)
    np.testing.assert_array_equal(got.T, ref, err_msg=f"{ttype.name}")


@pytest.mark.parametrize("ttype", RTYPES, ids=lambda t: t.name)
def test_qmatmul_matches_reference(ttype):
    """Pallas fused kernel (interpret on CPU) vs dequant+matmul, NMSE bound."""
    w = _weight()
    raw = _packed(w, ttype)
    qt = repack(raw, ttype, w.shape)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 512)).astype(np.float32))
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert nmse < 1e-7, f"{ttype.name}: NMSE {nmse:g}"


def test_qmatmul_odd_batch_and_3d():
    w = _weight(N=128, K=256)
    raw = _packed(w, GGMLType.Q4_K)
    qt = repack(raw, GGMLType.Q4_K, w.shape)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 3, 256)).astype(np.float32))  # M=6, pad→8
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt)
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ttype", [GGMLType.Q4_K, GGMLType.Q6_K,
                                   GGMLType.Q2_K])
def test_qmatmul_fused_m32_multi_ktile(ttype):
    """M=32 fused path with n_k>1 so superblock-scale planes (d/dmin) tile to
    <8 rows per k-step. Regression for the r2 TPU Mosaic failure: a dynamic
    sublane slice of the hoisted plane is not statically 8-aligned; the fix
    reshapes the plane to (n_k, rows, N) and indexes the leading dim from the
    grid (verified on hardware by _tpu_qmm_check.py)."""
    w = _weight(N=128, K=1024)          # bk=512 -> n_k=2, d-plane 2 rows/tile
    raw = _packed(w, ttype)
    qt = repack(raw, ttype, w.shape)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (32, 1024)).astype(np.float32))
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt, force_fused=True)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert nmse < 1e-7, f"{ttype.name}: NMSE {nmse:g}"


@pytest.mark.parametrize("ttype", [GGMLType.Q4_K, GGMLType.Q6_K])
def test_qmatmul_fused_partial_k_tile(ttype):
    """K=768 -> bk=512, partial last k-tile. On hardware the out-of-bounds
    block fill is undefined (garbage scale floats poisoned the accumulator
    with NaN, caught on v5e); the kernel select-zeros the overhang on both
    operands. Verified bit-clean on TPU by _tpu_qmm_check.py."""
    w = _weight(N=128, K=768)
    raw = _packed(w, ttype)
    qt = repack(raw, ttype, w.shape)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (32, 768)).astype(np.float32))
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt, force_fused=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert nmse < 1e-7, f"{ttype.name}: NMSE {nmse:g}"


def test_qmatmul_decode_shape():
    """M=1 (decode GEMV) path."""
    w = _weight(N=64, K=512)
    raw = _packed(w, GGMLType.Q6_K)
    qt = repack(raw, GGMLType.Q6_K, w.shape)
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (1, 512)).astype(np.float32))
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ttype,max_bpw", [
    (GGMLType.Q4_K, 4.8),   # wire 4.5; compact form: codes + u8 sc/mn + f32 d/dmin
    (GGMLType.Q5_K, 5.8),   # wire 5.5
    (GGMLType.Q6_K, 6.7),   # wire 6.5625
])
def test_memory_footprint(ttype, max_bpw):
    """Compact K-quant repack must stay ≈wire bits-per-weight in HBM
    (VERDICT r1: the 6-bpw Q4_K plane layout gave away ~30% of decode SOL)."""
    w = _weight(N=256, K=1024)
    raw = _packed(w, ttype)
    qt = repack(raw, ttype, w.shape)
    bits_per_weight = qt.nbytes * 8 / (256 * 1024)
    assert bits_per_weight < max_bpw, f"{ttype.name}: {bits_per_weight}"


@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q8_0,
                                   GGMLType.Q4_K, GGMLType.Q5_K,
                                   GGMLType.Q6_K])
def test_qmatmul_int8_gemv(ttype):
    """int8-activation GEMV path (mmvq analog): Q8 per-group activations →
    integer MXU dots; accuracy bound = llama.cpp's Q8_1 standard."""
    rng = np.random.default_rng(3)
    K, N = 512, 384
    w = rng.normal(0, 0.1, (N, K)).astype(np.float32)
    qt = repack(quantize(w, ttype), ttype, (N, K))
    x = jnp.asarray(rng.normal(0, 1.0, (2, K)).astype(np.float32))
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt, act_quant=True, interpret=None)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert nmse < 5e-4, f"{ttype.name}: NMSE {nmse:g}"
