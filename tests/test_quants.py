"""Quant codec conformance tests.

Three layers of checking (strategy mirrors the reference's
test-quantize-fns.cpp round-trip/error-bound approach, SURVEY.md §4):
 1. our decode of reference-encoded bytes == reference decode, bit-exact
    (oracle or committed goldens);
 2. our encode decoded by the reference == our decode (layout validity);
 3. encode→decode round-trip error bounds per format.
"""

from pathlib import Path

import numpy as np
import pytest

from superllama_tpu.gguf.constants import GGML_TYPE_TRAITS, GGMLType
from superllama_tpu.gguf.quants import DEQUANTIZERS, QUANTIZERS, dequantize, quantize

import ggml_oracle

GOLDENS = Path(__file__).parent / "goldens" / "quants.npz"

DEQ_TYPES = [
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_0,
    GGMLType.MXFP4, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
    GGMLType.Q6_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.TQ1_0, GGMLType.TQ2_0,
]

IQ_ENC_TYPES = [
    GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
    GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M,
]
ENC_TYPES = [t for t in DEQ_TYPES if t in QUANTIZERS] + IQ_ENC_TYPES

# max RMS round-trip error per format (fraction of data std), informed by the
# reference's per-format total_error bounds in test-quantize-fns.cpp
RT_RMSE = {
    GGMLType.Q4_0: 0.11, GGMLType.Q4_1: 0.11, GGMLType.Q5_0: 0.06,
    GGMLType.Q5_1: 0.06, GGMLType.Q8_0: 0.008, GGMLType.MXFP4: 0.35,
    GGMLType.Q2_K: 0.40, GGMLType.Q3_K: 0.25, GGMLType.Q4_K: 0.10,
    GGMLType.Q5_K: 0.06, GGMLType.Q6_K: 0.03, GGMLType.IQ4_NL: 0.11,
    GGMLType.IQ4_XS: 0.11,
    # codebook i-quants (two-pass lattice fit; cf. the reference's greedy
    # neighbour search — quality within a few percent at each bpw tier)
    GGMLType.IQ2_XXS: 0.37, GGMLType.IQ2_XS: 0.33, GGMLType.IQ2_S: 0.28,
    GGMLType.IQ3_XXS: 0.24, GGMLType.IQ3_S: 0.20,
    GGMLType.IQ1_S: 0.52, GGMLType.IQ1_M: 0.47,
    # ternary formats quantize ternary-distributed nets (see _data_for)
    GGMLType.TQ1_0: 0.02, GGMLType.TQ2_0: 0.02,
    GGMLType.Q8_K: 0.01,
}


def _data(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth + gaussian, similar spirit to the reference's synthetic test data
    x = 0.1 * np.cos(np.arange(n) * 0.1) + rng.normal(0, 0.5, n)
    return x.astype(np.float32)


def _data_for(ttype: GGMLType, n: int, seed: int = 0) -> np.ndarray:
    if ttype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        # ternary formats store {-1,0,1}·d nets (bitnet); gaussian data would
        # round almost everything to 0 under d = amax (same as the reference)
        rng = np.random.default_rng(seed)
        return (rng.integers(-1, 2, n) * 0.73).astype(np.float32)
    return _data(n, seed)


@pytest.fixture(scope="module")
def goldens():
    if GOLDENS.exists():
        return dict(np.load(GOLDENS))
    if not ggml_oracle.available():
        pytest.skip("no oracle and no goldens")
    data = {}
    for t in DEQ_TYPES:
        x = _data(1024, seed=int(t))
        packed = ggml_oracle.quantize_ref(x.reshape(2, 512), t)
        ref = ggml_oracle.dequantize_ref(packed, t, 1024)
        data[f"{t.name}_packed"] = packed
        data[f"{t.name}_ref"] = ref
    GOLDENS.parent.mkdir(exist_ok=True)
    np.savez_compressed(GOLDENS, **data)
    return data


@pytest.mark.parametrize("ttype", DEQ_TYPES, ids=lambda t: t.name)
def test_decode_matches_reference(goldens, ttype):
    """Our decoder must bit-match the reference decoder on reference bytes."""
    packed = goldens[f"{ttype.name}_packed"]
    ref = goldens[f"{ttype.name}_ref"]
    mine = dequantize(packed, ttype)
    np.testing.assert_array_equal(mine, ref, err_msg=f"{ttype.name} decode mismatch")


IQ_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
            GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S, GGMLType.IQ1_M]
IQ_GOLDENS = Path(__file__).parent / "goldens" / "iq_decode.npz"


@pytest.fixture(scope="module")
def iq_goldens():
    """Codebook i-quants: random wire bytes decoded by the reference.

    Their encoders need an imatrix (codebook search), so conformance is
    decode-only: any byte string is a valid block (indices are masked to the
    grid size), and our decode must bit-match the reference's."""
    if IQ_GOLDENS.exists():
        return dict(np.load(IQ_GOLDENS))
    if not ggml_oracle.available():
        pytest.skip("no oracle and no goldens")
    data = {}
    for t in IQ_TYPES:
        rng = np.random.default_rng(int(t))
        nbytes = 8 * GGML_TYPE_TRAITS[t].type_size      # 8 superblocks
        packed = rng.integers(0, 256, nbytes, dtype=np.uint8)
        # keep the block scale finite: clear the f16 exponent-top bits so a
        # random d can't be inf/NaN (NaN payloads aren't comparable)
        packed.reshape(8, -1)[:, 1] &= 0x3F
        if t == GGMLType.IQ1_M:                         # scale packed in
            packed.reshape(8, -1)[:, 48:56] &= 0x3F     # nibble tops
        data[f"{t.name}_packed"] = packed
        data[f"{t.name}_ref"] = ggml_oracle.dequantize_ref(packed, t, 8 * 256)
    IQ_GOLDENS.parent.mkdir(exist_ok=True)
    np.savez_compressed(IQ_GOLDENS, **data)
    return data


@pytest.mark.parametrize("ttype", IQ_TYPES, ids=lambda t: t.name)
def test_iq_decode_matches_reference(iq_goldens, ttype):
    packed = iq_goldens[f"{ttype.name}_packed"]
    ref = iq_goldens[f"{ttype.name}_ref"]
    mine = dequantize(packed, ttype)
    np.testing.assert_array_equal(mine, ref, err_msg=f"{ttype.name} decode mismatch")


@pytest.mark.parametrize("ttype", ENC_TYPES, ids=lambda t: t.name)
def test_encode_layout_valid(ttype):
    """Bytes we encode must decode identically under the reference decoder."""
    if not ggml_oracle.available():
        pytest.skip("oracle unavailable")
    if ttype == GGMLType.Q8_K:
        pytest.skip("Q8_K is ggml's activation format, not a file type")
    x = _data_for(ttype, 2048, seed=int(ttype) + 100).reshape(4, 512)
    packed = quantize(x, ttype)
    ref = ggml_oracle.dequantize_ref(packed, ttype, x.size)
    mine = dequantize(packed, ttype)
    np.testing.assert_array_equal(mine, ref, err_msg=f"{ttype.name} layout mismatch")


@pytest.mark.parametrize("ttype", ENC_TYPES, ids=lambda t: t.name)
def test_roundtrip_error_bound(ttype):
    x = _data_for(ttype, 4096, seed=int(ttype) + 7)
    packed = quantize(x.reshape(8, 512), ttype)
    y = dequantize(packed, ttype)
    rmse = float(np.sqrt(np.mean((x - y) ** 2)) / np.std(x))
    assert rmse < RT_RMSE[ttype], f"{ttype.name}: rmse {rmse:.4f} > {RT_RMSE[ttype]}"


@pytest.mark.parametrize("ttype", [GGMLType.F16, GGMLType.BF16, GGMLType.F32], ids=lambda t: t.name)
def test_fp_roundtrip(ttype):
    x = _data(512)
    y = dequantize(quantize(x, ttype), ttype)
    tol = {GGMLType.F32: 0, GGMLType.F16: 1e-3, GGMLType.BF16: 1e-2}[ttype]
    np.testing.assert_allclose(y, x, rtol=tol, atol=tol)


def test_block_sizes_consistent():
    for t, tr in GGML_TYPE_TRAITS.items():
        assert tr.type_size > 0 and tr.block_size > 0
    # spot-check known wire sizes
    assert GGML_TYPE_TRAITS[GGMLType.Q4_K].type_size == 144
    assert GGML_TYPE_TRAITS[GGMLType.Q6_K].type_size == 210
    assert GGML_TYPE_TRAITS[GGMLType.Q4_0].type_size == 18
    assert GGML_TYPE_TRAITS[GGMLType.MXFP4].type_size == 17


# ---------------------------------------------------------------------------
# encoder-quality gates: the weighted K-quant searches must match the
# reference encoder's weighted MSE (ggml-quants.c make_qkx2/qkx3/qx/qp wired
# per-type at src/llama-quant.cpp:431-457) — VERDICT r4 item 4
# ---------------------------------------------------------------------------

K_SEARCH_TYPES = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                  GGMLType.Q5_K, GGMLType.Q6_K]


def _quality_data(seed=11, rows=48, n=1024):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1.0, (rows, n)).astype(np.float32)
    x[3, 5] = 37.0                       # outlier channel
    x[7] *= 0.01                         # tiny-magnitude row
    qw = (0.05 + rng.random(n).astype(np.float32) ** 2)
    return x, qw


@pytest.mark.parametrize("t", K_SEARCH_TYPES, ids=[t.name for t in K_SEARCH_TYPES])
def test_kquant_search_quality_vs_oracle(t):
    """Plain encoder MSE ≤ 1.02× the oracle encoder's on the same data."""
    if not ggml_oracle.available():
        pytest.skip("oracle unavailable")
    x, _ = _quality_data()
    mine = dequantize(quantize(x, t), t).reshape(x.shape)
    ref = ggml_oracle.dequantize_ref(
        ggml_oracle.quantize_ref(x, t), t, x.size).reshape(x.shape)
    mse_mine = float(((mine - x) ** 2).mean())
    mse_ref = float(((ref - x) ** 2).mean())
    assert mse_mine <= mse_ref * 1.02 + 1e-12, (mse_mine, mse_ref)


@pytest.mark.parametrize("t", K_SEARCH_TYPES, ids=[t.name for t in K_SEARCH_TYPES])
def test_kquant_imatrix_quality_vs_oracle(t):
    """Imatrix-weighted encoder: weighted MSE ≤ 1.02× the oracle's imatrix
    impl, and strictly better than the plain encoder under those weights."""
    if not ggml_oracle.available():
        pytest.skip("oracle unavailable")
    x, qw = _quality_data()
    mine = dequantize(quantize(x, t, qw=qw), t).reshape(x.shape)
    ref = ggml_oracle.dequantize_ref(
        ggml_oracle.quantize_ref(x, t, qw), t, x.size).reshape(x.shape)
    plain = dequantize(quantize(x, t), t).reshape(x.shape)

    def wmse(y):
        return float((((y - x) ** 2) * qw.reshape(1, -1)).mean())

    assert wmse(mine) <= wmse(ref) * 1.02 + 1e-12, (wmse(mine), wmse(ref))
    assert wmse(mine) < wmse(plain), (wmse(mine), wmse(plain))


@pytest.mark.parametrize("t", K_SEARCH_TYPES, ids=[t.name for t in K_SEARCH_TYPES])
def test_kquant_search_beats_minmax(t):
    """The searched encoders strictly improve on the one-shot min/max rounds
    they replaced (the point of the upgrade)."""
    from superllama_tpu.gguf.quants import (quant_q2_k, quant_q3_k,
                                            quant_q4_k, quant_q5_k,
                                            quant_q6_k)
    minmax = {GGMLType.Q2_K: quant_q2_k, GGMLType.Q3_K: quant_q3_k,
              GGMLType.Q4_K: quant_q4_k, GGMLType.Q5_K: quant_q5_k,
              GGMLType.Q6_K: quant_q6_k}
    x, _ = _quality_data(seed=3)
    searched = dequantize(quantize(x, t), t).reshape(x.shape)
    old = dequantize(np.frombuffer(np.asarray(minmax[t](x)).tobytes(),
                                   np.uint8), t).reshape(x.shape)
    assert float(((searched - x) ** 2).mean()) < float(((old - x) ** 2).mean())
