"""Backend-ops style conformance sweep (tests/test-backend-ops.cpp:1109-1451
counterpart, VERDICT r1 item 10).

Parameterized grids over every Pallas kernel:
 - fused dequant matmul: every repackable wire format × an (M, K, N) shape
   grid covering the GEMV decode path, odd/unaligned rows, and MXU-tile
   prefill shapes, NMSE-bounded against dequant+f32 matmul;
 - int8-activation GEMV across formats × shapes (mmvq analog);
 - flash attention: the (T, S, GQA, D, swa, softcap, sinks, q8) cell product
   against the jnp reference.

The perf counterpart (GB/s + MFU per kernel, measured on real TPU) is
tools/ops_bench.py, which feeds the docs/ops.md dashboard.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType, quantize
from superllama_tpu.ops import jnp_ref as ops
from superllama_tpu.ops.flash_attention import flash_attention
from superllama_tpu.ops.qmatmul import qmatmul, qmatmul_ref
from superllama_tpu.ops.qtensor import REPACKABLE, repack

RTYPES = sorted(REPACKABLE, key=int)

# exact formats: fused kernel must match dequant+matmul to f32 rounding;
# int8-activation GEMV gets the Q8_1 accuracy budget
NMSE_EXACT = 1e-7
NMSE_GEMV = 5e-4

# (M, K, N): decode GEMV row, small odd batch, MXU prefill tile, wide-K
SHAPES = [(1, 512, 64), (5, 512, 128), (128, 512, 64), (16, 1024, 96)]

IQ_CODEBOOK = {GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
               GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
               GGMLType.IQ1_M}


def _qt(ttype, N, K, seed=0):
    rng = np.random.default_rng(seed + int(ttype))
    w = (rng.normal(0, 0.4, (N, K)) + 0.05 * np.cos(np.arange(K))).astype(
        np.float32)
    return repack(quantize(w, ttype), ttype, (N, K))


@pytest.mark.parametrize("shape", SHAPES, ids=lambda s: "x".join(map(str, s)))
@pytest.mark.parametrize("ttype", RTYPES, ids=lambda t: t.name)
def test_qmatmul_sweep(ttype, shape):
    M, K, N = shape
    qt = _qt(ttype, N, K)
    x = jnp.asarray(np.random.default_rng(M).normal(0, 1, (M, K)),
                    jnp.float32)
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert got.shape == (M, N)
    assert nmse < NMSE_EXACT, f"{ttype.name} {shape}: NMSE {nmse:g}"


@pytest.mark.parametrize("M", [1, 2, 8], ids=lambda m: f"m{m}")
@pytest.mark.parametrize("ttype", RTYPES, ids=lambda t: t.name)
def test_qmatmul_int8_gemv_sweep(ttype, M):
    K, N = 512, 128
    qt = _qt(ttype, N, K, seed=7)
    x = jnp.asarray(np.random.default_rng(M + 1).normal(0, 1, (M, K)),
                    jnp.float32)
    ref = qmatmul_ref(x, qt)
    got = qmatmul(x, qt, act_quant=True)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    assert nmse < NMSE_GEMV, f"{ttype.name} M={M}: NMSE {nmse:g}"


# ---------------------------- flash attention -------------------------------

FA_CELLS = []
for T, S in ((1, 256), (8, 256), (64, 64), (100, 131)):
    for G in (1, 4):
        FA_CELLS.append((T, S, G, 0, 0.0, False, False))
# feature cells on a decode and a prefill shape
for T, S in ((1, 256), (64, 128)):
    FA_CELLS += [
        (T, S, 4, 32, 0.0, False, False),   # sliding window
        (T, S, 4, 0, 30.0, False, False),   # softcap
        (T, S, 4, 0, 0.0, True, False),     # sinks
        (T, S, 4, 0, 0.0, False, True),     # Q8_0 KV
        (T, S, 4, 32, 0.0, True, True),     # combined
    ]


@pytest.mark.parametrize(
    "T,S,G,swa,softcap,sinks,q8", FA_CELLS,
    ids=lambda *_: None)
def test_flash_attention_sweep(T, S, G, swa, softcap, sinks, q8):
    B, Hkv, D = 2, 2, 64
    H = Hkv * G
    rng = np.random.default_rng(T * 1000 + S + G)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    n_past = max(S - T - 3, 0)              # a few empty slots at the tail
    q_pos = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None] + n_past, (B, T))
    kv_pos = jnp.where(jnp.arange(S)[None] < n_past + T,
                       jnp.arange(S)[None], -1).astype(jnp.int32)
    kv_pos = jnp.broadcast_to(kv_pos, (B, S))
    sink_v = (jnp.asarray(rng.normal(0, 1, (H,)), jnp.float32)
              if sinks else None)
    kwargs = {}
    if q8:
        # quantize K/V to Q8_0-style int8 rows + per-row scales
        ks = jnp.max(jnp.abs(k), axis=-1) / 127.0
        vs = jnp.max(jnp.abs(v), axis=-1) / 127.0
        k_q = jnp.round(k / ks[..., None]).astype(jnp.int8)
        v_q = jnp.round(v / vs[..., None]).astype(jnp.int8)
        kwargs = {"k_scale": ks, "v_scale": vs}
        k_in, v_in = k_q, v_q
        k_ref = k_q.astype(jnp.float32) * ks[..., None]
        v_ref = v_q.astype(jnp.float32) * vs[..., None]
    else:
        k_in, v_in, k_ref, v_ref = k, v, k, v
    got = flash_attention(q, k_in, v_in, q_pos, kv_pos, swa_window=swa,
                          logit_softcap=softcap, sinks=sink_v, **kwargs)
    from superllama_tpu.runtime.kv_cache import causal_mask

    mask = causal_mask(kv_pos, q_pos, swa if swa else 0)
    ref = ops.attention_ref(q, k_ref, v_ref, mask, logit_softcap=softcap,
                            sinks=sink_v)
    nmse = float(jnp.mean((got - ref) ** 2) / jnp.mean(ref ** 2))
    # q8 path streams V as int8 and dequantizes to bf16 in VMEM (1 B/elem of
    # HBM traffic) — the bf16 rounding bounds NMSE at ~1e-5 vs the f32 ref
    tol = 1e-5 if q8 else 1e-9
    assert nmse < tol, f"cell T{T} S{S} G{G} swa{swa} cap{softcap} " \
        f"sinks{sinks} q8{q8}: NMSE {nmse:g}"
