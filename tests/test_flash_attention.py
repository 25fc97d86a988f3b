"""Flash-attention kernel conformance vs the jnp reference (attention_ref),
covering prefill/decode shapes, GQA, SWA, softcap, empty slots, padding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.ops.flash_attention import flash_attention
from superllama_tpu.ops import jnp_ref as ops
from superllama_tpu.ops.jnp_ref import attention_ref
from superllama_tpu.runtime.kv_cache import causal_mask


def _mk(B, T, S, H, Hkv, D, seed=0, n_valid=None, t0=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    n_valid = n_valid if n_valid is not None else S
    t0 = t0 if t0 is not None else n_valid - T
    kv_pos = np.full((B, S), -1, np.int32)
    kv_pos[:, :n_valid] = np.arange(n_valid)
    q_pos = np.tile(np.arange(t0, t0 + T, dtype=np.int32), (B, 1))
    return q, k, v, jnp.asarray(q_pos), jnp.asarray(kv_pos)


def _check(q, k, v, q_pos, kv_pos, swa=0, softcap=0.0, atol=2e-5):
    mask = causal_mask(kv_pos, q_pos, swa)
    ref = attention_ref(q, k, v, mask, logit_softcap=softcap)
    got = flash_attention(q, k, v, q_pos, kv_pos, swa_window=swa,
                          logit_softcap=softcap)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=atol)


def test_prefill_causal():
    _check(*_mk(2, 64, 64, 8, 8, 64))


def test_prefill_gqa():
    _check(*_mk(2, 32, 32, 8, 2, 64))


def test_decode_single_token():
    _check(*_mk(2, 1, 128, 8, 2, 64, n_valid=100, t0=99))


def test_partial_cache_occupancy():
    _check(*_mk(1, 8, 256, 4, 4, 64, n_valid=40, t0=32))


def test_sliding_window():
    _check(*_mk(1, 16, 128, 4, 2, 64, n_valid=128, t0=112), swa=32)


def test_logit_softcap():
    _check(*_mk(1, 16, 64, 4, 4, 64), softcap=30.0)


def test_head_dim_128():
    _check(*_mk(1, 16, 64, 4, 2, 128))


def test_nonaligned_t_s():
    _check(*_mk(1, 24, 72, 4, 2, 64, n_valid=72, t0=48))


def test_padded_query_rows():
    q, k, v, q_pos, kv_pos = _mk(2, 8, 64, 4, 2, 64)
    q_pos = q_pos.at[1, 5:].set(-1)  # pad tail of row 1
    mask = causal_mask(kv_pos, q_pos)
    ref = attention_ref(q, k, v, mask)
    got = flash_attention(q, k, v, q_pos, kv_pos)
    # only compare non-padded outputs
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(ref)[0], rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got)[1, :5], np.asarray(ref)[1, :5], rtol=1e-4, atol=2e-5)


def test_attention_sinks():
    """Sink logits join the online-softmax normalization (gpt-oss)."""
    B, T, S, H, Hkv, D = 2, 16, 64, 8, 4, 32
    q, k, v, q_pos, kv_pos = _mk(B, T, S, H, Hkv, D, seed=4)
    sinks = jnp.asarray(np.random.default_rng(5).normal(0, 2, (H,)).astype(np.float32))
    mask = causal_mask(kv_pos, q_pos)
    ref = attention_ref(q, k, v, mask, sinks=sinks)
    got = flash_attention(q, k, v, q_pos, kv_pos, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)
    # and the sink must actually matter
    base = flash_attention(q, k, v, q_pos, kv_pos)
    assert np.abs(np.asarray(got) - np.asarray(base)).max() > 1e-3


def test_attention_sinks_with_swa():
    B, T, S, H, Hkv, D = 1, 8, 32, 4, 2, 16
    q, k, v, q_pos, kv_pos = _mk(B, T, S, H, Hkv, D, seed=6)
    sinks = jnp.asarray(np.linspace(-1, 3, H).astype(np.float32))
    mask = causal_mask(kv_pos, q_pos, 4)
    ref = attention_ref(q, k, v, mask, sinks=sinks)
    got = flash_attention(q, k, v, q_pos, kv_pos, swa_window=4, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-5)


@pytest.mark.parametrize("gqa,softcap,sinks", [(1, 0.0, False), (4, 0.0, False),
                                               (2, 30.0, False), (4, 0.0, True)])
def test_attention_gqa_matches_ref(gqa, softcap, sinks):
    """Grouped-query XLA attention (no K/V repeat) vs the reference."""
    rng = np.random.default_rng(11)
    B, T, Hkv, S, D = 2, 5, 2, 24, 16
    H = Hkv * gqa
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    cache_pos = jnp.where(jnp.arange(S)[None] < 20, jnp.arange(S)[None], -1)
    cache_pos = jnp.broadcast_to(cache_pos, (B, S)).astype(jnp.int32)
    q_pos = jnp.broadcast_to(15 + jnp.arange(T)[None], (B, T)).astype(jnp.int32)
    mask = causal_mask(cache_pos, q_pos)
    sk = jnp.asarray(rng.normal(0, 1, (H,)), jnp.float32) if sinks else None
    ref = ops.attention_ref(q, k, v, mask, logit_softcap=softcap, sinks=sk)
    got = ops.attention_gqa(q, k, v, mask, logit_softcap=softcap, sinks=sk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_q8_kv():
    """Q8_0 KV inside the kernel (int8 codes + per-row scales dequantized in
    VMEM) vs the reference on dequantized arrays."""
    from superllama_tpu.runtime.kv_cache import q8_quantize_rows

    rng = np.random.default_rng(17)
    B, T, Hkv, G, S, D = 1, 16, 2, 2, 64, 32
    H = Hkv * G
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    kf = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)), jnp.float32)
    kc, ks = q8_quantize_rows(kf)
    vc, vs = q8_quantize_rows(vf)
    kd = kc.astype(jnp.float32) * ks[..., None]
    vd = vc.astype(jnp.float32) * vs[..., None]
    kv_pos = jnp.where(jnp.arange(S)[None] < 40, jnp.arange(S)[None], -1)
    kv_pos = jnp.broadcast_to(kv_pos, (B, S)).astype(jnp.int32)
    q_pos = jnp.broadcast_to(24 + jnp.arange(T)[None], (B, T)).astype(jnp.int32)
    mask = causal_mask(kv_pos, q_pos)
    ref = attention_ref(q, kd, vd, mask)
    got = flash_attention(q, kc, vc, q_pos, kv_pos,
                          k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
