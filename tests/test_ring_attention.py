"""Ring attention over the sp axis (SURVEY §2.7 sequence parallelism):
exactness vs full attention on the virtual 8-device mesh, causal and
bidirectional, contiguous and GQA-free shapes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.parallel.mesh import make_mesh
from superllama_tpu.parallel.ring_attention import ring_attention


def _full_attn(q, k, v, q_pos, kv_pos, causal, scale):
    logits = np.einsum("bthd,bshd->bhts", np.asarray(q, np.float64),
                       np.asarray(k, np.float64)) * scale
    if causal:
        mask = q_pos[:, None, :, None] >= kv_pos[:, None, None, :]
        logits = np.where(mask, logits, -np.inf)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhts,bshd->bthd", p, np.asarray(v, np.float64))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(causal):
    mesh = make_mesh(sp=4, tp=2)
    B, T, H, D = 2, 64, 4, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    scale = D ** -0.5
    got = np.asarray(ring_attention(q, k, v, jnp.asarray(pos),
                                    jnp.asarray(pos), mesh, causal=causal))
    want = _full_attn(q, k, v, pos, pos, causal, scale)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ring_sp8():
    mesh = make_mesh(sp=8, tp=1)
    B, T, H, D = 1, 128, 2, 32
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    got = np.asarray(ring_attention(q, k, v, jnp.asarray(pos),
                                    jnp.asarray(pos), mesh, causal=True))
    want = _full_attn(q, k, v, pos, pos, True, D ** -0.5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
