"""Layer-streaming executor (fork layer-sched + prefetch + stream-pipeline
capabilities, SURVEY.md §2.2): output must be identical to the resident
forward; residency obeys the limit, LRU eviction, pinning, and pressure
degradation."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.kv_cache import kv_cache_init
from superllama_tpu.runtime.layer_stream import LayerStreamExecutor


class _Model:
    def __init__(self, hp, params):
        self.hparams = hp
        self.params = params


@pytest.fixture(scope="module")
def model():
    hp = tiny_test_hparams(n_layer=4)
    pn = synthetic_params(hp, dtype=np.float32, seed=5)
    params = {
        "token_embd": jnp.asarray(pn["token_embd"]),
        "output": jnp.asarray(pn["output"]),
        "output_norm": jnp.asarray(pn["output_norm"]),
        "layers": [{k: jnp.asarray(v) for k, v in l.items()}
                   for l in pn["layers"]],
    }
    return _Model(hp, params)


def _run(fwd, hp, tokens):
    cache = kv_cache_init(hp.n_layer, 1, 32, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    pos = jnp.arange(tokens.shape[1], dtype=jnp.int32)[None]
    logits, cache = fwd(tokens, pos, cache)
    return np.asarray(logits, np.float32), cache


def test_streamed_forward_identical(model):
    hp = model.hparams
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        0, hp.n_vocab, (1, 8)), jnp.int32)
    ref, ref_cache = _run(
        lambda t, p, c: llama_forward(model.params, hp, t, p, c), hp, tokens)
    ex = LayerStreamExecutor(model, n_resident=2, prefetch_depth=1)
    got, got_cache = _run(ex.forward, hp, tokens)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_cache.k), np.asarray(ref_cache.k),
                               rtol=2e-5, atol=2e-5)
    assert np.array_equal(np.asarray(got_cache.pos), np.asarray(ref_cache.pos))
    # 4 layers through a 2-layer residency window ⇒ evictions happened
    assert ex.stats["migrations_out"] > 0
    assert len(ex._resident) <= 2 + ex.prefetch_depth
    assert ex.stats["peak_resident"] >= 2


def test_decode_step_after_prefill(model):
    hp = model.hparams
    ex = LayerStreamExecutor(model, n_resident=3, prefetch_depth=2)
    cache = kv_cache_init(hp.n_layer, 1, 32, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    tokens = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    lg, cache = ex.forward(tokens, pos, cache)
    tok = jnp.argmax(lg[:, -1:], axis=-1).astype(jnp.int32)
    lg2, cache = ex.forward(tok, jnp.asarray([[4]], jnp.int32), cache)

    # reference: same two steps fully resident
    c2 = kv_cache_init(hp.n_layer, 1, 32, hp.n_head_kv, hp.head_dim,
                       hp.head_dim_v, dtype=jnp.float32)
    rl, c2 = llama_forward(model.params, hp, tokens, pos, c2)
    rt = jnp.argmax(rl[:, -1:], axis=-1).astype(jnp.int32)
    rl2, c2 = llama_forward(model.params, hp, rt, jnp.asarray([[4]], jnp.int32), c2)
    assert int(tok[0, 0]) == int(rt[0, 0])
    np.testing.assert_allclose(np.asarray(lg2, np.float32),
                               np.asarray(rl2, np.float32), rtol=2e-5, atol=2e-5)


def test_pinning_and_hits(model):
    hp = model.hparams
    ex = LayerStreamExecutor(model, n_resident=2)
    ex.pin_layer(0)
    tokens = jnp.asarray([[1, 2]], jnp.int32)
    for _ in range(2):
        cache = kv_cache_init(hp.n_layer, 1, 16, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=jnp.float32)
        ex.forward(tokens, jnp.arange(2, dtype=jnp.int32)[None], cache)
    assert 0 in ex._resident            # pinned survives the LRU churn
    assert ex.stats["hits"] > 0         # pinned layer re-used without copy
    ex.evict_all()
    assert 0 in ex._resident and len(ex._resident) == 1


class _FakeTelemetry:
    def __init__(self):
        self.pressured = True

    def pressure(self, threshold=0.85):
        return self.pressured


def test_pressure_degradation(model):
    hp = model.hparams
    ex = LayerStreamExecutor(model, n_resident=4, prefetch_depth=0,
                             telemetry=_FakeTelemetry())
    cache = kv_cache_init(hp.n_layer, 1, 16, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    ex.forward(jnp.asarray([[1]], jnp.int32),
               jnp.zeros((1, 1), jnp.int32), cache)
    assert ex.stats["degradations"] > 0
    assert len(ex._resident) <= 2       # halved from 4 under pressure
