"""iSWA two-tier KV cache: parity vs the full cache and memory bounds.

Counterpart of the reference's llama_kv_cache_iswa (src/llama-kv-cache-iswa.h:
full-size cache for full-attention layers + O(window) cache for sliding-window
layers). Here the SWA tier is a ring indexed by pos % S_swa; parity with the
masked-full-cache path must be exact while every in-window entry is resident.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.kv_cache import (
    ISWACache,
    iswa_cache_init,
    iswa_layer_split,
    iswa_swa_seq,
    iswa_truncate_pos,
    kv_cache_init,
    kv_truncate_rows,
)

WINDOW = 16
N_CTX = 256


@pytest.fixture(scope="module")
def swa_model():
    hp = tiny_test_hparams(n_layer=4, swa_window=WINDOW, swa_pattern=2)
    params = synthetic_params(hp, dtype=np.float32, seed=3)
    params = {
        k: (v if not isinstance(v, list) else
            [{lk: jnp.asarray(lv) for lk, lv in l.items()} for l in v])
        for k, v in params.items()
    }
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else v)
              for k, v in params.items()}
    return hp, params


def _run(hp, params, cache, chunks, rng):
    p0 = 0
    outs = []
    for t in chunks:
        tokens = jnp.asarray(rng.integers(0, hp.n_vocab, (1, t)), jnp.int32)
        pos = p0 + jnp.arange(t, dtype=jnp.int32)[None, :]
        logits, cache = llama_forward(params, hp, tokens, pos, cache,
                                      flash=False)
        outs.append(np.asarray(logits, np.float32))
        p0 += t
    return np.concatenate(outs, axis=1), cache


def test_layer_split():
    hp = tiny_test_hparams(n_layer=4, swa_window=WINDOW, swa_pattern=2)
    full, swa = iswa_layer_split(hp)
    assert full == [1, 3] and swa == [0, 2]


def test_ring_is_smaller():
    s = iswa_swa_seq(WINDOW, n_ubatch=32, max_seq=N_CTX)
    assert s == 128 and s < N_CTX


def test_iswa_parity_past_window(swa_model):
    """Decode far past the window: two-tier logits == masked-full-cache."""
    hp, params = swa_model
    chunks = [24] + [1] * 40 + [8] + [1] * 10
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)

    full_cache = kv_cache_init(hp.n_layer, 1, N_CTX, hp.n_head_kv,
                               hp.head_dim, hp.head_dim_v, jnp.float32)
    ref, _ = _run(hp, params, full_cache, chunks, rng1)

    iswa_cache = iswa_cache_init(hp, 1, N_CTX, n_ubatch=32, dtype=jnp.float32)
    assert iswa_cache.swa.max_seq == 128
    got, cache = _run(hp, params, iswa_cache, chunks, rng2)

    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # ring actually wrapped: high-water position exceeds the ring size? no —
    # total positions (83) < 128 here; run enough to wrap
    chunks2 = [1] * 80
    ref2_cache = kv_cache_init(hp.n_layer, 1, N_CTX, hp.n_head_kv,
                               hp.head_dim, hp.head_dim_v, jnp.float32)
    rng3, rng4 = np.random.default_rng(9), np.random.default_rng(9)
    ref_all, _ = _run(hp, params, ref2_cache, chunks + chunks2, rng3)
    got_all, c2 = _run(hp, params,
                       iswa_cache_init(hp, 1, N_CTX, n_ubatch=32,
                                       dtype=jnp.float32),
                       chunks + chunks2, rng4)
    assert int(c2.swa.cursor.max()) > c2.swa.max_seq  # wrapped
    np.testing.assert_allclose(got_all, ref_all, rtol=2e-5, atol=2e-5)


def test_iswa_truncate_pos(swa_model):
    """Positional rollback (speculative-reject) matches a fresh replay."""
    hp, params = swa_model
    rng = np.random.default_rng(11)
    toks = rng.integers(0, hp.n_vocab, 40)

    cache = iswa_cache_init(hp, 1, N_CTX, n_ubatch=32, dtype=jnp.float32)
    t = jnp.asarray(toks[None, :], jnp.int32)
    pos = jnp.arange(40, dtype=jnp.int32)[None, :]
    _, cache = llama_forward(params, hp, t, pos, cache, flash=False)
    cache = iswa_truncate_pos(cache, jnp.asarray([30], jnp.int32))

    # replay only the first 30 in a fresh cache; next-token logits must match
    fresh = iswa_cache_init(hp, 1, N_CTX, n_ubatch=32, dtype=jnp.float32)
    _, fresh = llama_forward(params, hp, t[:, :30], pos[:, :30], fresh,
                             flash=False)
    nxt = jnp.asarray([[5]], jnp.int32)
    npos = jnp.asarray([[30]], jnp.int32)
    l1, _ = llama_forward(params, hp, nxt, npos, cache, flash=False)
    l2, _ = llama_forward(params, hp, nxt, npos, fresh, flash=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-5, atol=2e-5)


def test_context_auto_iswa(swa_model):
    """Context auto-selects the two-tier cache for SWA models and generates
    identically to a forced full cache."""
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.runtime.context import Context

    hp, params = swa_model
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})
    ctx_i = Context(model, n_ctx=N_CTX, kv_dtype=jnp.float32)
    assert isinstance(ctx_i.cache, ISWACache)
    ctx_f = Context(model, n_ctx=N_CTX, kv_dtype=jnp.float32, iswa=False)
    prompt = list(range(10))
    out_i = ctx_i.greedy_generate(prompt, 32, stop_eog=False)
    out_f = ctx_f.greedy_generate(prompt, 32, stop_eog=False)
    assert out_i == out_f


# --------------------- engine-served iSWA (VERDICT r4 #3) ---------------------


def _swa_loaded_model():
    from superllama_tpu.models.loader import LoadedModel

    hp = tiny_test_hparams(n_layer=4, swa_window=WINDOW, swa_pattern=2)
    params = synthetic_params(hp, dtype=np.float32, seed=3)
    params = {
        k: (v if not isinstance(v, list) else
            [{lk: jnp.asarray(lv) for lk, lv in l.items()} for l in v])
        for k, v in params.items()
    }
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else v)
              for k, v in params.items()}
    return LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})


def test_engine_auto_selects_iswa_ring():
    """An SWA model served through the Engine gets the two-tier cache with
    an O(window) ring for SWA layers (src/llama-kv-cache-iswa.h:15-40), not
    an O(n_ctx) row per layer."""
    from superllama_tpu.runtime.engine import Engine

    model = _swa_loaded_model()
    eng = Engine(model, n_slots=2, n_ctx=N_CTX, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    assert eng.iswa and isinstance(eng.cache, ISWACache)
    assert eng.cache.swa.max_seq < N_CTX
    assert eng.cache.swa.max_seq >= WINDOW + 64     # window + ubatch headroom
    assert eng.cache.full.max_seq == N_CTX


def test_engine_iswa_matches_dense_past_window():
    """Generation through the iswa-cached engine == the dense-cached engine
    == solo Context, with prompts well past the window, two concurrent
    slots, and slot reuse."""
    from superllama_tpu.runtime.context import Context
    from superllama_tpu.runtime.engine import Engine, GenRequest

    model = _swa_loaded_model()
    rng = np.random.default_rng(5)
    V = model.hparams.n_vocab
    p1 = [int(t) for t in rng.integers(0, V, 3 * WINDOW)]   # 48 ≫ window
    p2 = [int(t) for t in rng.integers(0, V, 20)]

    eng = Engine(model, n_slots=2, n_ctx=N_CTX, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    assert eng.iswa
    r1 = eng.submit(GenRequest(prompt_ids=p1, max_tokens=8, stop_eog=False))
    r2 = eng.submit(GenRequest(prompt_ids=p2, max_tokens=8, stop_eog=False))
    eng.run_until_drained()

    dense = Engine(model, n_slots=2, n_ctx=N_CTX, kv_dtype=np.float32,
                   prefill_buckets=(16, 64), iswa=False)
    assert not dense.iswa
    d1 = dense.generate(p1, max_tokens=8, stop_eog=False)
    d2 = dense.generate(p2, max_tokens=8, stop_eog=False)

    ctx = Context(model, n_batch=1, n_ctx=N_CTX, kv_dtype=np.float32,
                  iswa=False)
    ref1 = ctx.greedy_generate(p1, 8, stop_eog=False)[len(p1):]
    assert r1.result(1)["tokens"] == d1["tokens"] == ref1
    assert r2.result(1)["tokens"] == d2["tokens"]

    # slot reuse: a third request must not see leftover ring entries
    r3 = eng.generate(p2, max_tokens=8, stop_eog=False)
    assert r3["tokens"] == d2["tokens"]


def test_engine_iswa_prefix_reuse_guard():
    """Prefix reuse stays on while the ring still covers the prefix window
    and falls back to full reprocess when it doesn't — output must be exact
    either way."""
    from superllama_tpu.runtime.engine import Engine

    model = _swa_loaded_model()
    rng = np.random.default_rng(6)
    V = model.hparams.n_vocab
    base = [int(t) for t in rng.integers(0, V, 40)]

    eng = Engine(model, n_slots=1, n_ctx=N_CTX, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    a = eng.generate(base + [1, 2], max_tokens=4, stop_eog=False)
    b = eng.generate(base + [3, 4], max_tokens=4, stop_eog=False)

    fresh = Engine(model, n_slots=1, n_ctx=N_CTX, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    assert b["tokens"] == fresh.generate(base + [3, 4], max_tokens=4,
                                         stop_eog=False)["tokens"]


def test_engine_iswa_slot_save_restore():
    from superllama_tpu.runtime.engine import Engine

    model = _swa_loaded_model()
    rng = np.random.default_rng(7)
    V = model.hparams.n_vocab
    prompt = [int(t) for t in rng.integers(0, V, 30)]
    eng = Engine(model, n_slots=1, n_ctx=N_CTX, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    eng.generate(prompt, max_tokens=4, stop_eog=False)
    snap = eng.slot_save(0)
    eng.generate([int(t) for t in rng.integers(0, V, 9)], max_tokens=3,
                 stop_eog=False)
    eng.slot_erase(0)
    eng.slot_restore(0, snap)
    # prefix continuation through the restored ring must match a fresh run
    p2 = [int(t) for t in snap["cache_tokens"]] + [5, 6]
    a = eng.generate(p2, max_tokens=4, stop_eog=False)
    fresh = Engine(model, n_slots=1, n_ctx=N_CTX, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    assert a["tokens"] == fresh.generate(p2, max_tokens=4,
                                         stop_eog=False)["tokens"]
