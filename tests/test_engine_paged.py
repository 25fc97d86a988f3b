"""Paged-KV engine integration (VERDICT r1 item 3; BASELINE config 3).

The capability the reference implemented but never wired in
(src/llama-kv-cache-paged.h:40-218 vs the missing hook at
src/llama-context.cpp:333): Engine(paged=True) runs continuous batching over
the page-pool cache with the scalar-prefetch paged attention kernel, LRU
HBM⇄host spill under pool pressure, and swap-scheduling admission when the
concurrent sequences outgrow the pool. Outputs must be identical to the
dense-cache engine."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.models.loader import LoadedModel
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.engine import Engine, GenRequest


@pytest.fixture(scope="module")
def model():
    hp = tiny_test_hparams()
    pn = synthetic_params(hp, seed=3)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{kk: jnp.asarray(vv) for kk, vv in l.items()} for l in v])
              for k, v in pn.items()}
    return LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})


def _gen(eng: Engine, prompts, max_tokens=12):
    reqs = [eng.submit(GenRequest(prompt_ids=p, max_tokens=max_tokens,
                                  stop_eog=False)) for p in prompts]
    eng.run_until_drained()
    return [r.result()["tokens"] for r in reqs]


def test_paged_matches_dense(model):
    prompts = [list(range(2, 20)), list(range(30, 41)), list(range(50, 75))]
    dense = Engine(model, n_slots=3, n_ctx=128, kv_dtype=jnp.float32)
    paged = Engine(model, n_slots=3, n_ctx=128, kv_dtype=jnp.float32,
                   paged=True, page_size=16)
    out_d = _gen(dense, prompts)
    out_p = _gen(paged, prompts)
    assert out_d == out_p


def test_paged_forced_spill(model):
    """Pool smaller than the concurrent working set: B·ctx pages needed,
    pool holds less → LRU spill + swap-scheduling must kick in, outputs
    still identical to dense."""
    prompts = [list(range(2 + i, 26 + i)) for i in range(4)]
    dense = Engine(model, n_slots=4, n_ctx=64, kv_dtype=jnp.float32)
    # each seq needs up to ceil(64/8)=8 pages; 4 seqs want 32 — pool has 14
    paged = Engine(model, n_slots=4, n_ctx=64, kv_dtype=jnp.float32,
                   paged=True, page_size=8, n_pages=15)
    out_d = _gen(dense, prompts, max_tokens=16)
    out_p = _gen(paged, prompts, max_tokens=16)
    assert out_d == out_p
    st = paged.pkv.stats
    assert st["evictions"] > 0 and st["restores"] > 0, st
    assert paged.metrics["paged"]["evictions"] == st["evictions"]


def test_paged_long_prompt_chunked(model):
    """Prompt longer than a page prefills across pages; decode continues."""
    paged = Engine(model, n_slots=2, n_ctx=128, kv_dtype=jnp.float32,
                   paged=True, page_size=16)
    dense = Engine(model, n_slots=2, n_ctx=128, kv_dtype=jnp.float32)
    prompt = list(np.arange(2, 60) % 200)
    out_p = _gen(paged, [prompt], max_tokens=8)
    out_d = _gen(dense, [prompt], max_tokens=8)
    assert out_p == out_d


def test_paged_slot_reuse(model):
    """A finished slot's pages are reclaimed for the next request."""
    paged = Engine(model, n_slots=1, n_ctx=64, kv_dtype=jnp.float32,
                   paged=True, page_size=8, n_pages=9)
    for seed in (2, 40, 90):
        out = _gen(paged, [list(range(seed, seed + 12))], max_tokens=6)
        assert len(out[0]) == 6
    assert paged.pkv.stats["allocs"] >= 3


def test_paged_block_decode_with_stop_rollback(model):
    """Paged block decode (VERDICT r4 #6: block_size>1 on the paged cache):
    a stop mid-block rolls the page state back to the accepted tokens, and
    the slot serves the next request correctly."""
    from superllama_tpu.runtime.context import Context

    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,), paged=True, page_size=32,
                 block_size=8)
    assert eng.block_size == 8
    rng = np.random.default_rng(11)
    V = model.hparams.n_vocab
    p1 = [int(t) for t in rng.integers(1, V, 7)]
    # max_tokens NOT a multiple of block_size → guaranteed overshoot
    r1 = eng.generate(p1, max_tokens=5, stop_eog=False)
    assert r1["n_generated"] == 5

    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref = ctx.greedy_generate(p1, 5, stop_eog=False)[len(p1):]
    assert r1["tokens"] == ref

    # the rolled-back slot must serve a fresh request exactly
    p2 = [int(t) for t in rng.integers(1, V, 9)]
    r2 = eng.generate(p2, max_tokens=7, stop_eog=False)
    ctx.reset()
    ref2 = ctx.greedy_generate(p2, 7, stop_eog=False)[len(p2):]
    assert r2["tokens"] == ref2


def test_paged_block_decode_concurrent(model):
    from superllama_tpu.runtime.context import Context

    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,), paged=True, page_size=32,
                 block_size=4)
    rng = np.random.default_rng(12)
    V = model.hparams.n_vocab
    p1 = [int(t) for t in rng.integers(1, V, 11)]
    p2 = [int(t) for t in rng.integers(1, V, 5)]
    r1 = eng.submit(GenRequest(prompt_ids=p1, max_tokens=6, stop_eog=False))
    r2 = eng.submit(GenRequest(prompt_ids=p2, max_tokens=9, stop_eog=False))
    eng.run_until_drained()
    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    assert r1.result(1)["tokens"] == ctx.greedy_generate(
        p1, 6, stop_eog=False)[len(p1):]
    ctx.reset()
    assert r2.result(1)["tokens"] == ctx.greedy_generate(
        p2, 9, stop_eog=False)[len(p2):]


def test_paged_context_shift(model):
    """Context shift on the paged cache: export → evict+re-rope+compact →
    re-page; generation continues past n_ctx and matches the dense
    ctx-shift engine token-for-token."""
    from superllama_tpu.runtime.context import Context

    rng = np.random.default_rng(13)
    V = model.hparams.n_vocab
    prompt = [int(t) for t in rng.integers(1, V, 20)]

    dense = Engine(model, n_slots=1, n_ctx=48, kv_dtype=np.float32,
                   prefill_buckets=(16,), ctx_shift=True, block_size=1)
    r0 = dense.generate(prompt, max_tokens=48, stop_eog=False)
    assert r0["n_generated"] == 48                 # generated past n_ctx
    assert dense.metrics["n_ctx_shifts"] > 0

    paged = Engine(model, n_slots=1, n_ctx=48, kv_dtype=np.float32,
                   prefill_buckets=(16,), ctx_shift=True, paged=True,
                   page_size=16, n_pages=8, block_size=1)
    r1 = paged.generate(prompt, max_tokens=48, stop_eog=False)
    assert paged.metrics["n_ctx_shifts"] > 0
    assert r1["tokens"] == r0["tokens"]


def test_paged_prompt_prefix_reuse(model):
    """Prompt-cache prefix reuse over pages: a second request sharing a
    long prefix trims the page chain instead of reprefilling, with exact
    output (server-context prompt caching, paged)."""
    rng = np.random.default_rng(14)
    V = model.hparams.n_vocab
    base = [int(t) for t in rng.integers(1, V, 24)]
    p1 = base + [3]
    p2 = base + [5]

    eng = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), paged=True, page_size=16)
    eng.generate(p1, max_tokens=4, stop_eog=False)
    assert eng.metrics["n_prompt_cached"] == 0
    r2 = eng.generate(p2, max_tokens=6, stop_eog=False)
    assert eng.metrics["n_prompt_cached"] >= 16

    fresh = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                   prefill_buckets=(16, 64), paged=True, page_size=16)
    ref = fresh.generate(p2, max_tokens=6, stop_eog=False)
    assert r2["tokens"] == ref["tokens"]
