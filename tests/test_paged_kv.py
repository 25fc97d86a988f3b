"""Paged KV cache tests: kernel conformance vs dense attention, page manager
LRU spill/restore/pinning/coalescing semantics (llama_kv_cache_paged
counterpart — which the reference never actually wires in; here it is wired
and proven equivalent), and end-to-end generation parity dense vs paged."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.ops.jnp_ref import attention_ref
from superllama_tpu.ops.paged_attention import paged_flash_attention
from superllama_tpu.runtime.kv_cache import causal_mask
from superllama_tpu.runtime.paged_kv import (
    PagedKVManager,
    paged_cache_init,
)
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(44)


def test_paged_attention_matches_dense():
    """Pages scattered across the pool + a page table must equal contiguous
    attention over the same K/V."""
    B, T, H, Hkv, D, P, MAXP = 2, 8, 8, 4, 32, 16, 4
    S = P * MAXP
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    n_valid = [37, 52]                      # partial last pages
    kv_pos = np.full((B, S), -1, np.int32)
    for b in range(B):
        kv_pos[b, :n_valid[b]] = np.arange(n_valid[b])
    q_pos = np.stack([np.arange(n - T, n, dtype=np.int32) for n in n_valid])

    # scatter into a shared pool with a shuffled page table; slot 0 = NULL
    n_pool = B * MAXP + 1
    k_pages = np.zeros((n_pool, Hkv, P, D), np.float32)
    v_pages = np.zeros((n_pool, Hkv, P, D), np.float32)
    page_pos = np.full((n_pool, P), -1, np.int32)
    table = np.full((B, MAXP), -1, np.int32)
    slots = rng.permutation(np.arange(1, n_pool))
    si = 0
    for b in range(B):
        n_pages = (n_valid[b] + P - 1) // P
        for lg in range(n_pages):
            slot = int(slots[si]); si += 1
            table[b, lg] = slot
            k_pages[slot] = np.asarray(k)[b, :, lg * P:(lg + 1) * P]
            v_pages[slot] = np.asarray(v)[b, :, lg * P:(lg + 1) * P]
            page_pos[slot] = kv_pos[b, lg * P:(lg + 1) * P]

    ref = attention_ref(q, k, v, causal_mask(jnp.asarray(kv_pos), jnp.asarray(q_pos)))
    got = paged_flash_attention(q, jnp.asarray(k_pages), jnp.asarray(v_pages),
                                jnp.asarray(q_pos), jnp.asarray(page_pos),
                                jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=2e-5)


def test_paged_attention_swa_and_sinks():
    B, T, H, Hkv, D, P, MAXP = 1, 4, 4, 2, 16, 8, 3
    S = P * MAXP
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 1, (B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, Hkv, S, D)).astype(np.float32))
    n = 20
    kv_pos = np.full((B, S), -1, np.int32); kv_pos[0, :n] = np.arange(n)
    q_pos = np.arange(n - T, n, dtype=np.int32)[None]
    sinks = jnp.asarray(rng.normal(0, 1, (H,)).astype(np.float32))

    k_pages = np.zeros((MAXP + 1, Hkv, P, D), np.float32)
    v_pages = np.zeros((MAXP + 1, Hkv, P, D), np.float32)
    page_pos = np.full((MAXP + 1, P), -1, np.int32)
    table = np.full((B, MAXP), -1, np.int32)
    for lg in range((n + P - 1) // P):
        table[0, lg] = lg + 1
        k_pages[lg + 1] = np.asarray(k)[0, :, lg * P:(lg + 1) * P]
        v_pages[lg + 1] = np.asarray(v)[0, :, lg * P:(lg + 1) * P]
        page_pos[lg + 1] = kv_pos[0, lg * P:(lg + 1) * P]

    ref = attention_ref(q, k, v,
                        causal_mask(jnp.asarray(kv_pos), jnp.asarray(q_pos), 6),
                        sinks=sinks)
    got = paged_flash_attention(q, jnp.asarray(k_pages), jnp.asarray(v_pages),
                                jnp.asarray(q_pos), jnp.asarray(page_pos),
                                jnp.asarray(table), swa_window=6, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=2e-5)


# ------------------------------- manager ------------------------------------


def _mk_manager(n_pages=5, P=8, n_seqs=2, maxp=6):
    cache = paged_cache_init(n_layer=2, n_pages=n_pages, page_size=P,
                             n_seqs=n_seqs, max_pages_per_seq=maxp,
                             n_head_kv=2, head_dim=4, dtype=jnp.float32)
    return PagedKVManager(cache)


def test_manager_alloc_and_spill():
    mgr = _mk_manager(n_pages=4, P=8)   # 3 usable pages (slot 0 = NULL)
    # seq 0 fills 3 pages → pool full
    for _ in range(3):
        mgr.plan_step({0: 8})
        # simulate writes: mark positions
        slot = mgr._table_np[0, int(mgr._cur_page[0])]
        mgr.cache = mgr.cache._replace(
            page_pos=mgr.cache.page_pos.at[slot].set(jnp.arange(8)))
        mgr.finish_step(mgr.cache)
    assert mgr.stats["allocs"] == 3 and not mgr.free
    # seq 1 needs a page → LRU page of seq 0 spills to host
    mgr.plan_step({1: 4})
    mgr.finish_step(mgr.cache)
    assert mgr.stats["evictions"] == 1
    assert (0, 0) in mgr.host                     # oldest page went to host
    assert mgr._table_np[0, 0] == -1
    # restore brings it back (evicting something else)
    mgr.ensure_resident(0)
    assert mgr.stats["restores"] == 1
    assert mgr._table_np[0, 0] >= 0
    assert (0, 0) not in mgr.host


def test_manager_pinning():
    mgr = _mk_manager(n_pages=3, P=8)   # 2 usable pages
    mgr.plan_step({0: 8}); mgr.finish_step(mgr.cache)
    mgr.plan_step({0: 8}); mgr.finish_step(mgr.cache)
    mgr.pin(0)
    with pytest.raises(RuntimeError):
        mgr.plan_step({1: 8})
    mgr.pin(0, pinned=False)
    mgr.plan_step({1: 8}); mgr.finish_step(mgr.cache)
    assert mgr.stats["evictions"] >= 1


def test_manager_coalesced_restore():
    mgr = _mk_manager(n_pages=11, P=8, maxp=10)
    for _ in range(5):
        mgr.plan_step({0: 8}); mgr.finish_step(mgr.cache)
    mgr._evict_lru(5)          # spill all five pages
    assert len([k for k in mgr.host if k[0] == 0]) == 5
    mgr.ensure_resident(0)
    assert mgr.stats["coalesced_restores"] >= 1   # ≥4 adjacent pages batched
    assert mgr.stats["restores"] == 5


def test_manager_free_seq():
    mgr = _mk_manager()
    mgr.plan_step({0: 8}); mgr.finish_step(mgr.cache)
    mgr.plan_step({0: 8}); mgr.finish_step(mgr.cache)
    n_free0 = len(mgr.free)
    mgr.free_seq(0)
    assert len(mgr.free) == n_free0 + 2
    assert int(mgr._cur_off[0]) == 0


# ------------------------- end-to-end generation -----------------------------


def test_paged_generation_matches_dense(tmp_path):
    """Greedy decode with the paged cache + manager == dense-cache decode,
    including a forced spill/restore cycle mid-generation."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.models.registry import get_forward
    from superllama_tpu.runtime import Context

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    hp = model.hparams
    fwd = get_forward(hp.arch)

    prompt = list(range(1, 21))          # 20 tokens
    n_gen = 12
    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref_out = ctx.greedy_generate(prompt, n_gen, stop_eog=False)
    # teacher-forced per-step reference logits along the dense-greedy stream
    # (comparing raw logits instead of argmax keeps the test robust to
    # near-ties in an untrained model)
    ctx2 = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref_logits = [np.asarray(ctx2.forward(np.asarray(prompt, np.int32))[0, -1])]
    for t in ref_out[len(prompt):-1]:
        ref_logits.append(np.asarray(ctx2.forward(np.asarray([t], np.int32))[0, -1]))

    P = 16
    cache = paged_cache_init(hp.n_layer, n_pages=8, page_size=P, n_seqs=1,
                             max_pages_per_seq=6, n_head_kv=hp.n_head_kv,
                             head_dim=hp.head_dim, head_dim_v=hp.head_dim_v,
                             dtype=jnp.float32)
    mgr = PagedKVManager(cache)
    step = jax.jit(lambda p, t, po, c: fwd(p, hp, t, po, c))

    # chunked prefill (≤ page size per step)
    for off in range(0, len(prompt), P):
        chunk = prompt[off:off + P]
        mgr.plan_step({0: len(chunk)})
        tokens = jnp.asarray(np.asarray(chunk, np.int32)[None])
        pp = jnp.asarray(np.arange(off, off + len(chunk), dtype=np.int32)[None])
        logits, cache2 = step(model.params, tokens, pp, mgr.cache)
        mgr.finish_step(cache2)
    np.testing.assert_allclose(np.asarray(logits[0, -1]), ref_logits[0],
                               rtol=1e-4, atol=1e-4)
    # teacher-force the dense-greedy stream through the paged path
    forced = ref_out[len(prompt):]
    for i in range(n_gen - 1):
        if i == 4:  # force a spill/restore cycle mid-stream
            mgr._evict_lru(1)
            mgr.ensure_resident(0)
        mgr.plan_step({0: 1})
        tokens = jnp.asarray([[forced[i]]], jnp.int32)
        pp = jnp.asarray([[len(prompt) + i]], jnp.int32)
        logits, cache2 = step(model.params, tokens, pp, mgr.cache)
        mgr.finish_step(cache2)
        np.testing.assert_allclose(np.asarray(logits[0, -1]), ref_logits[i + 1],
                                   rtol=1e-4, atol=1e-4)
    assert mgr.stats["evictions"] >= 1 and mgr.stats["restores"] >= 1
