"""Context-shift tests: the KV shift op (evict + re-rope + compact) must be
equivalent to recomputing the cache at the shifted positions, and the engine
must generate past n_ctx when shifting is enabled (server-context.cpp
context-shift semantics + passkey.cpp-style position herding)."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.ops import jnp_ref as ops
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.runtime.kv_cache import (
    causal_mask,
    kv_advance,
    kv_cache_init,
    kv_context_shift,
    kv_update_layer,
    kv_write_slots,
)
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(99)


def test_shift_equivalent_to_reencoding():
    """Shifted K == rope(raw_K, shifted positions): build a cache from known
    raw (pre-rope) keys, shift it, compare against a cache built directly at
    the shifted positions."""
    L, B, Hkv, S, D = 2, 2, 2, 32, 16
    n0 = 20
    rng = np.random.default_rng(0)
    raw_k = rng.normal(0, 1, (L, B, n0, Hkv, D)).astype(np.float32)
    raw_v = rng.normal(0, 1, (L, B, n0, Hkv, D)).astype(np.float32)
    inv_freq, mscale = ops.rope_frequencies(D, D, 10000.0)

    def build(positions):  # positions: (B, n0) with -1 = dropped
        cache = kv_cache_init(L, B, S, Hkv, D, D, dtype=jnp.float32)
        slots = kv_write_slots(cache, n0)
        cache = kv_advance(cache, slots, jnp.asarray(positions))
        for il in range(L):
            k = ops.apply_rope(jnp.asarray(raw_k[il]),
                               jnp.maximum(jnp.asarray(positions), 0),
                               inv_freq, 0, mscale)
            cache = kv_update_layer(cache, il, slots, k, jnp.asarray(raw_v[il]))
        return cache

    pos0 = np.tile(np.arange(n0, dtype=np.int32), (B, 1))
    cache = build(pos0)

    keep = np.asarray([4, 6], np.int32)
    discard = np.asarray([8, 4], np.int32)
    shifted = kv_context_shift(cache, jnp.asarray(keep), jnp.asarray(discard),
                               inv_freq, 0, mscale)

    for b in range(B):
        kept_idx = np.concatenate([np.arange(keep[b]),
                                   np.arange(keep[b] + discard[b], n0)])
        new_positions = np.concatenate([np.arange(keep[b]),
                                        np.arange(keep[b], n0 - discard[b])])
        n_valid = len(kept_idx)
        assert int(shifted.cursor[b]) == n_valid
        np.testing.assert_array_equal(np.asarray(shifted.pos[b, :n_valid]),
                                      new_positions)
        assert (np.asarray(shifted.pos[b, n_valid:]) == -1).all()
        for il in range(L):
            # reference: rope the kept raw keys at their NEW positions
            ref_k = np.asarray(ops.apply_rope(
                jnp.asarray(raw_k[il, b][kept_idx][None]),
                jnp.asarray(new_positions[None]), inv_freq, 0, mscale))[0]
            got_k = np.asarray(shifted.k[il, b, :, :n_valid]).transpose(1, 0, 2)
            np.testing.assert_allclose(got_k, ref_k, rtol=1e-5, atol=1e-5)
            ref_v = raw_v[il, b][kept_idx]
            got_v = np.asarray(shifted.v[il, b, :, :n_valid]).transpose(1, 0, 2)
            np.testing.assert_allclose(got_v, ref_v, rtol=1e-6, atol=1e-6)


def test_shift_noop_rows_untouched():
    L, B, Hkv, S, D = 1, 2, 1, 16, 8
    cache = kv_cache_init(L, B, S, Hkv, D, D, dtype=jnp.float32)
    slots = kv_write_slots(cache, 10)
    pos = np.tile(np.arange(10, dtype=np.int32), (B, 1))
    cache = kv_advance(cache, slots, jnp.asarray(pos))
    inv_freq, ms = ops.rope_frequencies(D, D, 10000.0)
    out = kv_context_shift(cache, jnp.asarray([0, 0]), jnp.asarray([0, 0]),
                           inv_freq, 0, ms)
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(cache.pos))
    np.testing.assert_array_equal(np.asarray(out.cursor), np.asarray(cache.cursor))


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("cs") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_engine_generates_past_n_ctx_with_shift(model):
    n_ctx = 48
    eng = Engine(model, n_slots=1, n_ctx=n_ctx, kv_dtype=np.float32,
                 prefill_buckets=(16,), ctx_shift=True)
    prompt = model.tokenizer.encode("tell me a very long story", add_special=True)
    n_gen = n_ctx  # would overflow a fixed context
    req = GenRequest(prompt_ids=prompt, max_tokens=n_gen, stop_eog=False)
    eng.submit(req)
    eng.run_until_drained()
    out = req.result(timeout=300)
    assert out["n_generated"] == n_gen
    assert eng.metrics["n_ctx_shifts"] >= 1
    # invariant: cache row never exceeds n_ctx and stays position-consistent
    s = eng.slots[0]
    assert s.n_past <= n_ctx
    assert len(s.cache_tokens) == s.n_past


def test_engine_without_shift_stops_at_length(model):
    eng = Engine(model, n_slots=1, n_ctx=32, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    prompt = model.tokenizer.encode("hi", add_special=True)
    res = eng.generate(prompt, max_tokens=28, stop_eog=False)
    assert res["finish_reason"] in ("length", "stop")
