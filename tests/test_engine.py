"""Continuous-batching engine tests: correctness of batched generation vs the
single-sequence Context path, slot reuse, streaming, stop conditions.
(Parity target: server-context.cpp update_slots semantics.)"""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(5)


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
    path = tmp_path_factory.mktemp("eng") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_engine_matches_context(model):
    """Greedy generation through the batched engine == single-seq Context."""
    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    prompt = model.tokenizer.encode("Hello world, this is", add_special=True)
    res = eng.generate(prompt, max_tokens=10, stop_eog=False)

    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref = ctx.greedy_generate(prompt, 10, stop_eog=False)
    assert res["tokens"] == ref[len(prompt):]
    assert res["n_prompt"] == len(prompt)
    assert res["n_generated"] == 10
    assert res["finish_reason"] == "length"


def test_concurrent_slots_independent(model):
    """Two sequences batched together must each match their solo runs."""
    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    p1 = model.tokenizer.encode("The quick brown fox", add_special=True)
    p2 = model.tokenizer.encode("Once upon a time in a country far", add_special=True)
    r1 = eng.submit(GenRequest(prompt_ids=p1, max_tokens=8, stop_eog=False))
    r2 = eng.submit(GenRequest(prompt_ids=p2, max_tokens=8, stop_eog=False))
    eng.run_until_drained()

    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref1 = ctx.greedy_generate(p1, 8, stop_eog=False)[len(p1):]
    ctx.reset()
    ref2 = ctx.greedy_generate(p2, 8, stop_eog=False)[len(p2):]
    assert r1.result(1)["tokens"] == ref1
    assert r2.result(1)["tokens"] == ref2


def test_slot_reuse_more_requests_than_slots(model):
    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    tok = model.tokenizer
    reqs = [eng.submit(GenRequest(prompt_ids=tok.encode(f"request number {i}"),
                                  max_tokens=5, stop_eog=False))
            for i in range(5)]
    eng.run_until_drained()
    for r in reqs:
        out = r.result(1)
        assert out["n_generated"] == 5

    # determinism: same prompt again after slot reuse gives same tokens
    again = eng.generate(tok.encode("request number 0"), max_tokens=5, stop_eog=False)
    assert again["tokens"] == reqs[0].result(1)["tokens"]


def test_streaming_and_stop_strings(model):
    eng = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    got = []
    prompt = model.tokenizer.encode("hello")
    res = eng.generate(prompt, max_tokens=20, stop_eog=False,
                       stream=lambda t, piece: got.append(t))
    assert got == res["tokens"]

    # stop string: use the first generated piece as a stop → immediate stop
    first_piece = model.tokenizer.token_to_piece(res["tokens"][0]).decode("utf-8", "replace").strip()
    if first_piece:
        res2 = eng.generate(prompt, max_tokens=20, stop_eog=False,
                            stop_strings=[first_piece])
        assert res2["finish_reason"] == "stop"
        assert res2["n_generated"] < 20
        assert first_piece not in res2["text"]


def test_error_paths(model):
    eng = Engine(model, n_slots=1, n_ctx=64, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    with pytest.raises(RuntimeError, match="exceeds n_ctx"):
        eng.generate(list(range(50)), max_tokens=100)
    with pytest.raises(RuntimeError, match="empty prompt"):
        eng.generate([], max_tokens=5)
    # engine still usable afterwards
    out = eng.generate(model.tokenizer.encode("ok"), max_tokens=3, stop_eog=False)
    assert out["n_generated"] == 3


def test_long_prompt_multi_pass_prefill(model):
    eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16,))  # force chunked prefill
    prompt = model.tokenizer.encode("word " * 40)
    assert len(prompt) > 32
    res = eng.generate(prompt, max_tokens=5, stop_eog=False)

    ctx = Context(model, n_batch=1, n_ctx=256, kv_dtype=np.float32)
    ref = ctx.greedy_generate(prompt, 5, stop_eog=False)[len(prompt):]
    assert res["tokens"] == ref


def test_grammar_constrained_generation(model):
    """A GBNF grammar forces the engine's output into the language even with
    an untrained model (llama_sampler_init_grammar counterpart)."""
    import json

    from superllama_tpu.grammar import json_schema_to_gbnf

    eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    prompt = model.tokenizer.encode("Answer:", add_special=True)
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"], "additionalProperties": False}
    req = GenRequest(prompt_ids=prompt, max_tokens=64, stop_eog=True,
                     grammar=json_schema_to_gbnf(schema),
                     sampling={"seed": 7, "temp": 0.8})
    eng.submit(req)
    eng.run_until_drained()
    out = req.result(timeout=300)
    # untrained model may hit max_tokens mid-object; require a valid prefix
    text = out["text"]
    obj = None
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        pytest.skip_reason = None
    if obj is not None:
        assert set(obj) == {"ok"} and isinstance(obj["ok"], bool)
    else:
        # still must be a prefix of the grammar language
        from superllama_tpu.grammar import parse_gbnf
        from superllama_tpu.grammar.gbnf import GrammarState
        st = GrammarState(parse_gbnf(json_schema_to_gbnf(schema)))
        assert st.accept_text(text), text


def test_decode_loop_matches_stepwise(model):
    """The fully-jitted scan decode loop (backend sampling) reproduces the
    per-step greedy path exactly."""
    from superllama_tpu.runtime.decode_loop import DecodeLoop

    prompt = model.tokenizer.encode("The quick brown", add_special=True)
    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref = ctx.greedy_generate(prompt, 12, stop_eog=False)
    loop = DecodeLoop(model, n_ctx=128, kv_dtype=np.float32, temp=0.0)
    got = loop.generate(prompt, 12, stop_eog=False)
    assert got == ref


def test_decode_loop_sampled_reproducible(model):
    from superllama_tpu.runtime.decode_loop import DecodeLoop

    prompt = model.tokenizer.encode("Hello", add_special=True)
    loop = DecodeLoop(model, n_ctx=128, kv_dtype=np.float32,
                      temp=0.9, top_k=40, top_p=0.95)
    a = loop.generate(prompt, 10, seed=7, stop_eog=False)
    b = loop.generate(prompt, 10, seed=7, stop_eog=False)
    c = loop.generate(prompt, 10, seed=8, stop_eog=False)
    assert a == b
    assert a != c  # different key → (overwhelmingly) different stream


def test_prompt_cache_prefix_reuse(model):
    """A second request sharing a long prefix reuses the cached KV
    (server-context prompt caching) and still generates identical tokens."""
    tok = model.tokenizer
    base = "word banana tree " * 10  # long shared prefix (>16 tokens)
    p1 = tok.encode(base + "alpha", add_special=True)
    p2 = tok.encode(base + "beta", add_special=True)
    assert len(p1) > 20

    eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    r1 = eng.generate(p1, max_tokens=6, stop_eog=False)
    assert eng.metrics["n_prompt_cached"] == 0
    r2 = eng.generate(p2, max_tokens=6, stop_eog=False)
    assert eng.metrics["n_prompt_cached"] > 16  # prefix was reused

    fresh = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    ref = fresh.generate(p2, max_tokens=6, stop_eog=False)
    assert r2["tokens"] == ref["tokens"]


def test_slot_save_restore_roundtrip(model):
    """Saving a slot, erasing, and restoring reproduces continuation exactly
    (llama_state_seq semantics)."""
    tok = model.tokenizer
    prompt = tok.encode("the quick brown fox jumps over the lazy dog " * 2,
                        add_special=True)
    eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    eng.generate(prompt, max_tokens=4, stop_eog=False)
    snap = eng.slot_save(0)
    assert len(snap["cache_tokens"]) == snap["n_past"]

    # continuation A: directly extend via prompt-cache reuse
    p2 = [int(t) for t in snap["cache_tokens"]] + tok.encode(" and then")
    a = eng.generate(p2, max_tokens=5, stop_eog=False)
    cached_a = eng.metrics["n_prompt_cached"]
    assert cached_a > 0

    # erase, restore, continuation B must match
    eng.slot_erase(0)
    assert eng.slots[0].cache_tokens == []
    eng.slot_restore(0, snap)
    b = eng.generate(p2, max_tokens=5, stop_eog=False)
    assert b["tokens"] == a["tokens"]
    assert eng.metrics["n_prompt_cached"] > cached_a


def test_wave_skips_mid_scratch_slots(model):
    """A slot mid-way through a scratch-path prefill (long prompt, not yet
    inserted) must NOT join a batched prompt wave: the wave truncates main
    rows to prefill_off, but the mid-scratch slot's KV lives only in its
    scratch cache (ADVICE r4 high). Scenario: long prompt A loads chunk-by-
    chunk into scratch; request B arrives mid-load; both must still match
    their solo runs — and A's row must not expose the PREVIOUS request's KV."""
    tok = model.tokenizer
    eng = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16,))      # largest bucket 16 → scratch path
    # occupy slot A's row with an earlier request so stale KV is present
    warm = tok.encode("zebra yak xylophone walrus " * 3, add_special=True)
    eng.generate(warm, max_tokens=2, stop_eog=False)

    pA = tok.encode("alpha beta gamma delta " * 10, add_special=True)
    assert len(pA) > 16 and pA[:16] != warm[:16]
    pB = tok.encode("one two three", add_special=True)
    rA = eng.submit(GenRequest(prompt_ids=pA, max_tokens=6, stop_eog=False))
    eng.step()                    # admit A + load its first scratch chunk
    assert any(s.state.name == "PREFILL" and not s.in_place
               and s.prefill_off > 0 for s in eng.slots)
    rB = eng.submit(GenRequest(prompt_ids=pB, max_tokens=6, stop_eog=False))
    eng.run_until_drained()

    ctx = Context(model, n_batch=1, n_ctx=256, kv_dtype=np.float32)
    refA = ctx.greedy_generate(pA, 6, stop_eog=False)[len(pA):]
    ctx.reset()
    refB = ctx.greedy_generate(pB, 6, stop_eog=False)[len(pB):]
    assert rA.result(1)["tokens"] == refA
    assert rB.result(1)["tokens"] == refB


def test_greedy_fast_path_respects_pre_greedy_samplers(model):
    """temp=0 + logit_bias/penalties must run the REAL chain (LogitBias and
    Penalties sit BEFORE Greedy in make_chain) — the device argmax shortcut
    is only exact when those stages are no-ops (ADVICE r4 medium)."""
    from superllama_tpu.runtime.sampling import make_chain

    tok = model.tokenizer
    prompt = tok.encode("The quick brown fox", add_special=True)
    forced = 1234
    eng = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    res = eng.generate(prompt, max_tokens=4, stop_eog=False,
                       sampling={"temp": 0.0, "logit_bias": {forced: 100.0}})
    # +100 bias dominates an untrained model's logits: every token = forced
    assert res["tokens"] == [forced] * 4

    # penalty variant: reference = host chain over Context logits
    sm = {"temp": 0.0, "penalty_repeat": 1.9, "penalty_last_n": 64}
    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    chain = make_chain(**sm)
    for t in prompt[-64:]:
        chain.ctx.recent_tokens.append(int(t))
    logits = ctx.forward(np.asarray(prompt, np.int32))
    ref, last = [], None
    for _ in range(4):
        if last is not None:
            logits = ctx.forward(np.asarray([last], np.int32))
        last = chain.sample(np.asarray(logits[0, -1], np.float32))
        ref.append(int(last))
    eng2 = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    res2 = eng2.generate(prompt, max_tokens=4, stop_eog=False, sampling=sm)
    assert res2["tokens"] == ref
