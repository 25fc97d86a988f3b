"""Speculative decoding tests (common/speculative.{h,cpp} semantics):
the engine's output with a draft model must be IDENTICAL to the
non-speculative output — speculation is a latency optimization, never a
distribution change."""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(11)


def _mk_model(tmp, name, n_layer, hidden, seed):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=n_layer, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp / f"{name}.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spec")
    target = _mk_model(tmp, "target", n_layer=2, hidden=64, seed=1)
    draft = _mk_model(tmp, "draft", n_layer=1, hidden=32, seed=2)
    return target, draft


def _generate(target, draft, prompt, n, **kw):
    eng = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), draft_model=draft, n_draft=4)
    req = GenRequest(prompt_ids=prompt, max_tokens=n, stop_eog=False, **kw)
    eng.submit(req)
    eng.run_until_drained()
    return eng, req.result(timeout=120)


def test_spec_same_model_accepts_everything(models):
    """Draft == target ⇒ every draft accepted, output identical to plain."""
    target, _ = models
    prompt = target.tokenizer.encode("Once upon a time", add_special=True)

    eng0 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    r0 = eng0.generate(prompt, max_tokens=16, stop_eog=False)

    eng1, r1 = _generate(target, target, prompt, 16)
    assert r1["tokens"] == r0["tokens"]
    m = eng1.metrics
    assert m["n_spec_accepted"] == m["n_spec_drafted"]  # perfect acceptance
    # K=4 accepted + 1 bonus per round ⇒ far fewer verify steps than tokens
    assert m["n_decode_steps"] < r0["n_generated"]


def test_spec_different_draft_identical_output(models):
    """A weaker draft model changes only the speed, never the tokens."""
    target, draft = models
    prompt = target.tokenizer.encode("The meaning of life is", add_special=True)

    eng0 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    r0 = eng0.generate(prompt, max_tokens=20, stop_eog=False)

    _, r1 = _generate(target, draft, prompt, 20)
    assert r1["tokens"] == r0["tokens"]


def test_spec_sampled_chain_identical(models):
    """With a stochastic sampler chain, spec accept-by-resample still
    reproduces the non-spec stream exactly when drafts match the samples
    (same-model case, greedy-free seed path)."""
    target, _ = models
    prompt = target.tokenizer.encode("Hello", add_special=True)
    kw = {"sampling": {"seed": 3, "temp": 0.0}}  # temp 0 → greedy chain
    eng0 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    req0 = GenRequest(prompt_ids=prompt, max_tokens=12, stop_eog=False, **kw)
    eng0.submit(req0)
    eng0.run_until_drained()
    r0 = req0.result(timeout=120)
    _, r1 = _generate(target, target, prompt, 12, **kw)
    assert r1["tokens"] == r0["tokens"]


def test_spec_two_concurrent_slots(models):
    """Both slots speculate in the same batched rounds and stay independent."""
    target, draft = models
    tok = target.tokenizer
    p1 = tok.encode("The quick brown fox", add_special=True)
    p2 = tok.encode("Paris is the capital of", add_special=True)

    eng0 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    solo1 = eng0.generate(p1, max_tokens=10, stop_eog=False)["tokens"]
    eng0b = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    solo2 = eng0b.generate(p2, max_tokens=10, stop_eog=False)["tokens"]

    eng = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), draft_model=draft, n_draft=3)
    r1 = eng.submit(GenRequest(prompt_ids=p1, max_tokens=10, stop_eog=False))
    r2 = eng.submit(GenRequest(prompt_ids=p2, max_tokens=10, stop_eog=False))
    eng.run_until_drained()
    assert r1.result(timeout=120)["tokens"] == solo1
    assert r2.result(timeout=120)["tokens"] == solo2


def _mk_model_vocab(tmp, name, vocab_gguf, n_layer, hidden, seed):
    """Tiny llama with a specific tokenizer vocab (for translation tests)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    r = GGUFReader(f"/root/reference/models/{vocab_gguf}")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    n_vocab = len(tok_fields["tokenizer.ggml.tokens"])
    r.close()
    cfg = LlamaConfig(
        vocab_size=n_vocab, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=n_layer, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp / f"{name}.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_spec_vocab_translation_identical_output(tmp_path):
    """Draft with a DIFFERENT vocab (SPM target, BPE draft): the engine must
    route through the retokenization path (common/speculative.cpp:200-222)
    and still produce output identical to plain decoding."""
    target = _mk_model_vocab(tmp_path, "tgt", "ggml-vocab-llama-spm.gguf",
                             n_layer=2, hidden=64, seed=1)
    draft = _mk_model_vocab(tmp_path, "dft", "ggml-vocab-gpt-2.gguf",
                            n_layer=1, hidden=32, seed=2)
    prompt = target.tokenizer.encode("Once upon a time", add_special=True)

    eng0 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64))
    r0 = eng0.generate(prompt, max_tokens=16, stop_eog=False)

    eng1 = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                  prefill_buckets=(16, 64), draft_model=draft, n_draft=4)
    assert eng1.spec_translator is not None
    req = GenRequest(prompt_ids=prompt, max_tokens=16, stop_eog=False)
    eng1.submit(req)
    eng1.run_until_drained()
    r1 = req.result(timeout=120)
    assert r1["tokens"] == r0["tokens"]


def test_spec_are_compatible():
    from superllama_tpu.models import load_model as _lm
    from superllama_tpu.runtime.speculative import are_compatible
    from superllama_tpu.tokenizer.tokenizer import Tokenizer
    from superllama_tpu.tokenizer.vocab import vocab_from_gguf

    r1 = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    spm = Tokenizer(vocab_from_gguf(r1)); r1.close()
    r2 = GGUFReader("/root/reference/models/ggml-vocab-gpt-2.gguf")
    bpe = Tokenizer(vocab_from_gguf(r2)); r2.close()
    assert are_compatible(spm, spm)
    assert not are_compatible(spm, bpe)
    assert not are_compatible(spm, None)


def test_spec_on_paged_cache(models):
    """Speculative decoding over the paged KV cache (VERDICT r4 #6:
    de-island paged mode): identical output to the dense engine, rejected
    draft entries rolled back through the page manager, page accounting
    consistent across slot reuse."""
    target, draft = models
    tok = target.tokenizer
    prompt = tok.encode("The quick brown fox jumps", add_special=True)

    dense = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    r0 = dense.generate(prompt, max_tokens=14, stop_eog=False)

    eng = Engine(target, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), draft_model=draft, n_draft=4,
                 paged=True, page_size=32)
    r1 = eng.generate(prompt, max_tokens=14, stop_eog=False)
    assert r1["tokens"] == r0["tokens"]
    assert eng.metrics["n_spec_drafted"] > 0

    # slot reuse after rollbacks: a second request stays exact
    p2 = tok.encode("Hello there, friend", add_special=True)
    r2 = eng.generate(p2, max_tokens=10, stop_eog=False)
    ref2 = dense.generate(p2, max_tokens=10, stop_eog=False)
    assert r2["tokens"] == ref2["tokens"]

    # two concurrent speculative streams over pages
    a = eng.submit(GenRequest(prompt_ids=prompt, max_tokens=8,
                              stop_eog=False))
    b = eng.submit(GenRequest(prompt_ids=p2, max_tokens=8, stop_eog=False))
    eng.run_until_drained()
    assert a.result(1)["tokens"] == r0["tokens"][:8]
    assert b.result(1)["tokens"] == ref2["tokens"][:8]
