"""Concurrency: parallel engines/contexts decoding simultaneously must not
interfere (tests/test-thread-safety.cpp counterpart — here the hazard is
shared jit caches + host-side engine state rather than C++ data races)."""

import threading

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(151)


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("ts") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_parallel_contexts_same_model(model):
    """N threads, each with its own Context over shared params, decode
    concurrently; every thread must match its serial reference."""
    prompts = [list(range(1 + i, 9 + i)) for i in range(4)]
    refs = []
    for p in prompts:
        ctx = Context(model, n_ctx=64, kv_dtype=np.float32)
        refs.append(ctx.greedy_generate(p, 8, stop_eog=False))

    results = [None] * len(prompts)
    errors = []

    def work(i):
        try:
            ctx = Context(model, n_ctx=64, kv_dtype=np.float32)
            results[i] = ctx.greedy_generate(prompts[i], 8, stop_eog=False)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(len(prompts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert results == refs


def test_concurrent_submissions_one_engine(model):
    """Many threads hammer one engine's queue while its loop runs."""
    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    eng.start()
    try:
        tok = model.tokenizer
        reqs = []

        def submit(i):
            r = GenRequest(prompt_ids=tok.encode(f"request {i}"),
                           max_tokens=4, stop_eog=False)
            eng.submit(r)
            reqs.append(r)

        threads = [threading.Thread(target=submit, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for r in reqs:
            out = r.result(timeout=300)
            assert out["n_generated"] == 4
    finally:
        eng.stop()
