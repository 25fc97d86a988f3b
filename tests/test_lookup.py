"""N-gram lookup-decoding tests (common/ngram-cache + examples/lookup):
cache logic, and engine output identical with lookup decoding on/off."""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.runtime.ngram import NgramCache
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(111)


def test_ngram_cache_basic():
    ng = NgramCache(n_min=2, n_max=3)
    seq = [1, 2, 3, 4, 1, 2, 3, 5, 1, 2, 3, 4]
    ng.update(seq)
    # after [2,3]: 4 appears twice, 5 once → draft 4
    assert ng.draft([1, 2, 3], 1) == [4]
    # chained drafting follows indexed continuations
    d = ng.draft([1, 2], 3)
    assert d[0] == 3
    assert ng.draft([99, 98], 4) == []  # unseen context


def test_ngram_extend_incremental():
    ng = NgramCache(n_min=2, n_max=2)
    ng.update([7, 8, 9])
    ng.extend([8, 9], [10, 11])
    assert ng.draft([9, 10], 1) == [11]
    assert ng.draft([8, 9], 1) == [10]


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
    path = tmp_path_factory.mktemp("lk") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_lookup_decoding_identical_output(model):
    """With a pre-seeded (static) n-gram cache — the reference's
    lookup-cache-from-file mode — drafts hit and accepted tokens match the
    plain greedy stream exactly."""
    tok = model.tokenizer
    prompt = tok.encode("one two three four one two three four one two three",
                        add_special=True)
    ref_eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                     prefill_buckets=(16, 64))
    ref = ref_eng.generate(prompt, max_tokens=16, stop_eog=False)

    eng = Engine(model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), lookup_ngrams=4)
    static = NgramCache()
    static.update(list(prompt) + ref["tokens"])  # "corpus" containing the continuation
    req = GenRequest(prompt_ids=prompt, max_tokens=16, stop_eog=False)
    eng.submit(req)
    eng._ngrams[0] = static
    eng.run_until_drained()
    got = req.result(30)
    assert got["tokens"] == ref["tokens"]
    assert eng.metrics["n_spec_drafted"] > 0    # lookup actually drafted
    assert eng.metrics["n_spec_accepted"] > 0   # and drafts were accepted
    # far fewer verify rounds than tokens when drafts hit
    assert eng.metrics["n_decode_steps"] < got["n_generated"]


def test_lookup_two_slots(model):
    tok = model.tokenizer
    p1 = tok.encode("a b c a b c a b c", add_special=True)
    p2 = tok.encode("x y x y x y x y", add_special=True)
    ref_e = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    r1 = ref_e.generate(p1, max_tokens=10, stop_eog=False)["tokens"]
    ref_e2 = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                    prefill_buckets=(16, 64))
    r2 = ref_e2.generate(p2, max_tokens=10, stop_eog=False)["tokens"]

    eng = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), lookup_ngrams=3)
    a = eng.submit(GenRequest(prompt_ids=p1, max_tokens=10, stop_eog=False))
    b = eng.submit(GenRequest(prompt_ids=p2, max_tokens=10, stop_eog=False))
    eng.run_until_drained()
    assert a.result(10)["tokens"] == r1
    assert b.result(10)["tokens"] == r2


def test_lookup_on_paged_cache(model):
    """Lookup decoding over the paged cache: n-gram drafts verified and
    rejected entries rolled back through the page manager; output equals
    the dense engine's."""
    tok = model.tokenizer
    prompt = tok.encode("one two three one two three one two", add_special=True)

    dense = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                   prefill_buckets=(16, 64))
    r0 = dense.generate(prompt, max_tokens=14, stop_eog=False)

    eng = Engine(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64), lookup_ngrams=4,
                 paged=True, page_size=32)
    r1 = eng.generate(prompt, max_tokens=14, stop_eog=False)
    assert r1["tokens"] == r0["tokens"]

    # slot reuse stays exact after rollbacks
    p2 = tok.encode("alpha beta gamma", add_special=True)
    assert eng.generate(p2, max_tokens=8, stop_eog=False)["tokens"] == \
        dense.generate(p2, max_tokens=8, stop_eog=False)["tokens"]
