"""Perplexity tool: methodology parity vs a direct torch computation, and the
quantization quality ladder (PPL(Q8) ≈ PPL(f32) < PPL(Q4_0-ish bound))."""

import math

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.tools.perplexity import compute_kl_divergence, compute_perplexity

torch.manual_seed(11)
N_CTX = 32


@pytest.fixture(scope="module")
def model_pair(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False, bos_token_id=1,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    d = tmp_path_factory.mktemp("ppl")
    convert_state_dict(str(d / "f32.gguf"), cfg, sd, GGMLType.F32,
                       tokenizer_fields={"tokenizer.ggml.tokens": [f"t{i}" for i in range(256)],
                                          "tokenizer.ggml.model": "llama",
                                          "tokenizer.ggml.bos_token_id": 1})
    convert_state_dict(str(d / "q8.gguf"), cfg, sd, GGMLType.Q8_0,
                       tokenizer_fields={"tokenizer.ggml.tokens": [f"t{i}" for i in range(256)],
                                          "tokenizer.ggml.model": "llama",
                                          "tokenizer.ggml.bos_token_id": 1})
    rng = np.random.default_rng(0)
    corpus = rng.integers(2, 256, 3 * N_CTX + 1).astype(np.int32)
    return hf, str(d / "f32.gguf"), str(d / "q8.gguf"), corpus


def _torch_ppl(hf, corpus, n_ctx, bos=1, first=None):
    first = first or min(512, n_ctx // 2)
    nll, cnt = 0.0, 0
    for c in range((len(corpus) - 1) // n_ctx):
        chunk = corpus[c * n_ctx : (c + 1) * n_ctx + 1]
        inp = chunk[:n_ctx].copy()
        inp[0] = bos
        with torch.no_grad():
            logits = hf(torch.tensor(inp[None].astype(np.int64))).logits[0]
        logp = torch.log_softmax(logits.float(), dim=-1)
        tgt = torch.tensor(chunk[1 : n_ctx + 1].astype(np.int64))
        tl = logp.gather(-1, tgt[:, None])[:, 0].numpy()
        # reference window: rows first..n_ctx-2 (perplexity.cpp:625-631)
        nll += -tl[first : n_ctx - 1].sum()
        cnt += tl[first : n_ctx - 1].size
    return math.exp(nll / cnt)


def test_ppl_matches_torch(model_pair):
    hf, f32_path, _, corpus = model_pair
    model = load_model(f32_path)
    res = compute_perplexity(model, corpus, n_ctx=N_CTX)
    ref = _torch_ppl(hf, corpus, N_CTX)
    assert res.ppl == pytest.approx(ref, rel=1e-4)


def test_quant_ppl_ladder(model_pair):
    _, f32_path, q8_path, corpus = model_pair
    ppl_f32 = compute_perplexity(load_model(f32_path), corpus, n_ctx=N_CTX).ppl
    ppl_q8 = compute_perplexity(load_model(q8_path, keep_quantized=True), corpus, n_ctx=N_CTX).ppl
    # Q8_0 must be within a tight delta of f32 (llama.cpp's stated bound regime)
    assert abs(math.log(ppl_q8 / ppl_f32)) < 0.02, (ppl_f32, ppl_q8)


def test_kl_divergence(model_pair):
    _, f32_path, q8_path, corpus = model_pair
    base_sink = []
    compute_perplexity(load_model(f32_path), corpus, n_ctx=N_CTX, logits_sink=base_sink)
    kl = compute_kl_divergence(load_model(q8_path, keep_quantized=True), corpus,
                               base_sink, n_ctx=N_CTX)
    assert kl["kl_mean"] < 0.01
    assert kl["same_top_p"] > 0.95


@pytest.fixture(scope="module")
def spm_model(tmp_path_factory):
    """Tiny llama with the real SPM vocab (natural-text tasks need it)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.gguf import GGUFReader
    from superllama_tpu.models import load_model

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("tasks") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32,
                       tokenizer_fields=tok_fields)
    return load_model(str(path))


def test_task_scoring(spm_model):
    """hellaswag / winogrande / multiple-choice scorers (perplexity.cpp:741,
    1091,1274 counterparts): end-to-end, deterministic, valid accuracy."""
    import json

    from superllama_tpu.tools.perplexity import (
        score_hellaswag,
        score_multiple_choice,
        score_winogrande,
    )

    model = spm_model

    hs = "\n".join([
        "Cooking: the chef heats the pan", "1",
        "and throws it away immediately",
        "and adds oil to fry the onions",
        "then sings a loud song",
        "and the moon is cheese",
    ]) + "\n"
    r1 = score_hellaswag(model, hs)
    r2 = score_hellaswag(model, hs)
    assert r1["n"] == 1 and r1["acc"] in (0.0, 1.0) and r1 == r2

    wg = '1,"The trophy did not fit in the case because the _ was too big.","trophy","case",1\n'
    r = score_winogrande(model, wg)
    assert r["n"] == 1 and r["acc"] in (0.0, 1.0)

    mc = json.dumps({"question": "Two plus two equals",
                     "choices": ["four", "banana", "seven", "blue"],
                     "answer": 0}) + "\n"
    r = score_multiple_choice(model, mc)
    assert r["n"] == 1 and r["acc"] in (0.0, 1.0)
