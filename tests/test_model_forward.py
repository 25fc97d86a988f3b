"""End-to-end forward-pass parity vs torch/transformers on identical weights.

This is the framework's Stage-1 correctness gate (SURVEY.md §7): the GGUF
round-trip (HF → our converter → our loader → our forward) must reproduce the
HF reference logits to float tolerance.
"""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(0)


def _tiny_llama_config(**kw):
    from transformers import LlamaConfig

    return LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, architectures=["LlamaForCausalLM"], **kw,
    )


@pytest.fixture(scope="module")
def tiny_llama(tmp_path_factory):
    from transformers import LlamaForCausalLM

    cfg = _tiny_llama_config()
    hf = LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("m") / "tiny_llama.gguf"
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return hf, cfg, str(path)


def _hf_logits(hf, ids):
    with torch.no_grad():
        return hf(torch.tensor(ids, dtype=torch.long)).logits.numpy()


def test_prefill_logits_match_hf(tiny_llama):
    hf, cfg, path = tiny_llama
    model = load_model(path)
    ctx = Context(model, n_batch=2, n_ctx=64)
    ids = np.array([[1, 5, 9, 200, 31, 7, 77, 3], [2, 88, 41, 250, 13, 99, 6, 150]], np.int32)
    ours = np.asarray(ctx.forward(ids), np.float32)
    ref = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_decode_matches_prefill(tiny_llama):
    """Incremental decode through the KV cache must equal one-shot prefill."""
    _, cfg, path = tiny_llama
    model = load_model(path)
    ids = [1, 5, 9, 200, 31, 7]

    ctx_full = Context(model, n_batch=1, n_ctx=32)
    full = np.asarray(ctx_full.forward(np.array(ids, np.int32)))

    ctx_inc = Context(model, n_batch=1, n_ctx=32)
    steps = []
    for t in ids:
        steps.append(np.asarray(ctx_inc.forward(np.array([t], np.int32)))[0, 0])
    inc = np.stack(steps)[None]
    np.testing.assert_allclose(inc, full, rtol=1e-4, atol=1e-4)


def test_greedy_generation_matches_hf(tiny_llama):
    hf, cfg, path = tiny_llama
    model = load_model(path)
    ctx = Context(model, n_batch=1, n_ctx=64)
    prompt = [1, 42, 7, 13]
    ours = ctx.greedy_generate(prompt, 16, stop_eog=False)
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=16, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0].tolist()
    assert ours == ref


def test_q8_quantized_close_to_f32(tiny_llama):
    hf, cfg, path = tiny_llama
    from transformers import LlamaForCausalLM

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    qpath = path.replace(".gguf", "_q8.gguf")
    convert_state_dict(qpath, cfg, sd, GGMLType.Q8_0)
    model = load_model(qpath)
    ctx = Context(model, n_batch=1, n_ctx=32)
    ids = np.array([[1, 5, 9, 200, 31, 7]], np.int32)
    ours = np.asarray(ctx.forward(ids), np.float32)
    ref = _hf_logits(hf, ids)
    # quantized: compare argmax agreement + correlation, not exact values
    assert (ours.argmax(-1) == ref.argmax(-1)).mean() > 0.8
    c = np.corrcoef(ours.reshape(-1), ref.reshape(-1))[0, 1]
    assert c > 0.99


@pytest.fixture(scope="module")
def tiny_mixtral(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, architectures=["MixtralForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("m") / "tiny_mixtral.gguf"
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return hf, cfg, str(path)


def test_moe_logits_match_hf(tiny_mixtral):
    hf, cfg, path = tiny_mixtral
    model = load_model(path)
    assert model.hparams.n_expert == 4 and model.hparams.n_expert_used == 2
    ctx = Context(model, n_batch=1, n_ctx=32)
    ids = np.array([[1, 5, 9, 200, 31, 7, 77, 3]], np.int32)
    ours = np.asarray(ctx.forward(ids), np.float32)
    ref = _hf_logits(hf, ids)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_moe_sparse_equals_dense():
    """Grouped-GEMM MoE (ragged_dot) must match the dense all-experts path."""
    import jax.numpy as jnp

    from superllama_tpu.models.llama import moe_ffn_dense, moe_ffn_sparse
    from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams

    hp = tiny_test_hparams(n_expert=4, n_expert_used=2, n_ff_exp=32)
    pn = synthetic_params(hp, dtype=np.float32, seed=9)
    layer = {k: jnp.asarray(v) for k, v in pn["layers"][0].items()
             if k.startswith("ffn_")}
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 5, hp.n_embd)),
                    jnp.float32)
    dense = np.asarray(moe_ffn_dense(x, layer, hp), np.float32)
    sparse = np.asarray(moe_ffn_sparse(x, layer, hp), np.float32)
    np.testing.assert_allclose(sparse, dense, rtol=2e-5, atol=2e-5)
