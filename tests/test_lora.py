"""LoRA adapter tests: PEFT → GGUF conversion, runtime merge, and parity
against an HF model with the delta merged into its weights (the strategy of
the reference's export-lora/adapter tests)."""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.models.lora import convert_lora_from_peft, load_lora, merge_lora
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(21)

RANK, ALPHA = 4, 8.0
TARGETS = ["self_attn.q_proj", "self_attn.v_proj", "mlp.gate_proj"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("lora")
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    base_path = tmp / "base.gguf"
    convert_state_dict(str(base_path), cfg, sd, GGMLType.F32)

    # random LoRA deltas on a few projections of every layer
    rng = np.random.default_rng(7)
    peft_sd = {}
    for il in range(cfg.num_hidden_layers):
        for proj in TARGETS:
            w = sd[f"model.layers.{il}.{proj}.weight"]
            a = rng.normal(0, 0.05, (RANK, w.shape[1])).astype(np.float32)
            b = rng.normal(0, 0.05, (w.shape[0], RANK)).astype(np.float32)
            peft_sd[f"base_model.model.model.layers.{il}.{proj}.lora_A.weight"] = a
            peft_sd[f"base_model.model.model.layers.{il}.{proj}.lora_B.weight"] = b

    lora_path = tmp / "adapter.gguf"
    convert_lora_from_peft(str(lora_path), peft_sd, ALPHA, arch="llama",
                           n_head=4, n_head_kv=2)

    # HF reference with deltas merged directly into its weights
    merged = dict(sd)
    for il in range(cfg.num_hidden_layers):
        for proj in TARGETS:
            a = peft_sd[f"base_model.model.model.layers.{il}.{proj}.lora_A.weight"]
            b = peft_sd[f"base_model.model.model.layers.{il}.{proj}.lora_B.weight"]
            key = f"model.layers.{il}.{proj}.weight"
            merged[key] = merged[key] + (b @ a) * (ALPHA / RANK)
    hf_merged = LlamaForCausalLM(cfg).eval()
    hf_merged.load_state_dict({k: torch.tensor(v) for k, v in merged.items()})
    return cfg, str(base_path), str(lora_path), hf_merged


def test_load_lora_metadata(setup):
    _, _, lora_path, _ = setup
    ad = load_lora(lora_path)
    assert ad.alpha == ALPHA and ad.rank == RANK
    assert len(ad.tensors) == 2 * len(TARGETS)


def test_merged_forward_matches_hf(setup):
    cfg, base_path, lora_path, hf_merged = setup
    model = load_model(base_path)
    adapter = load_lora(lora_path)
    model.params = merge_lora(model.params, adapter, scale=1.0)

    ids = np.random.default_rng(0).integers(1, 256, size=(1, 16))
    with torch.no_grad():
        ref = hf_merged(torch.tensor(ids)).logits[0].float().numpy()
    ctx = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    got = np.asarray(ctx.forward(ids[0].astype(np.int32))[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err


def test_scale_zero_is_identity(setup):
    _, base_path, lora_path, _ = setup
    model = load_model(base_path)
    adapter = load_lora(lora_path)
    p0 = model.params
    p1 = merge_lora(p0, adapter, scale=0.0)
    for l0, l1 in zip(p0["layers"], p1["layers"]):
        for k in l0:
            np.testing.assert_allclose(np.asarray(l0[k]), np.asarray(l1[k]))


def test_hot_swap_scales(setup):
    """Applying at scale s then comparing to 2× delta: linearity holds."""
    _, base_path, lora_path, _ = setup
    model = load_model(base_path)
    adapter = load_lora(lora_path)
    p1 = merge_lora(model.params, adapter, scale=1.0)
    p2 = merge_lora(model.params, adapter, scale=2.0)
    w0 = np.asarray(model.params["layers"][0]["wq"], np.float64)
    w1 = np.asarray(p1["layers"][0]["wq"], np.float64)
    w2 = np.asarray(p2["layers"][0]["wq"], np.float64)
    np.testing.assert_allclose(w2 - w0, 2 * (w1 - w0), rtol=1e-4, atol=1e-6)
