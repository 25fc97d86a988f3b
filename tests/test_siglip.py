"""Gemma3 vision (SigLIP tower + projector) end-to-end parity vs HF."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.models.siglip import (Gemma3Multimodal,
                                          params_from_hf_gemma3_vision)
from superllama_tpu.tools.convert_hf import convert_state_dict


def test_gemma3_vision_end_to_end(tmp_path):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    torch.manual_seed(81)
    IMG = 299
    cfg = Gemma3Config(
        text_config=dict(
            vocab_size=304, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=128, sliding_window=16),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=28, patch_size=14,
                           hidden_act="gelu_pytorch_tanh"),
        image_token_index=IMG, mm_tokens_per_image=4,
        boi_token_index=297, eoi_token_index=298,
        attn_implementation="eager",
    )
    hf = Gemma3ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    tsd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            tsd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            tsd[k] = v
    path = tmp_path / "g3vl.gguf"
    convert_state_dict(str(path), cfg.text_config, tsd, GGMLType.F32,
                       arch="gemma3")
    model = load_model(str(path))

    vp = params_from_hf_gemma3_vision(sd, n_head=4, patch=14, mm_tokens=4)
    rng = np.random.default_rng(5)
    pixels = rng.normal(0, 1, (1, 3, 28, 28)).astype(np.float32)
    ids = [2, 297] + [IMG] * 4 + [298, 7, 21]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels)).logits[0].float().numpy()

    mm = Gemma3Multimodal(model, vp, IMG)
    logits, cache, n = mm.prefill(ids, pixels, n_ctx=64)
    got = np.asarray(logits[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-3, err
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.9
