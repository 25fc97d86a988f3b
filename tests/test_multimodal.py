"""Multimodal (mtmd counterpart) tests: CLIP vision tower parity vs HF,
mmproj GGUF round trip, and full llava-style image+text forward parity."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.models.clip import (
    clip_vision_forward,
    convert_clip_vision,
    load_mmproj,
    project_image_features,
)
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.tools.mtmd import Multimodal

torch.manual_seed(161)


def _clip_cfg():
    from transformers import CLIPVisionConfig

    return CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, num_channels=3,
    )


def test_clip_tower_parity(tmp_path):
    from transformers import CLIPVisionModel

    cfg = _clip_cfg()
    hf = CLIPVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "mmproj.gguf"
    convert_clip_vision(str(path), cfg, sd, proj_out=48)
    params = load_mmproj(str(path))

    px = np.random.default_rng(0).normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(px)).last_hidden_state.numpy()
    got = np.asarray(clip_vision_forward(params, jnp.asarray(px)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err

    proj = np.asarray(project_image_features(params, jnp.asarray(got)))
    assert proj.shape == (2, 16, 48)  # CLS dropped, projected to text dim


def test_llava_style_end_to_end_parity(tmp_path):
    """Tiny Llava: our mmproj + GGUF language model reproduce HF's
    image+text logits (vision_feature_layer=-2, CLS dropped)."""
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    vis = _clip_cfg()
    txt = LlamaConfig(
        vocab_size=256, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    cfg = LlavaConfig(vision_config=vis, text_config=txt, image_token_index=255,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default",
                      projector_hidden_act="gelu")
    hf = LlavaForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    # language model → GGUF
    lm_sd = {k[len("model.language_model."):].replace("model.", "model.", 1): v
             for k, v in sd.items() if k.startswith("model.language_model.")}
    lm_sd = {("model." + k if not k.startswith("model.") else k): v
             for k, v in lm_sd.items()}
    lm_sd["lm_head.weight"] = sd["lm_head.weight"]
    lm_path = tmp_path / "lm.gguf"
    convert_state_dict(str(lm_path), txt, lm_sd, GGMLType.F32, arch="llama")
    model = load_model(str(lm_path))

    # vision tower + projector → mmproj GGUF
    vt_sd = {k[len("model.vision_tower."):]: v for k, v in sd.items()
             if k.startswith("model.vision_tower.")}
    vt_sd.update({k[len("model."):]: v for k, v in sd.items()
                  if k.startswith("model.multi_modal_projector.")})
    mm_path = tmp_path / "mm.gguf"
    convert_clip_vision(str(mm_path), vis, vt_sd)
    mtmd = Multimodal(model, str(mm_path), select_layer=-1)

    rng = np.random.default_rng(1)
    px = rng.normal(0, 1, (3, 32, 32)).astype(np.float32)
    n_img = (32 // 8) ** 2
    prompt = [1] + [255] * n_img + list(rng.integers(2, 250, 6))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([prompt]),
                 pixel_values=torch.tensor(px[None])).logits[0].numpy()

    text_ids = [1] + list(prompt[1 + n_img:])
    logits, cache, n_past = mtmd.prefill(text_ids, px, n_ctx=64)
    got = np.asarray(logits[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-3, err


def test_image_actually_conditions_output(tmp_path):
    from transformers import CLIPVisionModel

    cfg = _clip_cfg()
    hf = CLIPVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    mm_path = tmp_path / "m.gguf"
    convert_clip_vision(str(mm_path), cfg, sd, proj_out=48)

    from transformers import LlamaConfig, LlamaForCausalLM

    txt_cfg = LlamaConfig(vocab_size=256, hidden_size=48, intermediate_size=96,
                          num_hidden_layers=1, num_attention_heads=4,
                          num_key_value_heads=2, max_position_embeddings=128,
                          architectures=["LlamaForCausalLM"],
                          tie_word_embeddings=False)
    lm = LlamaForCausalLM(txt_cfg).eval()
    lm_sd = {k: v.detach().numpy() for k, v in lm.state_dict().items()}
    lm_path = tmp_path / "lm.gguf"
    convert_state_dict(str(lm_path), txt_cfg, lm_sd, GGMLType.F32)
    model = load_model(str(lm_path))
    mtmd = Multimodal(model, str(mm_path))

    rng = np.random.default_rng(2)
    img1 = rng.normal(0, 1, (3, 32, 32)).astype(np.float32)
    img2 = rng.normal(0, 1, (3, 32, 32)).astype(np.float32)
    l1, _, _ = mtmd.prefill([1, 5, 6], img1, n_ctx=64)
    l2, _, _ = mtmd.prefill([1, 5, 6], img2, n_ctx=64)
    assert np.abs(np.asarray(l1[0, -1]) - np.asarray(l2[0, -1])).max() > 1e-4


def test_mmproj_roundtrip_gemma3(tmp_path):
    """HF gemma3 vision tower → mmproj GGUF → loaded tower matches the
    direct HF loader (clip.cpp PROJECTOR_TYPE_GEMMA3 schema)."""
    import jax
    import jax.numpy as jnp
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    from superllama_tpu.models.siglip import (gemma3_project,
                                              params_from_hf_gemma3_vision,
                                              params_from_mmproj,
                                              siglip_vision_forward)
    from superllama_tpu.tools.convert_mmproj import convert_mmproj

    torch.manual_seed(91)
    cfg = Gemma3Config(
        text_config=dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=1, head_dim=16),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=56, patch_size=14, num_channels=3),
        mm_tokens_per_image=4, image_token_index=250,
        boi_token_index=248, eoi_token_index=249,
        attn_implementation="eager")
    hf = Gemma3ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()
          if "vision_tower" in k or "multi_modal_projector" in k}
    path = tmp_path / "mmproj-g3.gguf"
    convert_mmproj(str(path), cfg, sd)
    vp_a = params_from_mmproj(str(path), mm_tokens=4)
    vp_b = params_from_hf_gemma3_vision(sd, n_head=4, patch=14, mm_tokens=4)

    conv = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)
    rng = np.random.default_rng(9)
    px = jnp.asarray(rng.normal(0, 1, (1, 3, 56, 56)).astype(np.float32))
    ha = siglip_vision_forward(conv(vp_a), px)
    hb = siglip_vision_forward(conv(vp_b), px)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-5,
                               atol=1e-5)
    pa = gemma3_project(conv(vp_a), ha)
    pb = gemma3_project(conv(vp_b), hb)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5,
                               atol=1e-5)
