"""Qwen2-VL vision tower + M-RoPE parity vs transformers."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.models.qwen2vl import (mrope_apply, params_from_hf_visual,
                                           qwen2vl_vision_forward)


def test_vision_tower_parity():
    from transformers.models.qwen2_vl.configuration_qwen2_vl import (
        Qwen2VLVisionConfig)
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)

    torch.manual_seed(61)
    cfg = Qwen2VLVisionConfig(
        depth=2, embed_dim=64, hidden_size=48, num_heads=4, in_channels=3,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        mlp_ratio=2, attn_implementation="eager")
    hf = Qwen2VisionTransformerPretrainedModel(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_visual(sd, n_head=4)
    assert len(params["layers"]) == 2

    t, h, w = 1, 4, 6
    seq = t * h * w
    rng = np.random.default_rng(0)
    pixels = rng.normal(0, 1, (seq, 3 * 2 * 14 * 14)).astype(np.float32)
    grid = torch.tensor([[t, h, w]])
    with torch.no_grad():
        ref = hf(torch.tensor(pixels), grid).numpy()
    got = np.asarray(qwen2vl_vision_forward(
        jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            params), jnp.asarray(pixels), (t, h, w)))
    assert got.shape == ref.shape == (seq // 4, 48)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_mrope_matches_hf():
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        apply_multimodal_rotary_pos_emb)

    B, T, H, D = 2, 6, 4, 32
    sections = (4, 6, 6)     # quarter-dims per stream: sums to D//4 * ... = 16
    rng = np.random.default_rng(1)
    q = rng.normal(0, 1, (B, H, T, D)).astype(np.float32)
    k = rng.normal(0, 1, (B, H, T, D)).astype(np.float32)
    pos3 = rng.integers(0, 50, (3, B, T)).astype(np.int64)
    inv_freq = (1.0 / (10000.0 ** (np.arange(0, D, 2) / D))).astype(np.float32)
    freqs = pos3[..., None] * inv_freq[None, None, None, :]   # (3,B,T,D/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = np.cos(emb), np.sin(emb)
    with torch.no_grad():
        rq, rk = apply_multimodal_rotary_pos_emb(
            torch.tensor(q), torch.tensor(k), torch.tensor(cos),
            torch.tensor(sin), list(sections))
    gq = np.asarray(mrope_apply(jnp.asarray(q.transpose(0, 2, 1, 3)),
                                jnp.asarray(pos3), jnp.asarray(inv_freq),
                                sections)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(gq, rq.numpy(), rtol=2e-5, atol=2e-5)
    gk = np.asarray(mrope_apply(jnp.asarray(k.transpose(0, 2, 1, 3)),
                                jnp.asarray(pos3), jnp.asarray(inv_freq),
                                sections)).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(gk, rk.numpy(), rtol=2e-5, atol=2e-5)


def test_mrope_equal_positions_is_plain_rope():
    """Text-only: t == h == w positions ⇒ M-RoPE ≡ standard NEOX rope, which
    is why text parity needs no LM changes."""
    from superllama_tpu.ops.jnp_ref import ROPE_TYPE_NEOX, apply_rope

    B, T, H, D = 1, 5, 2, 16
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (B, T, H, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, 30, (B, T)), jnp.int32)
    inv_freq = jnp.asarray(1.0 / (10000.0 ** (np.arange(0, D, 2) / D)),
                           jnp.float32)
    ref = apply_rope(x, pos, inv_freq, ROPE_TYPE_NEOX)
    pos3 = jnp.broadcast_to(pos[None], (3, B, T))
    got = mrope_apply(x, pos3, inv_freq, (2, 3, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_qwen2vl_end_to_end_parity(tmp_path):
    """Full image+text forward vs HF Qwen2VLForConditionalGeneration: vision
    tower → embed injection → M-RoPE LM."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.models import load_model
    from superllama_tpu.models.qwen2vl import Qwen2VLMultimodal
    from superllama_tpu.tools.convert_hf import convert_state_dict

    torch.manual_seed(71)
    IMG, VSTART = 250, 249
    cfg = Qwen2VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]}),
        vision_config=dict(depth=2, embed_dim=64, hidden_size=64, num_heads=4,
                           in_channels=3, patch_size=14, temporal_patch_size=2,
                           spatial_merge_size=2, mlp_ratio=2),
        image_token_id=IMG, vision_start_token_id=VSTART,
        vision_end_token_id=248, attn_implementation="eager",
        tie_word_embeddings=False,
    )
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    # text side: strip the language_model prefix and convert as qwen2vl
    tsd = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            tsd["model." + k[len("model.language_model."):]] = v
        elif k == "lm_head.weight":
            tsd[k] = v
    path = tmp_path / "q2vl.gguf"
    convert_state_dict(str(path), cfg.text_config, tsd, GGMLType.F32,
                       arch="qwen2vl")
    model = load_model(str(path))
    assert model.hparams.extra.get("mrope_sections") == (2, 3, 3)

    visual = {k[len("model.visual."):]: v for k, v in sd.items()
              if k.startswith("model.visual.")}
    from superllama_tpu.models.qwen2vl import params_from_hf_visual

    vp = params_from_hf_visual(visual, n_head=4)

    t, h, w = 1, 4, 4
    n_img = t * (h // 2) * (w // 2)
    rng = np.random.default_rng(3)
    pixels = rng.normal(0, 1, (t * h * w, 3 * 2 * 14 * 14)).astype(np.float32)
    ids = [5, VSTART] + [IMG] * n_img + [248, 9, 17, 33]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 image_grid_thw=torch.tensor([[t, h, w]])).logits[0].numpy()

    mm = Qwen2VLMultimodal(model, vp, IMG)
    logits, cache, n = mm.prefill(ids, pixels, (t, h, w), n_ctx=64)
    got = np.asarray(logits[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.9


def test_qwen25vl_tower_parity():
    """Qwen2.5-VL windowed tower: same-window masking in original order must
    match HF's reorder + chunked attention."""
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)

    from superllama_tpu.models.qwen2vl import (params_from_hf_visual_25,
                                               qwen25vl_vision_forward)

    torch.manual_seed(91)
    cfg = Qwen2_5_VLVisionConfig(
        depth=3, hidden_size=64, out_hidden_size=48, intermediate_size=96,
        num_heads=4, in_channels=3, patch_size=14, temporal_patch_size=2,
        spatial_merge_size=2, window_size=56, fullatt_block_indexes=[1],
        attn_implementation="eager")
    hf = Qwen2_5_VisionTransformerPretrainedModel(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_visual_25(sd, n_head=4, merge=2, window=56,
                                      patch=14, fullatt=[1])
    t, h, w = 1, 8, 8
    rng = np.random.default_rng(7)
    pixels = rng.normal(0, 1, (t * h * w, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(pixels), torch.tensor([[t, h, w]])).numpy()
    got = np.asarray(qwen25vl_vision_forward(
        jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            params), jnp.asarray(pixels), (t, h, w)))
    assert got.shape == ref.shape
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_qwen3vl_deepstack_end_to_end_parity(tmp_path):
    """Qwen3-VL image+text vs HF: tower (learned interpolated pos embeds,
    2-D rope) → DeepStack taps → IMROPE LM with per-layer visual injection
    (Qwen3VLVisionModel + Qwen3VLTextModel._deepstack_process)."""
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.models import load_model
    from superllama_tpu.models.qwen3vl import (Qwen3VLMultimodal,
                                               params_from_hf_visual)
    from superllama_tpu.tools.convert_hf import convert_state_dict

    torch.manual_seed(73)
    IMG, VSTART = 250, 249
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=256,
            rope_scaling={"rope_type": "default", "mrope_section": [3, 3, 2],
                          "mrope_interleaved": True},
            tie_word_embeddings=False),
        vision_config=dict(
            depth=3, hidden_size=32, num_heads=4, in_channels=3,
            patch_size=4, temporal_patch_size=1, spatial_merge_size=2,
            intermediate_size=64, out_hidden_size=64,
            num_position_embeddings=16, deepstack_visual_indexes=[0, 1]),
        image_token_id=IMG, video_token_id=251, vision_start_token_id=VSTART,
        vision_end_token_id=248, attn_implementation="eager",
        architectures=["Qwen3VLForConditionalGeneration"],
    )
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    path = tmp_path / "q3vl.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    vp = params_from_hf_visual(
        sd, n_head=4, merge=2, deepstack_indexes=(0, 1),
        act="gelu_tanh")

    t, h, w = 1, 4, 8
    n_img = t * (h // 2) * (w // 2)
    rng = np.random.default_rng(5)
    pixels = rng.normal(0, 1, (t * h * w, 3 * 1 * 4 * 4)).astype(np.float32)
    ids = [5, VSTART] + [IMG] * n_img + [248, 9, 17, 33]

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 image_grid_thw=torch.tensor([[t, h, w]])).logits[0].numpy()

    mm = Qwen3VLMultimodal(model, vp, IMG)
    logits, _, _ = mm.prefill(ids, pixels, (t, h, w), n_ctx=64)
    got = np.asarray(logits[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, f"relative max err {err}"
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_mmproj_roundtrip_qwen2vl(tmp_path):
    """HF visual → mmproj GGUF (clip.cpp schema) → loaded tower == the
    direct HF-state-dict tower (convert_hf_to_gguf --mmproj counterpart)."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    from superllama_tpu.models.qwen2vl import params_from_mmproj
    from superllama_tpu.tools.convert_mmproj import convert_mmproj

    torch.manual_seed(81)
    cfg = Qwen2VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, max_position_embeddings=128),
        vision_config=dict(depth=2, embed_dim=64, hidden_size=64, num_heads=4,
                           in_channels=3, patch_size=14, temporal_patch_size=2,
                           spatial_merge_size=2, mlp_ratio=2),
        attn_implementation="eager")
    hf = Qwen2VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()
          if "visual" in k}
    path = tmp_path / "mmproj.gguf"
    convert_mmproj(str(path), cfg, sd)
    vp_gguf = params_from_mmproj(str(path))
    vp_hf = params_from_hf_visual(sd, n_head=4)

    rng = np.random.default_rng(7)
    t, h, w = 1, 4, 4
    pixels = jnp.asarray(rng.normal(0, 1, (t * h * w, 3 * 2 * 14 * 14))
                         .astype(np.float32))
    conv = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)
    a = np.asarray(qwen2vl_vision_forward(conv(vp_gguf), pixels, (t, h, w)))
    b = np.asarray(qwen2vl_vision_forward(conv(vp_hf), pixels, (t, h, w)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_mmproj_roundtrip_qwen3vl(tmp_path):
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    from superllama_tpu.models.qwen3vl import (params_from_hf_visual as p_hf3,
                                               params_from_mmproj as p_gg3,
                                               qwen3vl_vision_forward)
    from superllama_tpu.tools.convert_mmproj import convert_mmproj

    torch.manual_seed(82)
    cfg = Qwen3VLConfig(
        text_config=dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [3, 3, 2],
                                       "mrope_interleaved": True}),
        vision_config=dict(depth=3, hidden_size=32, num_heads=4, in_channels=3,
                           patch_size=4, temporal_patch_size=1,
                           spatial_merge_size=2, intermediate_size=64,
                           out_hidden_size=64, num_position_embeddings=16,
                           deepstack_visual_indexes=[0, 1]),
        attn_implementation="eager",
        architectures=["Qwen3VLForConditionalGeneration"])
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()
          if "visual" in k}
    path = tmp_path / "mmproj3.gguf"
    convert_mmproj(str(path), cfg, sd)
    vp_gguf = p_gg3(str(path))
    vp_hf = p_hf3(sd, n_head=4, merge=2, deepstack_indexes=(0, 1),
                  act="gelu_tanh")
    assert vp_gguf["hp"]["deepstack_indexes"] == [0, 1]

    rng = np.random.default_rng(8)
    t, h, w = 1, 4, 8
    pixels = jnp.asarray(rng.normal(0, 1, (t * h * w, 3 * 1 * 4 * 4))
                         .astype(np.float32))
    conv = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)
    a, ds_a = qwen3vl_vision_forward(conv(vp_gguf), pixels, (t, h, w))
    b, ds_b = qwen3vl_vision_forward(conv(vp_hf), pixels, (t, h, w))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
    for x, y in zip(ds_a, ds_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-5)
