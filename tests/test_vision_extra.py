"""InternVL + Pixtral vision towers vs HF transformers (VERDICT r4 item 4:
mtmd tower breadth — tools/mtmd/models/{internvl,pixtral}.cpp analogs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from superllama_tpu.models.vision_extra import (
    internvl_project,
    internvl_vision_forward,
    params_from_hf_internvl,
    params_from_hf_pixtral,
    pixel_shuffle,
    pixtral_project,
    pixtral_vision_forward,
)


def _px(seed, size=32):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (1, 3, size, size)).astype(np.float32)


def test_internvl_tower_parity():
    from transformers import InternVLVisionConfig, InternVLVisionModel

    cfg = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    torch.manual_seed(0)
    hf = InternVLVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_internvl(sd, cfg)
    px = _px(1)
    with torch.no_grad():
        ref = hf(torch.tensor(px)).last_hidden_state[0].numpy()
    got = np.asarray(internvl_vision_forward(params, jnp.asarray(px)))[0]
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_internvl_full_model_parity(tmp_path):
    """Full InternVL: tower + pixel shuffle + projector vs HF's
    get_image_features (modeling path the reference mirrors)."""
    from transformers import (InternVLConfig, InternVLForConditionalGeneration,
                              InternVLVisionConfig)
    from transformers import Qwen2Config

    vis = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    txt = Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2)
    cfg = InternVLConfig(vision_config=vis, text_config=txt,
                         downsample_ratio=0.5, vision_feature_layer=-1,
                         vision_feature_select_strategy="default")
    torch.manual_seed(1)
    hf = InternVLForConditionalGeneration(cfg).eval()
    px = _px(2)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px),
            vision_feature_layer=-1,
            vision_feature_select_strategy="default")[0].numpy()
    vis_sd = {k[len("model.vision_tower."):]: v.detach().numpy()
              for k, v in hf.state_dict().items()
              if k.startswith("model.vision_tower.")}
    proj_sd = {k[len("model.multi_modal_projector."):]: v.detach().numpy()
               for k, v in hf.state_dict().items()
               if k.startswith("model.multi_modal_projector.")}
    params = params_from_hf_internvl(vis_sd, vis, proj_sd, n_merge=2)
    feats = internvl_vision_forward(params, jnp.asarray(px))
    got = np.asarray(internvl_project(params, feats, 4, 4))[0]
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err


def test_pixtral_tower_parity():
    from transformers import PixtralVisionConfig, PixtralVisionModel

    cfg = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    torch.manual_seed(2)
    hf = PixtralVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_pixtral(sd, cfg)
    px = _px(3)
    with torch.no_grad():
        ref = hf(torch.tensor(px),
                 image_sizes=torch.tensor([[32, 32]])).last_hidden_state
        ref = ref[0].numpy() if ref.ndim == 3 else ref.numpy()
    got = np.asarray(pixtral_vision_forward(params, jnp.asarray(px)))[0]
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_pixtral_img_break_layout():
    """[IMG_BREAK] insertion: one break embedding after every patch row
    except the last (pixtral.cpp:62-84)."""
    rng = np.random.default_rng(4)
    E, nh, nw = 8, 3, 4
    feats = jnp.asarray(rng.normal(0, 1, (1, nh * nw, 16)), jnp.float32)
    params = {
        "hp": {"eps": 1e-5, "n_merge": 1},
        "mm_1": jnp.asarray(rng.normal(0, 0.2, (16, E)), jnp.float32),
        "mm_2": jnp.asarray(rng.normal(0, 0.2, (E, E)), jnp.float32),
        "img_break": jnp.asarray(rng.normal(0, 1, (E,)), jnp.float32),
    }
    out = np.asarray(pixtral_project(params, feats, nh, nw))[0]
    assert out.shape[0] == nh * nw + nh - 1
    brk = np.asarray(params["img_break"])
    np.testing.assert_allclose(out[nw], brk, rtol=1e-6)      # end of row 0
    np.testing.assert_allclose(out[2 * nw + 1], brk, rtol=1e-6)
    assert not np.allclose(out[-1], brk)                     # no final break


def test_pixel_shuffle_is_invertible_grouping():
    """pixel_shuffle groups each scale×scale spatial block's channels —
    every output row is a permutation of the corresponding input rows."""
    rng = np.random.default_rng(5)
    nh = nw = 4
    D = 6
    x = jnp.asarray(rng.normal(0, 1, (1, nh * nw, D)), jnp.float32)
    y = np.asarray(pixel_shuffle(x, nh, nw, 2))[0]
    assert y.shape == (4, 4 * D)
    xs = np.asarray(x)[0].reshape(nh, nw, D)
    blk = {tuple(sorted(np.round(r, 5))) for r in
           [np.concatenate([xs[i][j] for i in range(2) for j in range(2)])
            for _ in [0]]}
    flat = sorted(np.round(y.reshape(-1), 5).tolist())
    assert flat == sorted(np.round(np.asarray(x).reshape(-1), 5).tolist())


def test_internvl_mmproj_roundtrip_and_serving(tmp_path):
    """HF InternVL → mmproj GGUF → Multimodal dispatch: the GGUF-loaded
    tower reproduces the HF get_image_features path, through the same
    Multimodal class the server uses."""
    from transformers import (InternVLConfig, InternVLForConditionalGeneration,
                              InternVLVisionConfig, Qwen2Config)

    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.models.vision_extra import convert_internvl_mmproj
    from superllama_tpu.tools.mtmd import Multimodal

    vis = InternVLVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    txt = Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2)
    cfg = InternVLConfig(vision_config=vis, text_config=txt,
                         downsample_ratio=0.5, vision_feature_layer=-1,
                         vision_feature_select_strategy="default")
    torch.manual_seed(3)
    hf = InternVLForConditionalGeneration(cfg).eval()
    vis_sd = {k[len("model.vision_tower."):]: v.detach().numpy()
              for k, v in hf.state_dict().items()
              if k.startswith("model.vision_tower.")}
    proj_sd = {k[len("model.multi_modal_projector."):]: v.detach().numpy()
               for k, v in hf.state_dict().items()
               if k.startswith("model.multi_modal_projector.")}
    path = tmp_path / "internvl-mmproj.gguf"
    convert_internvl_mmproj(str(path), vis, vis_sd, proj_sd, n_merge=2)

    import jax.numpy as jnp2

    from superllama_tpu.models.hparams import HParams
    lm = LoadedModel(
        hparams=HParams(arch="llama", n_vocab=128, n_ctx_train=64, n_embd=48,
                        n_layer=1, n_head=4, n_head_kv=2, n_ff=96, n_rot=12,
                        head_dim=12, head_dim_v=12),
        params={"token_embd": jnp2.zeros((128, 48), jnp2.float32)},
        tokenizer=None, metadata={})
    mtmd = Multimodal(lm, str(path))
    px = _px(6)
    got = np.asarray(mtmd.image_embeds(jnp.asarray(px)))[0]
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px), vision_feature_layer=-1,
            vision_feature_select_strategy="default")[0].numpy()
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err


def test_pixtral_mmproj_roundtrip(tmp_path):
    from transformers import PixtralVisionConfig, PixtralVisionModel

    from superllama_tpu.models.vision_extra import (convert_pixtral_mmproj,
                                                    encode_image_extra,
                                                    params_from_mmproj_extra)

    cfg = PixtralVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    torch.manual_seed(4)
    hf = PixtralVisionModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    rng = np.random.default_rng(7)
    proj_sd = {"linear_1.weight": rng.normal(0, .2, (24, 32)).astype(np.float32),
               "linear_2.weight": rng.normal(0, .2, (24, 24)).astype(np.float32)}
    brk = rng.normal(0, 1, 24).astype(np.float32)
    path = tmp_path / "pixtral-mmproj.gguf"
    convert_pixtral_mmproj(str(path), cfg, sd, proj_sd, img_break=brk)

    params = params_from_mmproj_extra(str(path))
    px = _px(8)
    out = np.asarray(encode_image_extra(params, jnp.asarray(px)))[0]
    # 4x4 grid + one [IMG_BREAK] per row except the last
    assert out.shape == (16 + 3, 24)
    direct = params_from_hf_pixtral(sd, cfg, proj_sd)
    direct["img_break"] = jnp.asarray(brk)
    feats = pixtral_vision_forward(direct, jnp.asarray(px))
    ref = np.asarray(pixtral_project(direct, feats, 4, 4))[0]
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_minicpmv_resampler_behavior():
    """MiniCPM-V perceiver resampler (minicpmv.cpp:38-110): fixed query
    count regardless of input patches, position-sensitivity through the
    sincos K-side table, and an independent numpy replay of the single
    cross-attention."""
    from superllama_tpu.models.vision_extra import (minicpmv_resample,
                                                    minicpmv_sincos_pos)

    rng = np.random.default_rng(9)
    E, D_vit, nq = 128, 32, 8       # E: resampler width (1 head of 128)
    lin = lambda i, o: jnp.asarray(rng.normal(0, 0.2, (i, o)), jnp.float32)
    vec = lambda n: jnp.asarray(rng.normal(0, 0.2, n), jnp.float32)
    params = {
        "hp": {"eps": 1e-6},
        "rs_query": lin(nq, E) * 1.0,
        "rs_kv_proj": lin(D_vit, E),
        "rs_ln_q": jnp.ones(E), "rs_ln_q_b": jnp.zeros(E),
        "rs_ln_kv": jnp.ones(E), "rs_ln_kv_b": jnp.zeros(E),
        "rs_wq": lin(E, E), "rs_wq_b": vec(E),
        "rs_wk": lin(E, E), "rs_wk_b": vec(E),
        "rs_wv": lin(E, E), "rs_wv_b": vec(E),
        "rs_wo": lin(E, E), "rs_wo_b": vec(E),
        "rs_ln_post": jnp.ones(E), "rs_ln_post_b": jnp.zeros(E),
        "rs_proj": lin(E, 48),
    }
    for nh, nw in ((4, 4), (2, 8), (6, 6)):
        feats = jnp.asarray(rng.normal(0, 1, (1, nh * nw, D_vit)),
                            jnp.float32)
        out = np.asarray(minicpmv_resample(params, feats, nh, nw))
        assert out.shape == (1, nq, 48)      # query count fixed

    # K-side positions matter: permuting patch order changes the output
    feats = jnp.asarray(rng.normal(0, 1, (1, 16, D_vit)), jnp.float32)
    a = np.asarray(minicpmv_resample(params, feats, 4, 4))
    perm = rng.permutation(16)
    b = np.asarray(minicpmv_resample(params, feats[:, perm], 4, 4))
    assert np.abs(a - b).max() > 1e-4

    # numpy replay of the cross-attention (independent of the jax path)
    def np_ln(x, eps=1e-6):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) / np.sqrt(v + eps)

    f = np.asarray(feats)[0]
    q = np_ln(np.asarray(params["rs_query"]))
    v = np_ln(f @ np.asarray(params["rs_kv_proj"]))
    pos = np.asarray(minicpmv_sincos_pos(
        np.repeat(np.arange(4), 4).astype(np.float32),
        np.tile(np.arange(4), 4).astype(np.float32), E))
    k = v + pos
    Q = q @ np.asarray(params["rs_wq"]) + np.asarray(params["rs_wq_b"])
    K = k @ np.asarray(params["rs_wk"]) + np.asarray(params["rs_wk_b"])
    V = v @ np.asarray(params["rs_wv"]) + np.asarray(params["rs_wv_b"])
    logits = Q @ K.T / np.sqrt(128.0)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = p @ V @ np.asarray(params["rs_wo"]) + np.asarray(params["rs_wo_b"])
    ref = np_ln(o) @ np.asarray(params["rs_proj"])
    np.testing.assert_allclose(a[0], ref, rtol=2e-4, atol=2e-4)


def test_idefics3_connector_parity():
    """Idefics3 (SmolVLM family): siglip tower + pixel shuffle + single
    modality projection vs HF's get_image_features."""
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration
    from transformers import Idefics3VisionConfig, LlamaConfig

    from superllama_tpu.models.siglip import siglip_vision_forward
    from superllama_tpu.models.vision_extra import (
        idefics3_project, params_from_hf_idefics3_vision)

    vis = Idefics3VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    txt = LlamaConfig(vocab_size=128, hidden_size=48, intermediate_size=96,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2)
    cfg = Idefics3Config(vision_config=vis, text_config=txt, scale_factor=2)
    torch.manual_seed(5)
    hf = Idefics3ForConditionalGeneration(cfg).eval()
    px = _px(10)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(px)[None],          # (B, num_images, C, H, W)
            pixel_attention_mask=torch.ones(1, 1, 32, 32, dtype=torch.bool))
        ref = ref.reshape(-1, ref.shape[-1]).float().numpy()
    vis_sd = {k[len("model.vision_model."):]: v.detach().numpy()
              for k, v in hf.state_dict().items()
              if k.startswith("model.vision_model.")}
    params = params_from_hf_idefics3_vision(vis_sd, vis)
    proj_w = [v for k, v in hf.state_dict().items()
              if "connector" in k and k.endswith("proj.weight")]
    assert len(proj_w) == 1
    params["projection"] = jnp.asarray(
        proj_w[0].detach().numpy().astype(np.float32)).T
    feats = siglip_vision_forward(params, jnp.asarray(px))
    got = np.asarray(idefics3_project(params, feats, 4, 4, 2))[0]
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err


def test_glm_edge_adapter_behavior():
    """GLM-Edge projector (llava.cpp:337-365): 2×2 stride-2 patch-merge
    conv + LN/GELU/split-swiglu MLP + BOI/EOI wrapping, replayed in numpy."""
    from superllama_tpu.models.vision_extra import glm_edge_project

    rng = np.random.default_rng(12)
    D, Do, E = 16, 24, 20
    nh = nw = 4
    lin = lambda i, o: jnp.asarray(rng.normal(0, 0.3, (i, o)), jnp.float32)
    params = {
        "hp": {"eps": 1e-6},
        "adapter_conv": rng.normal(0, 0.3, (Do, D, 2, 2)).astype(np.float32),
        "adapter_conv_b": jnp.asarray(rng.normal(0, 0.1, Do), jnp.float32),
        "mlp_0": lin(Do, E), "mlp_1": lin(E, E), "mlp_2": lin(E, E),
        "mlp_3": lin(E, E),
        "ln_q": jnp.ones(E), "ln_q_b": jnp.zeros(E),
        "boi": jnp.asarray(rng.normal(0, 1, E), jnp.float32),
        "eoi": jnp.asarray(rng.normal(0, 1, E), jnp.float32),
    }
    feats = jnp.asarray(rng.normal(0, 1, (1, 16, D)), jnp.float32)
    out = np.asarray(glm_edge_project(params, feats, nh, nw))
    assert out.shape == (1, 1 + 4 + 1, E)            # 2x2-merged + BOI/EOI
    np.testing.assert_allclose(out[0, 0], np.asarray(params["boi"]),
                               rtol=1e-6)
    np.testing.assert_allclose(out[0, -1], np.asarray(params["eoi"]),
                               rtol=1e-6)

    # numpy conv replay for one output position
    f = np.asarray(feats)[0].reshape(4, 4, D)
    w = params["adapter_conv"]
    y0 = np.einsum("ckl,klc->c", w.transpose(0, 1, 2, 3)[..., 0, 0] * 0 + 0,
                   np.zeros((1, 1, D))) if False else None
    quad = f[0:2, 0:2]                               # (2, 2, D)
    conv0 = np.einsum("ockl,klc->o", w, quad.transpose(0, 1, 2)) \
        + np.asarray(params["adapter_conv_b"])
    def ln(x, eps=1e-6):
        return (x - x.mean()) / np.sqrt(x.var() + eps)
    import math
    gelu = lambda x: 0.5 * x * (1.0 + np.tanh(
        math.sqrt(2 / math.pi) * (x + 0.044715 * x ** 3)))
    silu = lambda x: x / (1.0 + np.exp(-x))
    e = conv0 @ np.asarray(params["mlp_0"])
    e = ln(e) * 1.0 + 0.0
    e = gelu(e)
    e = silu(e @ np.asarray(params["mlp_2"])) * (e @ np.asarray(params["mlp_1"]))
    e = e @ np.asarray(params["mlp_3"])
    np.testing.assert_allclose(out[0, 1], e, rtol=2e-4, atol=2e-4)
