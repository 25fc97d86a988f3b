"""HF vision tower → mmproj GGUF (convert_hf_to_gguf.py --mmproj mode,
Qwen2VLVisionModel / Qwen3VLVisionModel counterparts).

Writes the reference's mmproj schema (tools/mtmd/clip-impl.h tensor/KV
names: v.blk.N.*, mm.{0,2}.*, v.deepstack.IDX.*, clip.vision.* keys) so an
ecosystem mmproj file and one produced here are interchangeable — and
`models/qwen2vl.params_from_mmproj` / `models/qwen3vl.params_from_mmproj`
load either back into the tower params dicts.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..gguf import GGMLType, GGUFWriter

_PROJ_TYPES = {
    "qwen2_vl": "qwen2vl",
    "qwen2_5_vl": "qwen2.5vl",
    "qwen3_vl": "qwen3vl",
    "qwen3_vl_moe": "qwen3vl",
}


def convert_mmproj(out_path: str, config: Any, state_dict: dict) -> None:
    """config: the FULL HF config (with vision_config + model_type);
    state_dict: numpy arrays (visual.* / model.visual.* /
    model.vision_tower.* keys)."""
    vc = config.vision_config
    model_type = getattr(config, "model_type", "qwen2_vl")
    if model_type == "gemma3":
        return _convert_mmproj_gemma3(out_path, config, state_dict)
    if model_type in ("internvl", "internvl_chat"):
        from ..models.vision_extra import convert_internvl_mmproj

        vis_sd = {k.split("vision_tower.", 1)[1]: v
                  for k, v in state_dict.items() if "vision_tower." in k}
        proj_sd = {k.split("multi_modal_projector.", 1)[1]: v
                   for k, v in state_dict.items()
                   if "multi_modal_projector." in k}
        ratio = float(getattr(config, "downsample_ratio", 0.5))
        return convert_internvl_mmproj(out_path, vc, vis_sd,
                                       proj_sd or None,
                                       n_merge=round(1.0 / ratio))
    if model_type in ("pixtral", "mistral3", "llava") and \
            getattr(vc, "model_type", "") == "pixtral":
        from ..models.vision_extra import convert_pixtral_mmproj

        vis_sd = {k.split("vision_tower.", 1)[1]: v
                  for k, v in state_dict.items() if "vision_tower." in k}
        proj_sd = {k.split("multi_modal_projector.", 1)[1]: v
                   for k, v in state_dict.items()
                   if "multi_modal_projector." in k}
        return convert_pixtral_mmproj(out_path, vc, vis_sd, proj_sd or None)
    proj = _PROJ_TYPES.get(model_type)
    if proj is None:
        raise ValueError(f"unsupported mmproj model_type {model_type!r}")

    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model.visual."):
            sd[k[len("model."):]] = np.asarray(v, np.float32)
        elif k.startswith("visual."):
            sd[k] = np.asarray(v, np.float32)
    g = lambda k: sd.get("visual." + k)

    E = int(getattr(vc, "hidden_size", 0) or getattr(vc, "embed_dim", 0))
    depth = int(getattr(vc, "depth", None) or vc.num_hidden_layers)
    heads = int(getattr(vc, "num_heads", None) or vc.num_attention_heads)
    ff = int(getattr(vc, "intermediate_size", 0) or
             getattr(vc, "hidden_size", 0))
    merge = int(getattr(vc, "spatial_merge_size", 2))
    patch = int(getattr(vc, "patch_size", 14))
    out_dim = int(getattr(vc, "out_hidden_size", 0)
                  or getattr(config, "hidden_size", 0)
                  or getattr(config.text_config, "hidden_size", 0))
    npos = int(getattr(vc, "num_position_embeddings", 0) or 0)
    image_size = (int(npos ** 0.5 * patch) if npos
                  else int(getattr(vc, "image_size", 560)))

    w = GGUFWriter(out_path, arch="clip")
    w.add("general.description", "mmproj (vision tower)")
    w.add("clip.projector_type", proj)
    w.add("clip.has_vision_encoder", True)
    w.add("clip.vision.embedding_length", E)
    w.add("clip.vision.feed_forward_length", ff)
    w.add("clip.vision.block_count", depth)
    w.add("clip.vision.projection_dim", out_dim)
    w.add("clip.vision.attention.head_count", heads)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-6)
    w.add("clip.vision.patch_size", patch)
    w.add("clip.vision.image_size", image_size)
    w.add("clip.vision.spatial_merge_size", merge)
    w.add("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    w.add("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])
    if proj == "qwen2.5vl":
        w.add("clip.use_silu", True)
        fb = list(getattr(vc, "fullatt_block_indexes", []) or [])
        if fb:
            w.add("clip.vision.n_wa_pattern", int(fb[0] + 1))
    else:
        w.add("clip.use_gelu", True)
    ds_idx = list(getattr(vc, "deepstack_visual_indexes", []) or [])
    if proj == "qwen3vl":
        w.add("clip.vision.is_deepstack_layers",
              [i in ds_idx for i in range(depth)])

    def put(name, arr):
        if arr is not None:
            w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    conv = g("patch_embed.proj.weight")             # (d, C, kt, ph, pw)
    if conv.ndim == 5 and conv.shape[2] == 2:
        # reference convention: Conv3D split into two Conv2D slices
        put("v.patch_embd.weight", conv[:, :, 0])
        put("v.patch_embd.weight.1", conv[:, :, 1])
    else:
        put("v.patch_embd.weight", conv[:, :, 0] if conv.ndim == 5 else conv)
    put("v.patch_embd.bias", g("patch_embed.proj.bias"))
    put("v.position_embd.weight", g("pos_embed.weight"))

    for il in range(depth):
        hf = f"visual.blocks.{il}."
        gg = f"v.blk.{il}."
        qkv_w, qkv_b = sd.get(hf + "attn.qkv.weight"), sd.get(hf + "attn.qkv.bias")
        if qkv_w is not None:
            c = qkv_w.shape[0] // 3
            for i, nm in enumerate(("attn_q", "attn_k", "attn_v")):
                put(gg + nm + ".weight", qkv_w[i * c:(i + 1) * c])
                if qkv_b is not None:
                    put(gg + nm + ".bias", qkv_b[i * c:(i + 1) * c])
        put(gg + "attn_out.weight", sd.get(hf + "attn.proj.weight"))
        put(gg + "attn_out.bias", sd.get(hf + "attn.proj.bias"))
        put(gg + "ln1.weight", sd.get(hf + "norm1.weight"))
        put(gg + "ln1.bias", sd.get(hf + "norm1.bias"))
        put(gg + "ln2.weight", sd.get(hf + "norm2.weight"))
        put(gg + "ln2.bias", sd.get(hf + "norm2.bias"))
        for hf_n, gg_n in (("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
                           ("mlp.linear_fc1", "ffn_up"),
                           ("mlp.linear_fc2", "ffn_down"),
                           ("mlp.gate_proj", "ffn_gate"),
                           ("mlp.up_proj", "ffn_up"),
                           ("mlp.down_proj", "ffn_down")):
            put(gg + gg_n + ".weight", sd.get(f"{hf}{hf_n}.weight"))
            put(gg + gg_n + ".bias", sd.get(f"{hf}{hf_n}.bias"))

    # merger → llava-style mm.{0,2} + post_ln (visual.merger.ln_q / .norm)
    put("v.post_ln.weight", sd.get("visual.merger.ln_q.weight",
                                   sd.get("visual.merger.norm.weight")))
    put("v.post_ln.bias", sd.get("visual.merger.ln_q.bias",
                                 sd.get("visual.merger.norm.bias")))
    for hf_n, gg_n in (("merger.mlp.0", "mm.0"), ("merger.mlp.2", "mm.2"),
                       ("merger.linear_fc1", "mm.0"),
                       ("merger.linear_fc2", "mm.2")):
        put(gg_n + ".weight", sd.get(f"visual.{hf_n}.weight"))
        put(gg_n + ".bias", sd.get(f"visual.{hf_n}.bias"))

    # qwen3vl deepstack mergers at their ABSOLUTE layer indices
    for pos, abs_il in enumerate(ds_idx):
        base = f"visual.deepstack_merger_list.{pos}."
        put(f"v.deepstack.{abs_il}.norm.weight", sd.get(base + "norm.weight"))
        put(f"v.deepstack.{abs_il}.norm.bias", sd.get(base + "norm.bias"))
        put(f"v.deepstack.{abs_il}.fc1.weight", sd.get(base + "linear_fc1.weight"))
        put(f"v.deepstack.{abs_il}.fc1.bias", sd.get(base + "linear_fc1.bias"))
        put(f"v.deepstack.{abs_il}.fc2.weight", sd.get(base + "linear_fc2.weight"))
        put(f"v.deepstack.{abs_il}.fc2.bias", sd.get(base + "linear_fc2.bias"))
    w.write()


def _convert_mmproj_gemma3(out_path: str, config: Any, state_dict: dict):
    """Gemma3 SigLIP tower + AvgPool projector (clip.cpp PROJECTOR_TYPE_GEMMA3:
    mm.input_projection.weight + mm.soft_emb_norm.weight)."""
    vc = config.vision_config
    pre = "model.vision_tower.vision_model."
    sd = {k: np.asarray(v, np.float32) for k, v in state_dict.items()}
    g = lambda k: sd.get(pre + k)

    w = GGUFWriter(out_path, arch="clip")
    w.add("clip.projector_type", "gemma3")
    w.add("clip.has_vision_encoder", True)
    w.add("clip.use_gelu", True)
    w.add("clip.vision.embedding_length", int(vc.hidden_size))
    w.add("clip.vision.feed_forward_length", int(vc.intermediate_size))
    w.add("clip.vision.block_count", int(vc.num_hidden_layers))
    w.add("clip.vision.projection_dim",
          int(getattr(config.text_config, "hidden_size", 0)))
    w.add("clip.vision.attention.head_count", int(vc.num_attention_heads))
    w.add("clip.vision.attention.layer_norm_epsilon",
          float(getattr(vc, "layer_norm_eps", 1e-6)))
    w.add("clip.vision.patch_size", int(vc.patch_size))
    w.add("clip.vision.image_size", int(vc.image_size))
    w.add("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add("clip.vision.image_std", [0.5, 0.5, 0.5])
    side = int(vc.image_size) // int(vc.patch_size)
    tokens_side = max(1, int(getattr(config, "mm_tokens_per_image", 256) ** 0.5))
    w.add("clip.vision.projector.scale_factor", max(1, side // tokens_side))

    def put(name, arr):
        if arr is not None:
            w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    put("v.patch_embd.weight", g("embeddings.patch_embedding.weight"))
    put("v.patch_embd.bias", g("embeddings.patch_embedding.bias"))
    put("v.position_embd.weight", g("embeddings.position_embedding.weight"))
    put("v.post_ln.weight", g("post_layernorm.weight"))
    put("v.post_ln.bias", g("post_layernorm.bias"))
    put("mm.input_projection.weight",
        sd.get("model.multi_modal_projector.mm_input_projection_weight"))
    put("mm.soft_emb_norm.weight",
        sd.get("model.multi_modal_projector.mm_soft_emb_norm.weight"))
    for il in range(int(vc.num_hidden_layers)):
        hf, gg = f"encoder.layers.{il}.", f"v.blk.{il}."
        for hf_n, gg_n in (("self_attn.q_proj", "attn_q"),
                           ("self_attn.k_proj", "attn_k"),
                           ("self_attn.v_proj", "attn_v"),
                           ("self_attn.out_proj", "attn_out"),
                           ("layer_norm1", "ln1"), ("layer_norm2", "ln2"),
                           ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            put(gg + gg_n + ".weight", g(hf + hf_n + ".weight"))
            put(gg + gg_n + ".bias", g(hf + hf_n + ".bias"))
    w.write()
