"""CLIP-style vision tower + multimodal projector (mtmd counterpart).

Behavioral reference: tools/mtmd/clip.cpp (ViT encoder for llava-family
multimodal models): conv patch embedding, class + position embeddings,
pre-LN, N pre-norm transformer blocks (biased MHA, GELU MLP), post-LN, and a
llava 2-layer MLP projector mapping vision hidden states into the language
model's embedding space. Image tokens are injected through llama_forward's
``embeds`` input (chunked image-token injection)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter
from ..ops import jnp_ref as ops
from .llama import mm


def clip_vision_forward(params: dict, pixel_values: jax.Array,
                        select_layer: int = 0) -> jax.Array:
    """pixel_values (B, C, H, W) → patch features (B, n_patches(+1), D).

    select_layer: 0 = full tower; negative = hidden states after layer
    (n + select_layer) (llava uses -2, CLS dropped at projection). post-LN
    applies only to the pooled CLS (pooled_embedding), matching upstream.
    """
    hp = params["hp"]
    B = pixel_values.shape[0]
    P, D = hp["patch_size"], hp["n_embd"]

    # conv patch embedding == unfold + matmul (stride = kernel = patch)
    x = pixel_values.astype(jnp.float32)
    B_, C, H, W = x.shape
    nh, nw = H // P, W // P
    patches = x.reshape(B, C, nh, P, nw, P).transpose(0, 2, 4, 1, 3, 5)
    patches = patches.reshape(B, nh * nw, C * P * P)
    h = patches @ params["patch_embd"]                    # (B, N, D)
    if params.get("patch_embd_b") is not None:
        h = h + params["patch_embd_b"]
    if params.get("class_embd") is not None:
        cls = jnp.broadcast_to(params["class_embd"][None, None], (B, 1, D))
        h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embd"][: h.shape[1]][None]
    if params.get("pre_ln") is not None:
        h = ops.layer_norm(h, params["pre_ln"], params.get("pre_ln_b"), hp["eps"])

    n_layer = len(params["layers"])
    stop = n_layer + select_layer if select_layer < 0 else n_layer
    Hh = hp["n_head"]
    Dh = D // Hh
    for il, layer in enumerate(params["layers"]):
        if il >= stop:
            break
        r = h
        h2 = ops.layer_norm(h, layer["ln1"], layer["ln1_b"], hp["eps"])
        q = (mm(h2, layer["wq"]) + layer["bq"]).reshape(B, -1, Hh, Dh)
        k = (mm(h2, layer["wk"]) + layer["bk"]).reshape(B, -1, Hh, Dh)
        v = (mm(h2, layer["wv"]) + layer["bv"]).reshape(B, -1, Hh, Dh)
        mask = jnp.zeros((B, 1, q.shape[1], q.shape[1]), jnp.float32)
        attn = ops.attention_ref(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), mask,
                                 scale=1.0 / (Dh ** 0.5))
        h = r + mm(attn.reshape(B, -1, D), layer["wo"]) + layer["bo"]
        r = h
        h2 = ops.layer_norm(h, layer["ln2"], layer["ln2_b"], hp["eps"])
        act = {"quick_gelu": ops.quick_gelu, "gelu_tanh": ops.gelu,
               "gelu_pytorch_tanh": ops.gelu,
               "gelu": ops.gelu_erf}.get(hp.get("act", "quick_gelu"),
                                         ops.quick_gelu)
        ff = act(mm(h2, layer["ffn_up"]) + layer["ffn_up_b"])
        h = r + mm(ff, layer["ffn_down"]) + layer["ffn_down_b"]

    return h


def pooled_embedding(params: dict, hidden: jax.Array) -> jax.Array:
    """Post-LN'd CLS embedding (CLIP pooler_output)."""
    hp = params["hp"]
    return ops.layer_norm(hidden[:, 0], params["post_ln"],
                          params.get("post_ln_b"), hp["eps"])


def project_image_features(params: dict, feats: jax.Array,
                           drop_cls: bool = True) -> jax.Array:
    """llava MLP projector: vision hidden → text embedding space."""
    if drop_cls and params.get("class_embd") is not None:
        feats = feats[:, 1:]
    h = mm(feats, params["mm_0"]) + params["mm_0_b"]
    h = ops.gelu_erf(h)
    return mm(h, params["mm_2"]) + params["mm_2_b"]


# ------------------------------ GGUF I/O -------------------------------------


def convert_clip_vision(out_path: str, config, state_dict: dict,
                        proj_in: int | None = None, proj_out: int | None = None,
                        seed: int = 0) -> None:
    """HF CLIPVisionModel (+ optional llava projector) → mmproj GGUF
    (convert_hf_to_gguf mmproj / clip.cpp tensor naming)."""
    w = GGUFWriter(out_path, arch="clip")
    w.add("general.type", "mmproj")
    w.add("clip.vision.image_size", int(config.image_size))
    w.add("clip.vision.patch_size", int(config.patch_size))
    w.add("clip.vision.embedding_length", int(config.hidden_size))
    w.add("clip.vision.block_count", int(config.num_hidden_layers))
    w.add("clip.vision.attention.head_count", int(config.num_attention_heads))
    w.add("clip.vision.feed_forward_length", int(config.intermediate_size))
    w.add("clip.vision.attention.layer_norm_epsilon",
          float(getattr(config, "layer_norm_eps", 1e-5)))
    w.add("clip.vision.activation",
          str(getattr(config, "hidden_act", "quick_gelu")))

    def get(n):
        t = state_dict.get(n)
        return None if t is None else np.asarray(t, np.float32)

    def put(name, arr):
        if arr is not None:
            w.add_tensor(name, arr, GGMLType.F32)

    pre = "vision_model."
    conv = get(pre + "embeddings.patch_embedding.weight")  # (D, C, P, P)
    put("v.patch_embd.weight", conv.reshape(conv.shape[0], -1))
    put("v.patch_embd.bias", get(pre + "embeddings.patch_embedding.bias"))
    put("v.class_embd", get(pre + "embeddings.class_embedding"))
    put("v.position_embd.weight", get(pre + "embeddings.position_embedding.weight"))
    put("v.pre_ln.weight", get(pre + "pre_layrnorm.weight"))
    put("v.pre_ln.bias", get(pre + "pre_layrnorm.bias"))
    put("v.post_ln.weight", get(pre + "post_layernorm.weight"))
    put("v.post_ln.bias", get(pre + "post_layernorm.bias"))
    for il in range(config.num_hidden_layers):
        hf = f"{pre}encoder.layers.{il}."
        gg = f"v.blk.{il}."
        for a, b in (("self_attn.q_proj", "attn_q"), ("self_attn.k_proj", "attn_k"),
                     ("self_attn.v_proj", "attn_v"), ("self_attn.out_proj", "attn_out"),
                     ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down"),
                     ("layer_norm1", "ln1"), ("layer_norm2", "ln2")):
            put(gg + b + ".weight", get(hf + a + ".weight"))
            put(gg + b + ".bias", get(hf + a + ".bias"))
    # projector: from the state dict if present, else synthesize
    mm0 = get("multi_modal_projector.linear_1.weight")
    mm2 = get("multi_modal_projector.linear_2.weight")
    if mm0 is None and proj_out is not None:
        rng = np.random.default_rng(seed)
        d = proj_in or config.hidden_size
        mm0 = rng.normal(0, 0.02, (proj_out, d)).astype(np.float32)
        mm2 = rng.normal(0, 0.02, (proj_out, proj_out)).astype(np.float32)
        put("mm.0.bias", np.zeros(proj_out, np.float32))
        put("mm.2.bias", np.zeros(proj_out, np.float32))
    else:
        put("mm.0.bias", get("multi_modal_projector.linear_1.bias"))
        put("mm.2.bias", get("multi_modal_projector.linear_2.bias"))
    put("mm.0.weight", mm0)
    put("mm.2.weight", mm2)
    w.write()


def load_mmproj(path: str) -> dict:
    """Read an mmproj GGUF into a params dict for clip_vision_forward."""
    r = GGUFReader(path)
    md = r.metadata

    def g(name, t=True):
        ti = r.tensors.get(name)
        if ti is None:
            return None
        a = ti.astype_f32()
        if t and a.ndim == 2:
            a = a.T
        return jnp.asarray(a)

    params = {
        "hp": {
            "image_size": int(md.get("clip.vision.image_size", 336)),
            "patch_size": int(md["clip.vision.patch_size"]),
            "n_embd": int(md["clip.vision.embedding_length"]),
            "n_head": int(md["clip.vision.attention.head_count"]),
            "eps": float(md.get("clip.vision.attention.layer_norm_epsilon", 1e-5)),
            "act": str(md.get("clip.vision.activation", "quick_gelu")),
        },
        "patch_embd": g("v.patch_embd.weight"),
        "patch_embd_b": g("v.patch_embd.bias", t=False),
        "class_embd": g("v.class_embd", t=False),
        "position_embd": g("v.position_embd.weight", t=False),
        "pre_ln": g("v.pre_ln.weight", t=False),
        "pre_ln_b": g("v.pre_ln.bias", t=False),
        "post_ln": g("v.post_ln.weight", t=False),
        "post_ln_b": g("v.post_ln.bias", t=False),
        "mm_0": g("mm.0.weight"),
        "mm_0_b": g("mm.0.bias", t=False),
        "mm_2": g("mm.2.weight"),
        "mm_2_b": g("mm.2.bias", t=False),
        "layers": [],
    }
    n_layer = int(md["clip.vision.block_count"])
    for il in range(n_layer):
        p = f"v.blk.{il}."
        params["layers"].append({
            "wq": g(p + "attn_q.weight"), "bq": g(p + "attn_q.bias", t=False),
            "wk": g(p + "attn_k.weight"), "bk": g(p + "attn_k.bias", t=False),
            "wv": g(p + "attn_v.weight"), "bv": g(p + "attn_v.bias", t=False),
            "wo": g(p + "attn_out.weight"), "bo": g(p + "attn_out.bias", t=False),
            "ln1": g(p + "ln1.weight", t=False), "ln1_b": g(p + "ln1.bias", t=False),
            "ln2": g(p + "ln2.weight", t=False), "ln2_b": g(p + "ln2.bias", t=False),
            "ffn_up": g(p + "ffn_up.weight"), "ffn_up_b": g(p + "ffn_up.bias", t=False),
            "ffn_down": g(p + "ffn_down.weight"), "ffn_down_b": g(p + "ffn_down.bias", t=False),
        })
    r.close()
    return params
