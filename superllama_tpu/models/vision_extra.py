"""InternVL and Pixtral vision towers + projectors (mtmd counterparts).

Behavioral references in the upstream tree:
 - tools/mtmd/models/internvl.cpp — ViT with CLS + learned positions and
   per-layer layer-scale (lambda_1/2), pixel-shuffle by the projector scale
   factor, then LayerNorm + Linear + GELU + Linear into text space.
 - tools/mtmd/models/pixtral.cpp — RMS-norm ViT with 2-D rotary positions
   (build_rope_2d), gated FFN, optional Mistral-3 patch merger, a 2-layer
   GELU projector, and one [IMG_BREAK] token appended per patch row.

Implementations follow the HF modeling semantics (InternVLVisionModel /
PixtralVisionModel) so parity is testable against transformers; the GGUF
mmproj schema stays clip.cpp-compatible (tools/convert_mmproj.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import jnp_ref as ops
from .llama import mm


# ----------------------------- InternVL tower --------------------------------

def internvl_vision_forward(params: dict, pixel_values: jax.Array) -> jax.Array:
    """(B, C, H, W) → (B, 1+n_patches, D): BEiT-style ViT with CLS token,
    learned positions, layer-scale residuals (lambda_1/2), pre/post LN."""
    hp = params["hp"]
    P, D, Hh = hp["patch_size"], hp["n_embd"], hp["n_head"]
    eps = hp["eps"]
    x = pixel_values.astype(jnp.float32)
    B, C, H, W = x.shape
    nh, nw = H // P, W // P
    patches = x.reshape(B, C, nh, P, nw, P).transpose(0, 2, 4, 1, 3, 5)
    patches = patches.reshape(B, nh * nw, C * P * P)
    h = patches @ params["patch_embd"] + params["patch_embd_b"]
    cls = jnp.broadcast_to(params["class_embd"][None, None], (B, 1, D))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + params["position_embd"][: h.shape[1]][None]

    Dh = D // Hh
    rms = hp.get("norm", "layer_norm") == "rms_norm"

    def norm(v, w, b):
        return (ops.rms_norm(v, w, eps) if rms
                else ops.layer_norm(v, w, b, eps))

    for layer in params["layers"]:
        h2 = norm(h, layer["ln1"], layer.get("ln1_b"))
        q = mm(h2, layer["wq"]).reshape(B, -1, Hh, Dh)
        k = mm(h2, layer["wk"]).reshape(B, -1, Hh, Dh)
        v = mm(h2, layer["wv"]).reshape(B, -1, Hh, Dh)
        if layer.get("bq") is not None:
            q = q + layer["bq"].reshape(1, 1, Hh, Dh)
            v = v + layer["bv"].reshape(1, 1, Hh, Dh)
        if layer.get("q_norm") is not None:          # 6B ViT qk-norm
            q = ops.rms_norm(q.reshape(B, -1, D), layer["q_norm"],
                             eps).reshape(B, -1, Hh, Dh)
            k = ops.rms_norm(k.reshape(B, -1, D), layer["k_norm"],
                             eps).reshape(B, -1, Hh, Dh)
        mask = jnp.zeros((B, 1, q.shape[1], q.shape[1]), jnp.float32)
        attn = ops.attention_ref(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), mask,
                                 scale=1.0 / (Dh ** 0.5))
        o = mm(attn.reshape(B, -1, D), layer["wo"]) + layer["wo_b"]
        h = h + o * layer["ls1"]
        h2 = norm(h, layer["ln2"], layer.get("ln2_b"))
        ff = ops.gelu_erf(mm(h2, layer["ffn_up"]) + layer["ffn_up_b"])
        ff = mm(ff, layer["ffn_down"]) + layer["ffn_down_b"]
        h = h + ff * layer["ls2"]
    if params.get("post_ln") is not None:
        h = norm(h, params["post_ln"], params.get("post_ln_b"))
    return h


def pixel_shuffle(x: jax.Array, nh: int, nw: int, scale: int) -> jax.Array:
    """(B, nh·nw, D) → (B, nh·nw/scale², D·scale²) — the InternVL/Idefics3
    pixel-unshuffle (internvl.cpp:31-50 permute chain, HF pixel_shuffle)."""
    B, N, D = x.shape
    x = x.reshape(B, nh, nw, D)
    x = x.reshape(B, nh, nw // scale, D * scale)
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(B, nw // scale, nh // scale, D * scale * scale)
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(B, (nh // scale) * (nw // scale), D * scale * scale)


def internvl_project(params: dict, feats: jax.Array, nh: int, nw: int
                     ) -> jax.Array:
    """Drop CLS → pixel shuffle → LayerNorm + Linear + GELU + Linear
    (internvl.cpp:52-64; projector LN eps = 1e-5)."""
    hp = params["hp"]
    x = pixel_shuffle(feats[:, 1:], nh, nw, int(hp.get("n_merge", 2)))
    x = ops.layer_norm(x, params["mm_0"], params["mm_0_b"], 1e-5)
    x = ops.gelu_erf(mm(x, params["mm_1"]) + params["mm_1_b"])
    return mm(x, params["mm_3"]) + params["mm_3_b"]


# ------------------------------ Pixtral tower ---------------------------------

def _rope_2d(q: jax.Array, pos_h: jax.Array, pos_w: jax.Array,
             theta: float) -> jax.Array:
    """2-D rotary embedding over a patch grid (build_rope_2d semantics =
    HF PixtralRotaryEmbedding): head-dim frequency slots alternate between
    the row and column coordinate, rotate-half application."""
    B, N, Hh, Dh = q.shape
    idx = jnp.arange(Dh // 2, dtype=jnp.float32)
    inv = theta ** (-2.0 * idx / Dh)                   # (Dh/2,)
    fh, fw = inv[0::2], inv[1::2]
    ang = jnp.concatenate(
        [pos_h.astype(jnp.float32)[:, None] * fh[None, :],
         pos_w.astype(jnp.float32)[:, None] * fw[None, :]], axis=-1)  # (N, Dh/2)
    emb = jnp.concatenate([ang, ang], axis=-1)          # (N, Dh)
    cos = jnp.cos(emb)[None, :, None, :]
    sin = jnp.sin(emb)[None, :, None, :]
    qr = jnp.concatenate([-q[..., Dh // 2:], q[..., : Dh // 2]], axis=-1)
    return q * cos + qr * sin


def pixtral_vision_forward(params: dict, pixel_values: jax.Array) -> jax.Array:
    """(B, C, H, W) → (B, n_patches, D): RMS-norm ViT, 2-D rope, gated FFN
    (pixtral.cpp builder / HF PixtralVisionModel)."""
    hp = params["hp"]
    P, D, Hh = hp["patch_size"], hp["n_embd"], hp["n_head"]
    eps = hp["eps"]
    theta = float(hp.get("rope_theta", 10000.0))
    x = pixel_values.astype(jnp.float32)
    B, C, H, W = x.shape
    nh, nw = H // P, W // P
    patches = x.reshape(B, C, nh, P, nw, P).transpose(0, 2, 4, 1, 3, 5)
    patches = patches.reshape(B, nh * nw, C * P * P)
    h = patches @ params["patch_embd"]
    h = ops.rms_norm(h, params["pre_ln"], eps)

    grid_h = jnp.repeat(jnp.arange(nh, dtype=jnp.int32), nw)
    grid_w = jnp.tile(jnp.arange(nw, dtype=jnp.int32), nh)
    Dh = D // Hh
    act = {"silu": ops.silu, "gelu": ops.gelu_erf,
           "gelu_pytorch_tanh": ops.gelu}.get(hp.get("act", "silu"), ops.silu)
    for layer in params["layers"]:
        h2 = ops.rms_norm(h, layer["ln1"], eps)
        q = mm(h2, layer["wq"]).reshape(B, -1, Hh, Dh)
        k = mm(h2, layer["wk"]).reshape(B, -1, Hh, Dh)
        v = mm(h2, layer["wv"]).reshape(B, -1, Hh, Dh)
        q = _rope_2d(q, grid_h, grid_w, theta)
        k = _rope_2d(k, grid_h, grid_w, theta)
        mask = jnp.zeros((B, 1, q.shape[1], q.shape[1]), jnp.float32)
        attn = ops.attention_ref(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3), mask,
                                 scale=1.0 / (Dh ** 0.5))
        h = h + mm(attn.reshape(B, -1, D), layer["wo"])
        h2 = ops.rms_norm(h, layer["ln2"], eps)
        h = h + mm(act(mm(h2, layer["ffn_gate"])) * mm(h2, layer["ffn_up"]),
                   layer["ffn_down"])
    return h


def pixtral_project(params: dict, feats: jax.Array, nh: int, nw: int
                    ) -> jax.Array:
    """Optional Mistral-3 patch merger → 2-layer GELU projector → one
    [IMG_BREAK] embedding appended per patch row except the last
    (pixtral.cpp:29-85)."""
    hp = params["hp"]
    x = feats
    merge = int(hp.get("n_merge", 1) or 1)
    if params.get("patch_merger") is not None and merge > 1:
        x = ops.rms_norm(x, params["mm_input_norm"], hp["eps"])
        B, N, D = x.shape
        g = x.reshape(B, nh, nw, D)
        g = g.reshape(B, nh // merge, merge, nw // merge, merge, D)
        g = jnp.transpose(g, (0, 1, 3, 2, 4, 5))       # unfold patches
        g = g.reshape(B, (nh // merge) * (nw // merge), merge * merge * D)
        x = mm(g, params["patch_merger"])
        nh, nw = nh // merge, nw // merge
    x = ops.gelu_erf(mm(x, params["mm_1"])
                     + (params.get("mm_1_b") if params.get("mm_1_b")
                        is not None else 0.0))
    x = mm(x, params["mm_2"])
    if params.get("mm_2_b") is not None:
        x = x + params["mm_2_b"]
    if params.get("img_break") is not None:
        B, N, E = x.shape
        rows = x.reshape(B, nh, nw, E)
        brk = jnp.broadcast_to(params["img_break"][None, None, None],
                               (B, nh, 1, E))
        rows = jnp.concatenate([rows, brk], axis=2).reshape(B, nh * (nw + 1), E)
        return rows[:, : nh * (nw + 1) - 1]            # no break after last row
    return x


# --------------------------- HF state-dict mappers ----------------------------

def params_from_hf_internvl(vis_sd: dict, cfg, proj_sd: dict | None = None,
                            n_merge: int = 2) -> dict:
    """InternVLVisionModel (+ optional multi_modal_projector) state dict →
    tower params."""
    g = lambda k: jnp.asarray(np.asarray(vis_sd[k], np.float32))
    t = lambda k: g(k).T
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}."
        lay = {
            "ln1": g(p + "layernorm_before.weight"),
            "ln1_b": g(p + "layernorm_before.bias"),
            "ln2": g(p + "layernorm_after.weight"),
            "ln2_b": g(p + "layernorm_after.bias"),
            "wq": t(p + "attention.q_proj.weight"),
            "wk": t(p + "attention.k_proj.weight"),
            "wv": t(p + "attention.v_proj.weight"),
            "wo": t(p + "attention.projection_layer.weight"),
            "wo_b": g(p + "attention.projection_layer.bias"),
            "ffn_up": t(p + "mlp.fc1.weight"),
            "ffn_up_b": g(p + "mlp.fc1.bias"),
            "ffn_down": t(p + "mlp.fc2.weight"),
            "ffn_down_b": g(p + "mlp.fc2.bias"),
            "ls1": g(p + "lambda_1"),
            "ls2": g(p + "lambda_2"),
        }
        if vis_sd.get(p + "attention.q_proj.bias") is not None:
            lay["bq"] = g(p + "attention.q_proj.bias")
            lay["bv"] = g(p + "attention.v_proj.bias")
        layers.append(lay)
    conv = np.asarray(vis_sd["embeddings.patch_embeddings.projection.weight"],
                      np.float32)
    patch = cfg.patch_size
    if not isinstance(patch, int):      # InternVL configs carry (ph, pw)
        patch = int(patch[0])
    out = {
        "hp": {"patch_size": patch, "n_embd": cfg.hidden_size,
               "n_head": cfg.num_attention_heads,
               "eps": float(cfg.layer_norm_eps), "n_merge": n_merge,
               "norm": getattr(cfg, "norm_type", "layer_norm")},
        "patch_embd": jnp.asarray(conv.reshape(conv.shape[0], -1).T),
        "patch_embd_b": g("embeddings.patch_embeddings.projection.bias"),
        "class_embd": g("embeddings.cls_token").reshape(-1),
        "position_embd": g("embeddings.position_embeddings").reshape(
            -1, cfg.hidden_size),
        "layers": layers,
    }
    if vis_sd.get("layernorm.weight") is not None:
        out["post_ln"] = g("layernorm.weight")
        out["post_ln_b"] = g("layernorm.bias")
    if proj_sd:
        pg = lambda k: jnp.asarray(np.asarray(proj_sd[k], np.float32))
        out.update({
            "mm_0": pg("layer_norm.weight"), "mm_0_b": pg("layer_norm.bias"),
            "mm_1": pg("linear_1.weight").T, "mm_1_b": pg("linear_1.bias"),
            "mm_3": pg("linear_2.weight").T, "mm_3_b": pg("linear_2.bias"),
        })
    return out


def params_from_hf_pixtral(vis_sd: dict, cfg, proj_sd: dict | None = None
                           ) -> dict:
    """PixtralVisionModel (+ optional llava projector) state dict → params."""
    g = lambda k: jnp.asarray(np.asarray(vis_sd[k], np.float32))
    t = lambda k: g(k).T
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.layers.{i}."
        layers.append({
            "ln1": g(p + "attention_norm.weight"),
            "ln2": g(p + "ffn_norm.weight"),
            "wq": t(p + "attention.q_proj.weight"),
            "wk": t(p + "attention.k_proj.weight"),
            "wv": t(p + "attention.v_proj.weight"),
            "wo": t(p + "attention.o_proj.weight"),
            "ffn_gate": t(p + "feed_forward.gate_proj.weight"),
            "ffn_up": t(p + "feed_forward.up_proj.weight"),
            "ffn_down": t(p + "feed_forward.down_proj.weight"),
        })
    conv = np.asarray(vis_sd["patch_conv.weight"], np.float32)
    out = {
        "hp": {"patch_size": cfg.patch_size, "n_embd": cfg.hidden_size,
               "n_head": cfg.num_attention_heads,
               "eps": 1e-5, "act": cfg.hidden_act,
               "rope_theta": getattr(cfg, "rope_theta", 10000.0),
               "n_merge": 1},
        "patch_embd": jnp.asarray(conv.reshape(conv.shape[0], -1).T),
        "pre_ln": g("ln_pre.weight"),
        "layers": layers,
    }
    if proj_sd:
        pg = lambda k: jnp.asarray(np.asarray(proj_sd[k], np.float32))
        out["mm_1"] = pg("linear_1.weight").T
        out["mm_2"] = pg("linear_2.weight").T
        if proj_sd.get("linear_1.bias") is not None:
            out["mm_1_b"] = pg("linear_1.bias")
            out["mm_2_b"] = pg("linear_2.bias")
    return out


# ------------------------------ GGUF mmproj I/O -------------------------------
# clip.cpp schema (tools/mtmd/clip-impl.h tensor/KV names) so files written
# here and ecosystem mmproj files are interchangeable.

def convert_internvl_mmproj(out_path: str, cfg, vis_sd: dict,
                            proj_sd: dict | None = None,
                            n_merge: int = 2) -> None:
    from ..gguf import GGMLType, GGUFWriter

    p = params_from_hf_internvl(vis_sd, cfg, proj_sd, n_merge=n_merge)
    hp = p["hp"]
    w = GGUFWriter(out_path, arch="clip")
    w.add("general.type", "mmproj")
    w.add("clip.projector_type", "internvl")
    w.add("clip.vision.image_size", int(getattr(cfg, "image_size", 0)[0]
          if not isinstance(getattr(cfg, "image_size", 448), int)
          else cfg.image_size))
    w.add("clip.vision.patch_size", hp["patch_size"])
    w.add("clip.vision.embedding_length", hp["n_embd"])
    w.add("clip.vision.block_count", len(p["layers"]))
    w.add("clip.vision.attention.head_count", hp["n_head"])
    w.add("clip.vision.attention.layer_norm_epsilon", hp["eps"])
    w.add("clip.vision.projector.scale_factor", int(hp["n_merge"]))

    def put(name, arr):
        if arr is not None:
            w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    put("v.patch_embd.weight", np.asarray(p["patch_embd"]).T)
    put("v.patch_embd.bias", p["patch_embd_b"])
    put("v.class_embd", p["class_embd"])
    put("v.position_embd.weight", p["position_embd"])
    put("v.post_ln.weight", p.get("post_ln"))
    put("v.post_ln.bias", p.get("post_ln_b"))
    for i, l in enumerate(p["layers"]):
        pre = f"v.blk.{i}."
        put(pre + "ln1.weight", l["ln1"])
        put(pre + "ln1.bias", l.get("ln1_b"))
        put(pre + "ln2.weight", l["ln2"])
        put(pre + "ln2.bias", l.get("ln2_b"))
        put(pre + "attn_q.weight", np.asarray(l["wq"]).T)
        put(pre + "attn_k.weight", np.asarray(l["wk"]).T)
        put(pre + "attn_v.weight", np.asarray(l["wv"]).T)
        put(pre + "attn_q.bias", l.get("bq"))
        put(pre + "attn_v.bias", l.get("bv"))
        put(pre + "attn_out.weight", np.asarray(l["wo"]).T)
        put(pre + "attn_out.bias", l["wo_b"])
        put(pre + "ffn_up.weight", np.asarray(l["ffn_up"]).T)
        put(pre + "ffn_up.bias", l["ffn_up_b"])
        put(pre + "ffn_down.weight", np.asarray(l["ffn_down"]).T)
        put(pre + "ffn_down.bias", l["ffn_down_b"])
        put(pre + "ls1.weight", l["ls1"])
        put(pre + "ls2.weight", l["ls2"])
    if "mm_0" in p:
        put("mm.model.mlp.0.weight", p["mm_0"])
        put("mm.model.mlp.0.bias", p["mm_0_b"])
        put("mm.model.mlp.1.weight", np.asarray(p["mm_1"]).T)
        put("mm.model.mlp.1.bias", p["mm_1_b"])
        put("mm.model.mlp.3.weight", np.asarray(p["mm_3"]).T)
        put("mm.model.mlp.3.bias", p["mm_3_b"])
    w.write()


def convert_pixtral_mmproj(out_path: str, cfg, vis_sd: dict,
                           proj_sd: dict | None = None,
                           img_break: np.ndarray | None = None) -> None:
    from ..gguf import GGMLType, GGUFWriter

    p = params_from_hf_pixtral(vis_sd, cfg, proj_sd)
    hp = p["hp"]
    w = GGUFWriter(out_path, arch="clip")
    w.add("general.type", "mmproj")
    w.add("clip.projector_type", "pixtral")
    w.add("clip.vision.image_size", int(cfg.image_size))
    w.add("clip.vision.patch_size", hp["patch_size"])
    w.add("clip.vision.embedding_length", hp["n_embd"])
    w.add("clip.vision.block_count", len(p["layers"]))
    w.add("clip.vision.attention.head_count", hp["n_head"])
    w.add("clip.vision.attention.layer_norm_epsilon", hp["eps"])
    w.add("clip.vision.activation", str(hp["act"]))
    w.add("clip.vision.rope.freq_base", float(hp["rope_theta"]))

    def put(name, arr):
        if arr is not None:
            w.add_tensor(name, np.asarray(arr, np.float32), GGMLType.F32)

    put("v.patch_embd.weight", np.asarray(p["patch_embd"]).T)
    put("v.pre_ln.weight", p["pre_ln"])
    for i, l in enumerate(p["layers"]):
        pre = f"v.blk.{i}."
        put(pre + "ln1.weight", l["ln1"])
        put(pre + "ln2.weight", l["ln2"])
        put(pre + "attn_q.weight", np.asarray(l["wq"]).T)
        put(pre + "attn_k.weight", np.asarray(l["wk"]).T)
        put(pre + "attn_v.weight", np.asarray(l["wv"]).T)
        put(pre + "attn_out.weight", np.asarray(l["wo"]).T)
        put(pre + "ffn_gate.weight", np.asarray(l["ffn_gate"]).T)
        put(pre + "ffn_up.weight", np.asarray(l["ffn_up"]).T)
        put(pre + "ffn_down.weight", np.asarray(l["ffn_down"]).T)
    if "mm_1" in p:
        put("mm.1.weight", np.asarray(p["mm_1"]).T)
        put("mm.1.bias", p.get("mm_1_b"))
        put("mm.2.weight", np.asarray(p["mm_2"]).T)
        put("mm.2.bias", p.get("mm_2_b"))
    put("v.token_embd.img_break", img_break)
    w.write()


def params_from_mmproj_extra(path: str) -> dict:
    """Load an internvl/pixtral mmproj GGUF back into tower params."""
    from ..gguf import GGUFReader

    r = GGUFReader(path)
    md = r.metadata
    proj = str(md.get("clip.projector_type", ""))

    def g(name, t=True):
        ti = r.tensors.get(name)
        if ti is None:
            return None
        a = ti.astype_f32()
        if t and a.ndim == 2:
            a = a.T
        return jnp.asarray(a)

    n_layer = int(md["clip.vision.block_count"])
    hp = {"patch_size": int(md["clip.vision.patch_size"]),
          "n_embd": int(md["clip.vision.embedding_length"]),
          "n_head": int(md["clip.vision.attention.head_count"]),
          "eps": float(md.get("clip.vision.attention.layer_norm_epsilon",
                              1e-5)),
          "image_size": int(md.get("clip.vision.image_size", 336)),
          "projector": proj}
    layers = []
    for i in range(n_layer):
        pre = f"v.blk.{i}."
        lay = {"ln1": g(pre + "ln1.weight", False),
               "ln1_b": g(pre + "ln1.bias", False),
               "ln2": g(pre + "ln2.weight", False),
               "ln2_b": g(pre + "ln2.bias", False),
               "wq": g(pre + "attn_q.weight"),
               "wk": g(pre + "attn_k.weight"),
               "wv": g(pre + "attn_v.weight"),
               "wo": g(pre + "attn_out.weight"),
               "wo_b": g(pre + "attn_out.bias", False),
               "bq": g(pre + "attn_q.bias", False),
               "bv": g(pre + "attn_v.bias", False),
               "ffn_up": g(pre + "ffn_up.weight"),
               "ffn_up_b": g(pre + "ffn_up.bias", False),
               "ffn_gate": g(pre + "ffn_gate.weight"),
               "ffn_down": g(pre + "ffn_down.weight"),
               "ffn_down_b": g(pre + "ffn_down.bias", False),
               "ls1": g(pre + "ls1.weight", False),
               "ls2": g(pre + "ls2.weight", False)}
        layers.append(lay)
    out = {"hp": hp, "layers": layers,
           "patch_embd": g("v.patch_embd.weight"),
           "patch_embd_b": g("v.patch_embd.bias", False),
           "class_embd": g("v.class_embd", False),
           "position_embd": g("v.position_embd.weight", False),
           "pre_ln": g("v.pre_ln.weight", False),
           "post_ln": g("v.post_ln.weight", False),
           "post_ln_b": g("v.post_ln.bias", False)}
    if proj == "internvl":
        hp["n_merge"] = int(md.get("clip.vision.projector.scale_factor", 2))
        out.update({"mm_0": g("mm.model.mlp.0.weight", False),
                    "mm_0_b": g("mm.model.mlp.0.bias", False),
                    "mm_1": g("mm.model.mlp.1.weight"),
                    "mm_1_b": g("mm.model.mlp.1.bias", False),
                    "mm_3": g("mm.model.mlp.3.weight"),
                    "mm_3_b": g("mm.model.mlp.3.bias", False)})
    else:
        hp["act"] = str(md.get("clip.vision.activation", "silu"))
        hp["rope_theta"] = float(md.get("clip.vision.rope.freq_base", 1e4))
        hp["n_merge"] = int(md.get("clip.vision.spatial_merge_size", 1))
        out.update({"mm_1": g("mm.1.weight"),
                    "mm_1_b": g("mm.1.bias", False),
                    "mm_2": g("mm.2.weight"),
                    "mm_2_b": g("mm.2.bias", False),
                    "img_break": g("v.token_embd.img_break", False),
                    "mm_input_norm": g("mm.input_norm.weight", False),
                    "patch_merger": g("mm.patch_merger.weight")})
    r.close()
    return out


def encode_image_extra(params: dict, pixel_values: jax.Array) -> jax.Array:
    """Tower + projector dispatch for internvl/pixtral mmproj params:
    (B, C, H, W) → (B, n_tokens, n_embd_text)."""
    hp = params["hp"]
    P = hp["patch_size"]
    nh, nw = pixel_values.shape[-2] // P, pixel_values.shape[-1] // P
    if hp["projector"] == "internvl":
        feats = internvl_vision_forward(params, pixel_values)
        return internvl_project(params, feats, nh, nw)
    feats = pixtral_vision_forward(params, pixel_values)
    return pixtral_project(params, feats, nh, nw)


# --------------------------- MiniCPM-V resampler ------------------------------

def minicpmv_sincos_pos(pos_h: np.ndarray, pos_w: np.ndarray,
                        n_embd_proj: int) -> jax.Array:
    """2-D sinusoidal position table for the resampler's K side
    (minicpmv.cpp:47-68; layout [sin θw ‖ cos θw ‖ sin θh ‖ cos θh])."""
    q = n_embd_proj // 4
    omega = 1.0 / (10000.0 ** (np.arange(q, dtype=np.float32) / q))
    tw = pos_w.astype(np.float32)[:, None] * omega[None, :]
    th = pos_h.astype(np.float32)[:, None] * omega[None, :]
    return jnp.asarray(np.concatenate(
        [np.sin(tw), np.cos(tw), np.sin(th), np.cos(th)], axis=-1))


def minicpmv_resample(params: dict, feats: jax.Array, nh: int, nw: int
                      ) -> jax.Array:
    """Perceiver resampler (minicpmv.cpp:38-110): learned queries
    cross-attend the ViT features; sincos 2-D positions add to K only;
    post-LN + projection into text space."""
    hp = params["hp"]
    eps = hp["eps"]
    B, N, _ = feats.shape
    E = params["rs_query"].shape[-1]
    d_head = 128 if E % 128 == 0 else E // max(1, hp.get("rs_heads", 1))
    n_head = E // d_head
    nq = params["rs_query"].shape[0]

    q = ops.layer_norm(params["rs_query"], params["rs_ln_q"],
                       params["rs_ln_q_b"], eps)           # (nq, E)
    v = mm(feats, params["rs_kv_proj"])                    # (B, N, E)
    v = ops.layer_norm(v, params["rs_ln_kv"], params["rs_ln_kv_b"], eps)
    gh = np.repeat(np.arange(nh, dtype=np.float32), nw)
    gw = np.tile(np.arange(nw, dtype=np.float32), nh)
    k = v + minicpmv_sincos_pos(gh, gw, E)[None]

    Q = (mm(q, params["rs_wq"]) + params["rs_wq_b"])       # (nq, E)
    K = (mm(k, params["rs_wk"]) + params["rs_wk_b"])       # (B, N, E)
    V = (mm(v, params["rs_wv"]) + params["rs_wv_b"])
    Qh = jnp.broadcast_to(Q.reshape(1, nq, n_head, d_head),
                          (B, nq, n_head, d_head))
    mask = jnp.zeros((B, 1, nq, N), jnp.float32)
    attn = ops.attention_ref(
        Qh, K.reshape(B, N, n_head, d_head).transpose(0, 2, 1, 3),
        V.reshape(B, N, n_head, d_head).transpose(0, 2, 1, 3), mask,
        scale=1.0 / (d_head ** 0.5))
    out = mm(attn.reshape(B, nq, E), params["rs_wo"]) + params["rs_wo_b"]
    out = ops.layer_norm(out, params["rs_ln_post"], params["rs_ln_post_b"],
                         eps)
    return mm(out, params["rs_proj"])


# ------------------------------ Idefics3 connector ----------------------------

def params_from_hf_idefics3_vision(vis_sd: dict, cfg) -> dict:
    """Idefics3VisionTransformer state dict → siglip-tower params (the
    reference routes idefics3 through clip_graph_siglip, clip.cpp:780)."""
    g = lambda k: jnp.asarray(np.asarray(vis_sd[k], np.float32))
    t = lambda k: g(k).T
    conv = np.asarray(vis_sd["embeddings.patch_embedding.weight"], np.float32)
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        layers.append({
            "ln1_w": g(p + "layer_norm1.weight"),
            "ln1_b": g(p + "layer_norm1.bias"),
            "ln2_w": g(p + "layer_norm2.weight"),
            "ln2_b": g(p + "layer_norm2.bias"),
            "wq": t(p + "self_attn.q_proj.weight"),
            "bq": g(p + "self_attn.q_proj.bias"),
            "wk": t(p + "self_attn.k_proj.weight"),
            "bk": g(p + "self_attn.k_proj.bias"),
            "wv": t(p + "self_attn.v_proj.weight"),
            "bv": g(p + "self_attn.v_proj.bias"),
            "wo": t(p + "self_attn.out_proj.weight"),
            "bo": g(p + "self_attn.out_proj.bias"),
            "fc1": t(p + "mlp.fc1.weight"), "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2": t(p + "mlp.fc2.weight"), "fc2_b": g(p + "mlp.fc2.bias"),
        })
    # Idefics3 position ids come from torch.bucketize over fractional patch
    # coords — for an n×n grid that is [searchsorted(arange(1/n,1,1/n), k/n)]
    # per axis, NOT arange (e.g. [0,0,1,2] at n=4). Bake the gathered table
    # so the shared siglip tower's plain add matches HF inference.
    side = cfg.image_size // cfg.patch_size
    bounds = np.arange(1, side, dtype=np.float64) / side
    frac = np.arange(side, dtype=np.float64) / side
    b = np.searchsorted(bounds, frac, side="left")
    pos_ids = (b[:, None] * side + b[None, :]).reshape(-1)
    posw = np.asarray(vis_sd["embeddings.position_embedding.weight"],
                      np.float32)
    return {
        "hp": {"patch": cfg.patch_size, "n_head": cfg.num_attention_heads},
        "patch_w": jnp.asarray(conv.reshape(conv.shape[0], -1).T),
        "patch_b": g("embeddings.patch_embedding.bias"),
        "pos_embd": jnp.asarray(posw[pos_ids]),
        "post_ln_w": g("post_layernorm.weight"),
        "post_ln_b": g("post_layernorm.bias"),
        "layers": layers,
    }


def idefics3_project(params: dict, feats: jax.Array, nh: int, nw: int,
                     scale: int) -> jax.Array:
    """Idefics3Connector: pixel shuffle by the scale factor then one
    modality projection (clip.cpp PROJECTOR_TYPE_IDEFICS3 'projection')."""
    return mm(pixel_shuffle(feats, nh, nw, scale), params["projection"])


# ------------------------------ GLM-Edge adapter ------------------------------

def glm_edge_project(params: dict, feats: jax.Array, nh: int, nw: int
                     ) -> jax.Array:
    """GLM-Edge adapter (tools/mtmd/models/llava.cpp:337-365): a 2×2/stride-2
    conv merges each patch quad, then an MLP with an inner LayerNorm, GELU,
    a split swiglu (silu(mlp_2(h)) ⊙ mlp_1(h)) and a final projection;
    learned [BOI]/[EOI] embeddings wrap the image tokens (they exist only in
    the vision weights, not the text vocab)."""
    hp = params["hp"]
    B, N, D = feats.shape
    w = np.asarray(params["adapter_conv"])          # (D_out, D, 2, 2)
    d_out = w.shape[0]
    g = feats.reshape(B, nh, nw, D)
    blocks = g.reshape(B, nh // 2, 2, nw // 2, 2, D)
    blocks = jnp.transpose(blocks, (0, 1, 3, 5, 2, 4))   # (B,H2,W2,D,2,2)
    flat = blocks.reshape(B, (nh // 2) * (nw // 2), D * 4)
    wf = jnp.asarray(w.reshape(d_out, D * 4)).T
    e = flat @ wf + params["adapter_conv_b"]
    e = mm(e, params["mlp_0"])
    e = ops.layer_norm(e, params["ln_q"], params["ln_q_b"], hp["eps"])
    e = ops.gelu(e)
    e = ops.silu(mm(e, params["mlp_2"])) * mm(e, params["mlp_1"])
    e = mm(e, params["mlp_3"])
    boi = jnp.broadcast_to(params["boi"][None, None], (B, 1, e.shape[-1]))
    eoi = jnp.broadcast_to(params["eoi"][None, None], (B, 1, e.shape[-1]))
    return jnp.concatenate([boi, e, eoi], axis=1)
