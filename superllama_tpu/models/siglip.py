"""SigLIP vision tower + Gemma3 multimodal projector (tools/mtmd
siglip.cpp counterpart): patch conv + learned positions (no class token),
pre-LN transformer with tanh-gelu, then Gemma3's avg-pool + RMS-norm +
projection into text-embedding space.

End-to-end parity-tested against Gemma3ForConditionalGeneration.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops


def siglip_vision_forward(params: dict, pixels: jax.Array) -> jax.Array:
    """pixels (B, C, H, W) → patch hidden states (B, N, d)."""
    hpv = params["hp"]
    ps, nh = hpv["patch"], hpv["n_head"]
    B, C, H, W = pixels.shape
    gh, gw = H // ps, W // ps
    patches = (pixels.reshape(B, C, gh, ps, gw, ps)
               .transpose(0, 2, 4, 1, 3, 5).reshape(B, gh * gw, C * ps * ps))
    x = patches.astype(jnp.float32) @ params["patch_w"] + params["patch_b"]
    x = x + params["pos_embd"][None]
    seq, d = x.shape[1], x.shape[2]
    hd = d // nh
    scale = 1.0 / math.sqrt(hd)
    for blk in params["layers"]:
        h = ops.layer_norm(x, blk["ln1_w"], blk["ln1_b"])
        q = (h @ blk["wq"] + blk["bq"]).reshape(B, seq, nh, hd)
        k = (h @ blk["wk"] + blk["bk"]).reshape(B, seq, nh, hd)
        v = (h @ blk["wv"] + blk["bv"]).reshape(B, seq, nh, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, seq, d)
        x = x + (attn @ blk["wo"] + blk["bo"])
        h = ops.layer_norm(x, blk["ln2_w"], blk["ln2_b"])
        h = ops.gelu(h @ blk["fc1"] + blk["fc1_b"])
        x = x + (h @ blk["fc2"] + blk["fc2_b"])
    return ops.layer_norm(x, params["post_ln_w"], params["post_ln_b"])


def gemma3_project(params: dict, x: jax.Array) -> jax.Array:
    """Gemma3MultiModalProjector: avg-pool the patch grid down to
    mm_tokens_per_image, gemma RMS-norm (1+w), project to text dim."""
    B, N, d = x.shape
    side = int(math.isqrt(N))
    tok_side = params["hp"]["tokens_side"]
    k = side // tok_side
    g = x.reshape(B, side, side, d).reshape(B, tok_side, k, tok_side, k, d)
    pooled = g.mean(axis=(2, 4)).reshape(B, tok_side * tok_side, d)
    normed = ops.rms_norm(pooled, 1.0 + params["soft_emb_norm"],
                          params["hp"]["eps"])
    return normed @ params["proj"]


def params_from_hf_gemma3_vision(sd: dict, n_head: int, patch: int,
                                 mm_tokens: int, eps: float = 1e-6) -> dict:
    pre = "model.vision_tower.vision_model."
    g = lambda k: np.asarray(sd[pre + k], np.float32)
    conv = g("embeddings.patch_embedding.weight")           # (d, C, ps, ps)
    params = {
        "hp": {"patch": patch, "n_head": n_head,
               "tokens_side": int(math.isqrt(mm_tokens)), "eps": eps},
        # patch conv as matmul over (C, ps, ps)-flattened patches
        "patch_w": conv.reshape(conv.shape[0], -1).T,
        "patch_b": g("embeddings.patch_embedding.bias"),
        "pos_embd": g("embeddings.position_embedding.weight"),
        "post_ln_w": g("post_layernorm.weight"),
        "post_ln_b": g("post_layernorm.bias"),
        "soft_emb_norm": np.asarray(
            sd["model.multi_modal_projector.mm_soft_emb_norm.weight"], np.float32),
        "proj": np.asarray(
            sd["model.multi_modal_projector.mm_input_projection_weight"], np.float32),
        "layers": [],
    }
    il = 0
    while f"{pre}encoder.layers.{il}.layer_norm1.weight" in sd:
        p = f"encoder.layers.{il}."
        params["layers"].append({
            "ln1_w": g(p + "layer_norm1.weight"), "ln1_b": g(p + "layer_norm1.bias"),
            "ln2_w": g(p + "layer_norm2.weight"), "ln2_b": g(p + "layer_norm2.bias"),
            "wq": g(p + "self_attn.q_proj.weight").T, "bq": g(p + "self_attn.q_proj.bias"),
            "wk": g(p + "self_attn.k_proj.weight").T, "bk": g(p + "self_attn.k_proj.bias"),
            "wv": g(p + "self_attn.v_proj.weight").T, "bv": g(p + "self_attn.v_proj.bias"),
            "wo": g(p + "self_attn.out_proj.weight").T, "bo": g(p + "self_attn.out_proj.bias"),
            "fc1": g(p + "mlp.fc1.weight").T, "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2": g(p + "mlp.fc2.weight").T, "fc2_b": g(p + "mlp.fc2.bias"),
        })
        il += 1
    return params


class Gemma3Multimodal:
    """Image → LM pipeline for gemma3 (llava-style injection; text and image
    embeds share positions, forward scales everything by √E so image features
    are pre-divided)."""

    def __init__(self, model, vision_params: dict, image_token_id: int):
        self.model = model
        self.vp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            vision_params)
        self.image_token_id = image_token_id

    def image_embeds(self, pixels: np.ndarray) -> np.ndarray:
        x = siglip_vision_forward(self.vp, jnp.asarray(pixels, jnp.float32))
        return np.asarray(gemma3_project(self.vp, x))

    def prefill(self, prompt_ids, pixels: np.ndarray, n_ctx: int = 512,
                kv_dtype=jnp.float32):
        from ..models.registry import get_forward
        from ..runtime.kv_cache import kv_cache_init

        hp = self.model.hparams
        ids = np.asarray(prompt_ids, np.int32)
        tok_embd = np.asarray(self.model.params["token_embd"])
        embeds = tok_embd[ids].astype(np.float32)
        img = self.image_embeds(pixels[None] if pixels.ndim == 3 else pixels)
        is_img = ids == self.image_token_id
        # the forward multiplies embeds by f_embedding_scale (√E); image
        # features enter unscaled in HF, so pre-divide
        embeds[is_img] = img.reshape(-1, img.shape[-1]) / hp.f_embedding_scale
        T = len(prompt_ids)
        cache = kv_cache_init(hp.n_layer, 1, n_ctx, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        fwd = get_forward(hp.arch)
        logits, cache = fwd(
            self.model.params, hp, jnp.zeros((1, T), jnp.int32),
            jnp.arange(T, dtype=jnp.int32)[None], cache,
            embeds=jnp.asarray(embeds[None]))
        return logits, cache, T


def params_from_mmproj(path: str, mm_tokens: int = 256) -> dict:
    """Load a gemma3 mmproj GGUF (clip.cpp PROJECTOR_TYPE_GEMMA3 schema)
    into the siglip_vision_forward/gemma3_project params dict."""
    from ..gguf import GGUFReader

    r = GGUFReader(path)
    md = r.metadata

    def g(name, t=True):
        ti = r.tensors.get(name)
        if ti is None:
            return None
        a = ti.astype_f32()
        return a.T if (t and a.ndim == 2) else a

    conv = r.tensors["v.patch_embd.weight"].astype_f32()
    params = {
        "hp": {"patch": int(md["clip.vision.patch_size"]),
               "n_head": int(md["clip.vision.attention.head_count"]),
               "tokens_side": int(math.isqrt(mm_tokens)),
               "eps": float(md.get(
                   "clip.vision.attention.layer_norm_epsilon", 1e-6))},
        "patch_w": conv.reshape(conv.shape[0], -1).T,
        "patch_b": g("v.patch_embd.bias", t=False),
        "pos_embd": g("v.position_embd.weight", t=False),
        "post_ln_w": g("v.post_ln.weight", t=False),
        "post_ln_b": g("v.post_ln.bias", t=False),
        "soft_emb_norm": g("mm.soft_emb_norm.weight", t=False),
        "proj": g("mm.input_projection.weight", t=False),
        "layers": [],
    }
    il = 0
    while f"v.blk.{il}.attn_q.weight" in r.tensors:
        p = f"v.blk.{il}."
        params["layers"].append({
            "ln1_w": g(p + "ln1.weight", t=False),
            "ln1_b": g(p + "ln1.bias", t=False),
            "ln2_w": g(p + "ln2.weight", t=False),
            "ln2_b": g(p + "ln2.bias", t=False),
            "wq": g(p + "attn_q.weight"), "bq": g(p + "attn_q.bias", t=False),
            "wk": g(p + "attn_k.weight"), "bk": g(p + "attn_k.bias", t=False),
            "wv": g(p + "attn_v.weight"), "bv": g(p + "attn_v.bias", t=False),
            "wo": g(p + "attn_out.weight"),
            "bo": g(p + "attn_out.bias", t=False),
            "fc1": g(p + "ffn_up.weight"),
            "fc1_b": g(p + "ffn_up.bias", t=False),
            "fc2": g(p + "ffn_down.weight"),
            "fc2_b": g(p + "ffn_down.bias", t=False),
        })
        il += 1
    r.close()
    return params
