"""Qwen2-VL vision tower + M-RoPE (tools/mtmd/models/qwen2vl.cpp
counterpart): native-resolution ViT with 2-D rotary embeddings and a
spatial-merge projector, plus the multimodal rotary op the LM applies over
(temporal, height, width) position streams.

Parity-tested against transformers' Qwen2VisionTransformerPretrainedModel
and apply_multimodal_rotary_pos_emb. Text-only inputs degenerate to the
standard qwen2 forward (equal t/h/w positions ≡ 1-D rope), which is why the
LM side needs no changes until image spans are injected.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops


def _imrope_owner(sections, half: int) -> np.ndarray:
    """Interleaved owner per frequency slot (Qwen3-VL IMROPE,
    ggml-cpu/ops.cpp:5600): slot s → h when s%3==1 ∧ s<3·sec[1], w when
    s%3==2 ∧ s<3·sec[2], t when s%3==0 ∧ s<3·sec[0], else the t stream."""
    own = np.zeros(half, np.int64)
    for s in range(half):
        if s % 3 == 1 and s < 3 * sections[1]:
            own[s] = 1
        elif s % 3 == 2 and s < 3 * sections[2]:
            own[s] = 2
        elif s % 3 == 0 and s < 3 * sections[0]:
            own[s] = 0
        else:
            own[s] = 3   # theta_e: the 4th stream (0 for text tokens)
    return own


def mrope_apply(x: jax.Array, pos3: jax.Array, inv_freq: jax.Array,
                sections: tuple[int, ...],
                interleaved: bool = False) -> jax.Array:
    """Multimodal rotary (Qwen2-VL M-RoPE): x (B, T, H, D); pos3 (3, B, T)
    temporal/height/width positions; sections are quarter-dim counts per
    stream (HF mrope_section, e.g. (16, 24, 24) for D=128). Each frequency
    slot picks the position stream its section owns; layout is NEOX
    (half-split rotate). interleaved=True selects the Qwen3-VL IMROPE
    slot→stream mapping."""
    D = x.shape[-1]
    half = D // 2
    sec = np.asarray(sections[:3])
    if interleaved:
        owner = _imrope_owner(sec, half)                   # (half,) in 0..3
    else:
        owner = np.repeat(np.arange(3), sec)[:half]        # (half,)
    if pos3.shape[0] == 3:   # stream 3 ("e") is all-zero for text tokens
        pos3 = jnp.concatenate([pos3, jnp.zeros_like(pos3[:1])], axis=0)
    angles = pos3[..., None].astype(jnp.float32) * inv_freq  # (4,B,T,half)
    ang = jnp.take_along_axis(
        angles, jnp.asarray(owner)[None, None, None, :].repeat(
            angles.shape[1], 1).repeat(angles.shape[2], 2), axis=0)[0]
    cos = jnp.cos(ang)[:, :, None, :]                       # (B,T,1,half)
    sin = jnp.sin(ang)[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _vision_rope_tables(grid_thw, head_dim: int, merge: int):
    """(cos, sin) (seq, head_dim) for the 2-D vision rotary, patch order =
    spatial-merge blocks (rot_pos_emb semantics)."""
    t, h, w = (int(v) for v in grid_thw)
    hp = np.arange(h)[:, None].repeat(w, 1)
    wp = np.arange(w)[None, :].repeat(h, 0)

    def merge_order(p):
        return (p.reshape(h // merge, merge, w // merge, merge)
                .transpose(0, 2, 1, 3).reshape(-1))

    hp, wp = merge_order(hp), merge_order(wp)
    dim = head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(0, dim) / dim))
    freqs = np.concatenate([hp[:, None] * inv[None, :],
                            wp[:, None] * inv[None, :]], axis=1)  # (hw, D/2)
    freqs = np.tile(freqs, (t, 1))
    emb = np.concatenate([freqs, freqs], axis=1)            # (seq, D)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _rot_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def qwen2vl_vision_forward(params: dict, pixels: jax.Array,
                           grid_thw: tuple[int, int, int]) -> jax.Array:
    """pixels (seq, C·tps·ps²) flattened patches (HF processor layout) →
    merged image embeddings (seq / merge², text_dim)."""
    hpv = params["hp"]
    nh, merge = hpv["n_head"], hpv["merge"]
    x = pixels.astype(jnp.float32) @ params["patch_embd"]   # (seq, d)
    seq, d = x.shape
    hd = d // nh
    cos, sin = _vision_rope_tables(grid_thw, hd, merge)
    scale = 1.0 / math.sqrt(hd)
    for blk in params["layers"]:
        h = ops.layer_norm(x, blk["ln1_w"], blk["ln1_b"], 1e-6)
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]               # (seq, 3d)
        q, k, v = (qkv.reshape(seq, 3, nh, hd).transpose(1, 0, 2, 3))
        q = q * cos[:, None, :] + _rot_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + _rot_half(k) * sin[:, None, :]
        logits = jnp.einsum("thd,shd->hts", q, k) * scale   # full attention
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(seq, d)
        x = x + (attn @ blk["proj_w"] + blk["proj_b"])
        h = ops.layer_norm(x, blk["ln2_w"], blk["ln2_b"], 1e-6)
        h = ops.quick_gelu(h @ blk["fc1_w"] + blk["fc1_b"])
        x = x + (h @ blk["fc2_w"] + blk["fc2_b"])
    # PatchMerger: LN → group merge² patches → MLP to text dim
    x = ops.layer_norm(x, params["mln_w"], params["mln_b"], 1e-6)
    x = x.reshape(seq // (merge * merge), -1)
    x = ops.gelu_erf(x @ params["mm0_w"] + params["mm0_b"])
    return x @ params["mm2_w"] + params["mm2_b"]


def params_from_hf_visual(sd: dict, n_head: int, merge: int = 2) -> dict:
    """Map a transformers Qwen2-VL `visual.*` state dict."""
    pre = ""
    for cand in ("model.visual.", "visual."):
        if any(k.startswith(cand) for k in sd):
            pre = cand
            break
    g = lambda k: np.asarray(sd[pre + k], np.float32)
    conv = g("patch_embed.proj.weight")                     # (d, C, tps, ps, ps)
    params = {
        "hp": {"n_head": n_head, "merge": merge},
        "patch_embd": conv.reshape(conv.shape[0], -1).T,
        "mln_w": g("merger.ln_q.weight"), "mln_b": g("merger.ln_q.bias"),
        "mm0_w": g("merger.mlp.0.weight").T, "mm0_b": g("merger.mlp.0.bias"),
        "mm2_w": g("merger.mlp.2.weight").T, "mm2_b": g("merger.mlp.2.bias"),
        "layers": [],
    }
    il = 0
    while f"{pre}blocks.{il}.attn.qkv.weight" in sd:
        p = f"blocks.{il}."
        params["layers"].append({
            "ln1_w": g(p + "norm1.weight"), "ln1_b": g(p + "norm1.bias"),
            "ln2_w": g(p + "norm2.weight"), "ln2_b": g(p + "norm2.bias"),
            "qkv_w": g(p + "attn.qkv.weight").T, "qkv_b": g(p + "attn.qkv.bias"),
            "proj_w": g(p + "attn.proj.weight").T, "proj_b": g(p + "attn.proj.bias"),
            "fc1_w": g(p + "mlp.fc1.weight").T, "fc1_b": g(p + "mlp.fc1.bias"),
            "fc2_w": g(p + "mlp.fc2.weight").T, "fc2_b": g(p + "mlp.fc2.bias"),
        })
        il += 1
    return params


def qwen2vl_position_ids(ids, image_token_id: int, grids, merge: int = 2):
    """(3, T) t/h/w position ids (get_rope_index semantics): text advances
    all three streams together; an image span of t×(h/merge)×(w/merge)
    merged patches gets grid positions starting at the running max; the next
    text token resumes at max(vision)+1."""
    ids = list(ids)
    pos = np.zeros((3, len(ids)), np.int64)
    cur, i, g = 0, 0, 0
    while i < len(ids):
        if ids[i] == image_token_id:
            t, h, w = (int(v) for v in grids[g])
            g += 1
            hh, ww = h // merge, w // merge
            n = t * hh * ww
            pos[0, i:i + n] = cur + np.repeat(np.arange(t), hh * ww)
            pos[1, i:i + n] = cur + np.tile(np.repeat(np.arange(hh), ww), t)
            pos[2, i:i + n] = cur + np.tile(np.arange(ww), t * hh)
            cur += max(t, hh, ww)
            i += n
        else:
            pos[:, i] = cur
            cur += 1
            i += 1
    return pos


class Qwen2VLMultimodal:
    """Image → LM pipeline (mtmd qwen2vl path): vision tower embeds replace
    the image-placeholder tokens; the LM runs with M-RoPE positions."""

    def __init__(self, model, visual_params: dict, image_token_id: int):
        self.model = model
        self.visual = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            visual_params)
        self.image_token_id = image_token_id
        self.merge = visual_params["hp"]["merge"]

    def build_inputs(self, prompt_ids, pixels: np.ndarray, grid_thw):
        img = np.asarray(qwen2vl_vision_forward(
            self.visual, jnp.asarray(pixels), tuple(int(v) for v in grid_thw)))
        tok_embd = np.asarray(self.model.params["token_embd"])
        ids = np.asarray(prompt_ids, np.int32)
        embeds = tok_embd[ids].astype(np.float32)
        is_img = ids == self.image_token_id
        assert int(is_img.sum()) == img.shape[0], (is_img.sum(), img.shape)
        embeds[is_img] = img
        pos3 = qwen2vl_position_ids(prompt_ids, self.image_token_id,
                                    [grid_thw], self.merge)
        T = len(prompt_ids)
        return (jnp.asarray(embeds[None]), jnp.zeros((1, T), jnp.int32),
                jnp.arange(T, dtype=jnp.int32)[None],
                jnp.asarray(pos3[:, None, :], jnp.int32))

    def prefill(self, prompt_ids, pixels, grid_thw, n_ctx: int = 2048,
                kv_dtype=jnp.float32):
        from ..models.registry import get_forward
        from ..runtime.kv_cache import kv_cache_init

        hp = self.model.hparams
        embeds, tokens, pos, pos3 = self.build_inputs(prompt_ids, pixels,
                                                      grid_thw)
        cache = kv_cache_init(hp.n_layer, 1, n_ctx, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        fwd = get_forward(hp.arch)
        logits, cache = fwd(self.model.params, hp, tokens, pos, cache,
                            embeds=embeds, mrope_pos3=pos3)
        return logits, cache, len(prompt_ids)


def _window_ids(grid_thw, merge: int, window_size: int, patch: int):
    """Per-token window id in the ORIGINAL (merge-ordered) sequence.

    Qwen2.5-VL reorders tokens into windows and runs chunked attention
    (get_window_index); attending within the same window id over the
    original order is the identical pair set, so no reordering is needed."""
    t, h, w = (int(v) for v in grid_thw)
    ws = max(window_size // merge // patch, 1)          # window in llm cells
    hp = np.arange(h)[:, None].repeat(w, 1)
    wp = np.arange(w)[None, :].repeat(h, 0)
    nw_w = -(-(w // merge) // ws)
    wid = (hp // merge // ws) * nw_w + (wp // merge // ws)

    def merge_order(p):
        return (p.reshape(h // merge, merge, w // merge, merge)
                .transpose(0, 2, 1, 3).reshape(-1))

    per = merge_order(wid)
    return np.tile(per, t)


def qwen25vl_vision_forward(params: dict, pixels: jax.Array,
                            grid_thw: tuple[int, int, int]) -> jax.Array:
    """Qwen2.5-VL tower: RMS norms, gated-silu MLP, window attention with
    periodic full-attention blocks (fullatt_block_indexes)."""
    hpv = params["hp"]
    nh, merge = hpv["n_head"], hpv["merge"]
    x = pixels.astype(jnp.float32) @ params["patch_embd"]
    seq, d = x.shape
    hd = d // nh
    cos, sin = _vision_rope_tables(grid_thw, hd, merge)
    wid = _window_ids(grid_thw, merge, hpv["window"], hpv["patch"])
    wmask = jnp.asarray(
        np.where(wid[:, None] == wid[None, :], 0.0, -1e30), jnp.float32)
    scale = 1.0 / math.sqrt(hd)
    for i, blk in enumerate(params["layers"]):
        h = ops.rms_norm(x, blk["ln1_w"], 1e-6)
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = (qkv.reshape(seq, 3, nh, hd).transpose(1, 0, 2, 3))
        q = q * cos[:, None, :] + _rot_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + _rot_half(k) * sin[:, None, :]
        logits = jnp.einsum("thd,shd->hts", q, k) * scale
        if i not in hpv["fullatt"]:
            logits = logits + wmask[None]
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(seq, d)
        x = x + (attn @ blk["proj_w"] + blk["proj_b"])
        h = ops.rms_norm(x, blk["ln2_w"], 1e-6)
        g = ops.silu(h @ blk["gate_w"] + blk["gate_b"])
        u = h @ blk["up_w"] + blk["up_b"]
        x = x + ((g * u) @ blk["down_w"] + blk["down_b"])
    x = ops.rms_norm(x, params["mln_w"], 1e-6)
    x = x.reshape(seq // (merge * merge), -1)
    x = ops.gelu_erf(x @ params["mm0_w"] + params["mm0_b"])
    return x @ params["mm2_w"] + params["mm2_b"]


def params_from_hf_visual_25(sd: dict, n_head: int, merge: int,
                             window: int, patch: int,
                             fullatt) -> dict:
    """Map a transformers Qwen2.5-VL `visual.*` state dict."""
    pre = ""
    for cand in ("model.visual.", "visual."):
        if any(k.startswith(cand) for k in sd):
            pre = cand
            break
    g = lambda k: np.asarray(sd[pre + k], np.float32)
    conv = g("patch_embed.proj.weight")
    params = {
        "hp": {"n_head": n_head, "merge": merge, "window": window,
               "patch": patch, "fullatt": set(int(v) for v in fullatt)},
        "patch_embd": conv.reshape(conv.shape[0], -1).T,
        "mln_w": g("merger.ln_q.weight"),
        "mm0_w": g("merger.mlp.0.weight").T, "mm0_b": g("merger.mlp.0.bias"),
        "mm2_w": g("merger.mlp.2.weight").T, "mm2_b": g("merger.mlp.2.bias"),
        "layers": [],
    }
    il = 0
    while f"{pre}blocks.{il}.attn.qkv.weight" in sd:
        p = f"blocks.{il}."
        params["layers"].append({
            "ln1_w": g(p + "norm1.weight"), "ln2_w": g(p + "norm2.weight"),
            "qkv_w": g(p + "attn.qkv.weight").T, "qkv_b": g(p + "attn.qkv.bias"),
            "proj_w": g(p + "attn.proj.weight").T, "proj_b": g(p + "attn.proj.bias"),
            "gate_w": g(p + "mlp.gate_proj.weight").T, "gate_b": g(p + "mlp.gate_proj.bias"),
            "up_w": g(p + "mlp.up_proj.weight").T, "up_b": g(p + "mlp.up_proj.bias"),
            "down_w": g(p + "mlp.down_proj.weight").T, "down_b": g(p + "mlp.down_proj.bias"),
        })
        il += 1
    return params


def params_from_mmproj(path: str) -> dict:
    """Load a qwen2vl/qwen2.5vl mmproj GGUF (tools/mtmd/clip.cpp schema:
    v.blk.N.* split q/k/v, mm.{0,2} merger, split Conv3D patch slices) into
    the qwen2vl_vision_forward params dict."""
    from ..gguf import GGUFReader

    r = GGUFReader(path)
    md = r.metadata

    def g(name, t=True):
        ti = r.tensors.get(name)
        if ti is None:
            return None
        a = ti.astype_f32()
        return a.T if (t and a.ndim == 2) else a

    heads = int(md["clip.vision.attention.head_count"])
    merge = int(md.get("clip.vision.spatial_merge_size", 2))
    w0 = r.tensors["v.patch_embd.weight"].astype_f32()      # (d, C, ph, pw)
    w1t = r.tensors.get("v.patch_embd.weight.1")
    if w1t is not None:                                     # temporal slices
        conv = np.stack([w0, w1t.astype_f32()], axis=2)     # (d, C, 2, ph, pw)
    else:
        conv = w0[:, :, None]
    params = {
        "hp": {"n_head": heads, "merge": merge},
        "patch_embd": conv.reshape(conv.shape[0], -1).T,
        "mln_w": g("v.post_ln.weight", t=False),
        "mln_b": g("v.post_ln.bias", t=False),
        "mm0_w": g("mm.0.weight"), "mm0_b": g("mm.0.bias", t=False),
        "mm2_w": g("mm.2.weight"), "mm2_b": g("mm.2.bias", t=False),
        "layers": [],
    }
    il = 0
    while f"v.blk.{il}.attn_q.weight" in r.tensors:
        p = f"v.blk.{il}."
        qkv_w = np.concatenate([r.tensors[p + f"attn_{x}.weight"].astype_f32()
                                for x in "qkv"], axis=0)
        qkv_b = np.concatenate([r.tensors[p + f"attn_{x}.bias"].astype_f32()
                                for x in "qkv"], axis=0)
        params["layers"].append({
            "ln1_w": g(p + "ln1.weight", t=False),
            "ln1_b": g(p + "ln1.bias", t=False),
            "ln2_w": g(p + "ln2.weight", t=False),
            "ln2_b": g(p + "ln2.bias", t=False),
            "qkv_w": qkv_w.T, "qkv_b": qkv_b,
            "proj_w": g(p + "attn_out.weight"),
            "proj_b": g(p + "attn_out.bias", t=False),
            "fc1_w": g(p + "ffn_up.weight"),
            "fc1_b": g(p + "ffn_up.bias", t=False),
            "fc2_w": g(p + "ffn_down.weight"),
            "fc2_b": g(p + "ffn_down.bias", t=False),
        })
        il += 1
    r.close()
    return params
