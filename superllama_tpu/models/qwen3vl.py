"""Qwen3-VL vision tower + DeepStack (tools/mtmd clip.cpp qwen3vl path
counterpart): native-resolution ViT with learned bilinear-interpolated
position embeddings, 2-D rotary attention, a spatial-merge projector, and
DeepStack feature taps — per-layer mergers whose outputs are ADDED to the
LM's hidden states at the first n_deepstack layers' image positions
(transformers Qwen3VLVisionModel / Qwen3VLTextModel._deepstack_process).

The text side is the shared llama forward with IMROPE (models/qwen2vl.py
mrope_apply interleaved=True); this module adds the tower and the
multimodal pipeline wrapper.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from .qwen2vl import _rot_half, _vision_rope_tables, qwen2vl_position_ids


def _interp_pos_embed(table: jax.Array, grid_thw, merge: int) -> jax.Array:
    """Bilinear interpolation of the (G², E) learned grid to (h, w), then
    permuted into spatial-merge block order and tiled over t
    (Qwen3VLVisionModel.fast_pos_embed_interpolate)."""
    t, h, w = (int(v) for v in grid_thw)
    G = int(round(math.sqrt(table.shape[0])))
    h_idx = np.linspace(0, G - 1, h)
    w_idx = np.linspace(0, G - 1, w)
    hf, wf = h_idx.astype(np.int64), w_idx.astype(np.int64)
    hc = np.clip(hf + 1, None, G - 1)
    wc = np.clip(wf + 1, None, G - 1)
    dh, dw = h_idx - hf, w_idx - wf
    out = 0.0
    for hi, hwt in ((hf, 1.0 - dh), (hc, dh)):
        for wi, wwt in ((wf, 1.0 - dw), (wc, dw)):
            idx = (hi[:, None] * G + wi[None, :]).reshape(-1)
            wt = (hwt[:, None] * wwt[None, :]).reshape(-1)
            out = out + table[idx] * jnp.asarray(wt, jnp.float32)[:, None]
    # row-major (h·w, E) → merge-block token order
    E = out.shape[-1]
    out = (out.reshape(h // merge, merge, w // merge, merge, E)
           .transpose(0, 2, 1, 3, 4).reshape(h * w, E))
    return jnp.tile(out, (t, 1))


def qwen3vl_vision_forward(params: dict, pixels: jax.Array,
                           grid_thw: tuple[int, int, int]):
    """pixels (seq, C·tps·ps²) flattened patches → (merged embeddings
    (seq/merge², text_dim), [deepstack embeddings (seq/merge², text_dim)])."""
    hpv = params["hp"]
    nh, merge = hpv["n_head"], hpv["merge"]
    x = pixels.astype(jnp.float32) @ params["patch_embd"] + params["patch_embd_b"]
    x = x + _interp_pos_embed(params["pos_embd"], grid_thw, merge)
    seq, d = x.shape
    hd = d // nh
    cos, sin = _vision_rope_tables(grid_thw, hd, merge)
    scale = 1.0 / math.sqrt(hd)

    def merger(m, h, post_norm: bool):
        if post_norm:     # deepstack mergers norm AFTER the merge reshape
            h = h.reshape(seq // (merge * merge), -1)
            h = ops.layer_norm(h, m["ln_w"], m["ln_b"], 1e-6)
        else:
            h = ops.layer_norm(h, m["ln_w"], m["ln_b"], 1e-6)
            h = h.reshape(seq // (merge * merge), -1)
        h = ops.gelu_erf(h @ m["fc1_w"] + m["fc1_b"])       # nn.GELU() = erf
        return h @ m["fc2_w"] + m["fc2_b"]

    deepstack = []
    for il, blk in enumerate(params["layers"]):
        h = ops.layer_norm(x, blk["ln1_w"], blk["ln1_b"], 1e-6)
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = qkv.reshape(seq, 3, nh, hd).transpose(1, 0, 2, 3)
        q = q * cos[:, None, :] + _rot_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + _rot_half(k) * sin[:, None, :]
        logits = jnp.einsum("thd,shd->hts", q, k) * scale   # full attention
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(seq, d)
        x = x + (attn @ blk["proj_w"] + blk["proj_b"])
        h = ops.layer_norm(x, blk["ln2_w"], blk["ln2_b"], 1e-6)
        h = ops.ACT_FNS[hpv["act"]](h @ blk["fc1_w"] + blk["fc1_b"])
        x = x + (h @ blk["fc2_w"] + blk["fc2_b"])
        if il in hpv["deepstack_indexes"]:
            m = params["ds_mergers"][hpv["deepstack_indexes"].index(il)]
            deepstack.append(merger(m, x, post_norm=True))
    return merger(params["merger"], x, post_norm=False), deepstack


def params_from_hf_visual(sd: dict, n_head: int, merge: int = 2,
                          deepstack_indexes=(), act: str = "gelu_tanh") -> dict:
    """Map a transformers Qwen3-VL `visual.*`/`model.visual.*` state dict."""
    pre = ""
    for cand in ("model.visual.", "visual."):
        if any(k.startswith(cand) for k in sd):
            pre = cand
            break
    g = lambda k: np.asarray(sd[pre + k], np.float32)
    conv = g("patch_embed.proj.weight")                 # (d, C, tps, ps, ps)

    def merger_params(base):
        return {
            "ln_w": g(base + "norm.weight"), "ln_b": g(base + "norm.bias"),
            "fc1_w": g(base + "linear_fc1.weight").T,
            "fc1_b": g(base + "linear_fc1.bias"),
            "fc2_w": g(base + "linear_fc2.weight").T,
            "fc2_b": g(base + "linear_fc2.bias"),
        }

    params = {
        "hp": {"n_head": n_head, "merge": merge, "act": act,
               "deepstack_indexes": list(deepstack_indexes)},
        "patch_embd": conv.reshape(conv.shape[0], -1).T,
        "patch_embd_b": g("patch_embed.proj.bias"),
        "pos_embd": g("pos_embed.weight"),
        "merger": merger_params("merger."),
        "ds_mergers": [merger_params(f"deepstack_merger_list.{i}.")
                       for i in range(len(deepstack_indexes))],
        "layers": [],
    }
    il = 0
    while f"{pre}blocks.{il}.attn.qkv.weight" in sd:
        p = f"blocks.{il}."
        params["layers"].append({
            "ln1_w": g(p + "norm1.weight"), "ln1_b": g(p + "norm1.bias"),
            "ln2_w": g(p + "norm2.weight"), "ln2_b": g(p + "norm2.bias"),
            "qkv_w": g(p + "attn.qkv.weight").T,
            "qkv_b": g(p + "attn.qkv.bias"),
            "proj_w": g(p + "attn.proj.weight").T,
            "proj_b": g(p + "attn.proj.bias"),
            "fc1_w": g(p + "mlp.linear_fc1.weight").T,
            "fc1_b": g(p + "mlp.linear_fc1.bias"),
            "fc2_w": g(p + "mlp.linear_fc2.weight").T,
            "fc2_b": g(p + "mlp.linear_fc2.bias"),
        })
        il += 1
    return params


class Qwen3VLMultimodal:
    """Image → LM pipeline with DeepStack injection: tower embeds replace
    the image placeholders; each deepstack tap is added to the LM hidden
    state after layers 0..n_deepstack-1 at the image positions."""

    def __init__(self, model, visual_params: dict, image_token_id: int):
        self.model = model
        self.visual = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
            visual_params)
        self.image_token_id = image_token_id
        self.merge = visual_params["hp"]["merge"]

    def prefill(self, prompt_ids, pixels, grid_thw, n_ctx: int = 2048,
                kv_dtype=jnp.float32):
        from ..models.registry import get_forward
        from ..runtime.kv_cache import kv_cache_init

        hp = self.model.hparams
        img, deepstack = qwen3vl_vision_forward(
            self.visual, jnp.asarray(pixels),
            tuple(int(v) for v in grid_thw))
        img = np.asarray(img)
        tok_embd = np.asarray(self.model.params["token_embd"])
        ids = np.asarray(prompt_ids, np.int32)
        T = len(ids)
        embeds = tok_embd[ids].astype(np.float32)
        is_img = ids == self.image_token_id
        assert int(is_img.sum()) == img.shape[0], (is_img.sum(), img.shape)
        embeds[is_img] = img
        # dense (Ld, 1, T, E) per-layer adds, zero at text positions
        ds = np.zeros((len(deepstack), 1, T, embeds.shape[-1]), np.float32)
        for l, emb in enumerate(deepstack):
            ds[l, 0, is_img] = np.asarray(emb)
        pos3 = qwen2vl_position_ids(prompt_ids, self.image_token_id,
                                    [grid_thw], self.merge)
        cache = kv_cache_init(hp.n_layer, 1, n_ctx, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        fwd = get_forward(hp.arch)
        logits, cache = fwd(
            self.model.params, hp, jnp.zeros((1, T), jnp.int32),
            jnp.arange(T, dtype=jnp.int32)[None], cache,
            embeds=jnp.asarray(embeds[None]),
            mrope_pos3=jnp.asarray(pos3[:, None, :], jnp.int32),
            deepstack_add=jnp.asarray(ds))
        return logits, cache, T


def params_from_mmproj(path: str) -> dict:
    """Load a qwen3vl mmproj GGUF (clip.cpp schema: v.blk.N.*, mm.{0,2},
    v.deepstack.IDX.*, clip.vision.is_deepstack_layers) into the
    qwen3vl_vision_forward params dict."""
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
    ds_raw = md.get("clip.vision.is_deepstack_layers")
    ds_flags = [bool(x) for x in np.asarray(ds_raw).tolist()] if ds_raw is not None else []
    ds_idx = [i for i, f in enumerate(ds_flags) if f]
    use_silu = bool(md.get("clip.use_silu", False))
    w0 = r.tensors["v.patch_embd.weight"].astype_f32()
    w1t = r.tensors.get("v.patch_embd.weight.1")
    conv = (np.stack([w0, w1t.astype_f32()], axis=2) if w1t is not None
            else w0[:, :, None])

    def merger_params(ln_prefix, fc1, fc2):
        return {
            "ln_w": g(ln_prefix + ".weight", t=False),
            "ln_b": g(ln_prefix + ".bias", t=False),
            "fc1_w": g(fc1 + ".weight"), "fc1_b": g(fc1 + ".bias", t=False),
            "fc2_w": g(fc2 + ".weight"), "fc2_b": g(fc2 + ".bias", t=False),
        }

    params = {
        "hp": {"n_head": heads, "merge": merge,
               "act": "silu" if use_silu else "gelu_tanh",
               "deepstack_indexes": ds_idx},
        "patch_embd": conv.reshape(conv.shape[0], -1).T,
        "patch_embd_b": g("v.patch_embd.bias", t=False),
        "pos_embd": g("v.position_embd.weight", t=False),
        "merger": merger_params("v.post_ln", "mm.0", "mm.2"),
        "ds_mergers": [merger_params(f"v.deepstack.{i}.norm",
                                     f"v.deepstack.{i}.fc1",
                                     f"v.deepstack.{i}.fc2")
                       for i in ds_idx],
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
