"""LLaDA / Dream diffusion-LM forwards: llama/qwen2-style blocks with
NON-CAUSAL attention and no KV cache (every denoising step re-evaluates the
full masked sequence).

Behavioral reference: src/models/llada.cpp, llada-moe.cpp, dream.cpp —
identical block math to the llama family; the only differences are the
no-cache bidirectional attention input and (for llada-moe) MoE FFN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from .hparams import HParams
from .llama import dense_ffn, mm, moe_ffn


def llada_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,          # (B, T)
    pos: jax.Array | None = None,
    cache=None,                 # unused; diffusion re-evaluates the window
) -> tuple[jax.Array, None]:
    """Full bidirectional forward → (logits (B,T,V), None)."""
    B, T = tokens.shape
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    if pos is None:
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    inv_freq, mscale = ops.rope_frequencies(
        D, hp.n_rot, hp.rope_freq_base,
        1.0 / hp.rope_scale_factor if hp.rope_scaling == "linear" else 1.0)
    scale = 1.0 / (D ** 0.5)

    x = params["token_embd"][tokens]
    for layer in params["layers"]:
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = mm(h, layer["wq"])
        k = mm(h, layer["wk"])
        v = mm(h, layer["wv"])
        if "bq" in layer:
            q = q + layer["bq"]
        if "bk" in layer:
            k = k + layer["bk"]
        if "bv" in layer:
            v = v + layer["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, Dv)
        if "attn_q_norm" in layer:  # dream (qwen-style) per-head norms
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
        q = ops.apply_rope(q, pos, inv_freq, hp.rope_type, mscale)
        k = ops.apply_rope(k, pos, inv_freq, hp.rope_type, mscale)

        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 1, 3)
        vh = v.transpose(0, 2, 1, 3)
        if Hkv != H:
            kh = jnp.repeat(kh, H // Hkv, axis=1)
            vh = jnp.repeat(vh, H // Hkv, axis=1)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)  # no causal mask
        attn = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * Dv)
        x = x + mm(attn, layer["wo"])

        h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "ffn_gate_exps" in layer:  # llada-moe
            ffn = moe_ffn(h, layer, hp)
        else:
            ffn = dense_ffn(h, layer, hp)
        x = x + ffn

    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, None
