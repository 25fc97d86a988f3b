"""LFM2 / LFM2-MoE forward: hybrid stack of shortconv mixer layers and
GQA attention layers (per-layer head_count_kv array selects), each followed
by a dense or MoE FFN.

Behavioral reference: src/models/lfm2.cpp —
  build_shortconv_block: in_proj → [b, c, x] chunks; bx = b⊙x is run through
  a depthwise causal conv over time (kernel shortconv.conv, length L_cache)
  whose rolling state is the last L_cache−1 columns; y = out_proj(c⊙conv).
  build_attn_block: per-head q/k RMS norms pre-rope, NEOX rope.
The final norm tensor ships under the (historical) name "token_embd_norm"
(llama-arch.cpp:318 LLM_TENSOR_OUTPUT_NORM_LFM2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.kv_cache import (causal_mask, kv_advance, kv_update_layer,
                                kv_write_slots)
from ..runtime.recurrent import HybridCache, RecurrentCache
from .hparams import HParams
from .jamba import hybrid_layer_split
from .llama import dense_ffn, mm, moe_ffn


def shortconv_mixer(layer: dict, h: jax.Array, conv_state: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """One shortconv block over (B, T, E); conv_state (B, L−1, E).
    Returns (y, new_conv_state)."""
    B, T, E = h.shape
    bcx = mm(h, layer["shortconv_in"])            # (B, T, 3E)
    b, c, x = bcx[..., :E], bcx[..., E:2 * E], bcx[..., 2 * E:]
    bx = b * x
    full = jnp.concatenate([conv_state.astype(bx.dtype), bx], axis=1)
    kernel = layer["shortconv_conv"]              # (L_cache, E)
    L = kernel.shape[0]
    out = jnp.zeros_like(bx)
    for j in range(L):                            # depthwise causal conv
        out = out + kernel[j][None, None, :] * full[:, j:j + T]
    y = c * out
    return mm(y, layer["shortconv_out"]), full[:, -(L - 1):]


def lfm2_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,
    pos: jax.Array,
    cache: HybridCache,
) -> tuple[jax.Array, HybridCache]:
    B, T = tokens.shape
    attn_layers, rec_layers = hybrid_layer_split(hp)
    aidx = {il: i for i, il in enumerate(attn_layers)}
    ridx = {il: i for i, il in enumerate(rec_layers)}
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    inv_freq, mscale = ops.rope_frequencies(
        D, hp.n_rot, hp.rope_freq_base,
        1.0 / hp.rope_scale_factor if hp.rope_scaling == "linear" else 1.0)
    safe_pos = jnp.maximum(pos, 0)

    kv = cache.attn
    slots = kv_write_slots(kv, T)
    kv = kv_advance(kv, slots, pos)
    mask = causal_mask(kv.pos, pos)

    x = params["token_embd"][tokens]
    conv_new = list(cache.rec.conv)
    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if hp.is_recurrent_layer(il):
            li = ridx[il]
            y, conv_new[li] = shortconv_mixer(layer, h, cache.rec.conv[li])
        else:
            q = mm(h, layer["wq"]).reshape(B, T, H, D)
            k = mm(h, layer["wk"]).reshape(B, T, Hkv, D)
            v = mm(h, layer["wv"]).reshape(B, T, Hkv, Dv)
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
            q = ops.apply_rope(q, safe_pos, inv_freq, hp.rope_type, mscale)
            k = ops.apply_rope(k, safe_pos, inv_freq, hp.rope_type, mscale)
            li = aidx[il]
            kv = kv_update_layer(kv, li, slots, k, v)
            attn = ops.attention_ref(q, kv.k[li], kv.v[li], mask,
                                     scale=1.0 / (D ** 0.5))
            y = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        x = x + y
        h2 = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        ffn = (moe_ffn(h2, layer, hp) if "ffn_gate_exps" in layer
               else dense_ffn(h2, layer, hp))
        x = x + ffn

    cache = HybridCache(attn=kv, rec=RecurrentCache(
        conv=jnp.stack(conv_new), ssm=cache.rec.ssm))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache
