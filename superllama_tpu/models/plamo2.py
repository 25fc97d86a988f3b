"""PLaMo-2 forward: hybrid stack of PLaMo-2 mamba layers (per-layer
head_count_kv 0) and fused-wqkv attention layers, each mixer AND FFN wrapped
in pre/post RMS norms, no-gate SWIGLU-SEQ FFN (fused gate‖up).

Behavioral reference: src/models/plamo2.cpp — build_plamo2_attn_layer
(fused qkv views with distinct q/v head dims, per-head q/k RMS norms
pre-rope, NEOX rope, 1/sqrt(head_dim_v) scale) and build_plamo2_mamba_layer
(see models/mamba.py plamo2_mixer).
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
from .llama import mm
from .mamba import plamo2_mixer


def plamo2_forward(
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
    ssm_new = list(cache.rec.ssm)
    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if hp.is_recurrent_layer(il):
            li = ridx[il]
            y, conv_new[li], ssm_new[li] = plamo2_mixer(
                layer, hp, h, cache.rec.conv[li], cache.rec.ssm[li])
        else:
            H_l, Hkv_l = hp.n_head_il(il), hp.n_head_kv_il(il)
            q = mm(h, layer["wq"]).reshape(B, T, H_l, D)
            k = mm(h, layer["wk"]).reshape(B, T, Hkv_l, D)
            v = mm(h, layer["wv"]).reshape(B, T, Hkv_l, Dv)
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
            q = ops.apply_rope(q, safe_pos, inv_freq, hp.rope_type, mscale)
            k = ops.apply_rope(k, safe_pos, inv_freq, hp.rope_type, mscale)
            if Hkv_l < Hkv:
                pad = ((0, 0), (0, 0), (0, Hkv - Hkv_l), (0, 0))
                k, v = jnp.pad(k, pad), jnp.pad(v, pad)
            li = aidx[il]
            kv = kv_update_layer(kv, li, slots, k, v)
            ck, cv = kv.k[li], kv.v[li]
            if Hkv_l < Hkv:
                ck, cv = ck[:, :Hkv_l], cv[:, :Hkv_l]
            attn = ops.attention_ref(q, ck, cv, mask,
                                     scale=1.0 / (Dv ** 0.5))
            y = mm(attn.reshape(B, T, H_l * Dv), layer["wo"])
        y = ops.rms_norm(y, layer["attn_post_norm"], hp.rms_eps)
        x = x + y

        h2 = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = mm(h2, layer["ffn_gate"])          # loader-split fused gate‖up
        up = mm(h2, layer["ffn_up"])
        ffn = mm(ops.silu(gate) * up, layer["ffn_down"])
        ffn = ops.rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ffn

    cache = HybridCache(attn=kv, rec=RecurrentCache(
        conv=jnp.stack(conv_new), ssm=jnp.stack(ssm_new)))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache
