"""Mamba2-hybrid family forwards: granitehybrid (+bamba), nemotron_h,
falcon-h1.

Behavioral references:
  src/models/granite-hybrid.cpp — per layer SSM or attention (per-layer
    head_count_kv array), granite multipliers (embedding/residual/attention/
    logits), optional rope (bamba sets rope_scaling.finetuned), dense or
    MoE+shared FFN on every layer.
  src/models/nemotron-h.cpp — per layer exactly ONE of {mamba2, attention,
    relu²-FFN}; attention layers have n_ff(il)==0, SSM layers have
    n_head_kv(il)==0 and n_ff(il)==0 (llama-model.cpp:1899); no rope.
  src/models/falcon-h1.cpp — EVERY layer runs attention (rope) AND a mamba2
    mixer on the same normed input, summed into the residual, then a
    silu-gated FFN.

Memory is a HybridCache: KV slots for the attention layers (all layers for
falcon-h1), conv+ssm state for the recurrent layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.kv_cache import (
    causal_mask,
    kv_advance,
    kv_update_layer,
    kv_write_slots,
)
from ..runtime.recurrent import HybridCache, RecurrentCache
from .hparams import HParams
from .jamba import hybrid_layer_split
from .llama import dense_ffn, mm, moe_ffn
from .mamba import mamba_mixer


def _attn(layer: dict, hp: HParams, h, kv, li, slots, mask, rope=None,
          pos=None, kq_scale=None):
    """QKV + optional rope + cached attention; returns (out, kv)."""
    B, T, _ = h.shape
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
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
    if rope is not None:
        inv_freq, mscale = rope
        safe_pos = jnp.maximum(pos, 0)
        q = ops.apply_rope(q, safe_pos, inv_freq, hp.rope_type, mscale)
        k = ops.apply_rope(k, safe_pos, inv_freq, hp.rope_type, mscale)
    kv = kv_update_layer(kv, li, slots, k, v)
    scale = kq_scale if kq_scale else 1.0 / (D ** 0.5)
    attn = ops.attention_ref(q, kv.k[li], kv.v[li], mask, scale=scale)
    out = mm(attn.reshape(B, T, H * Dv), layer["wo"])
    if "bo" in layer:
        out = out + layer["bo"]
    return out, kv


def hybrid_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,
    pos: jax.Array,
    cache: HybridCache,
) -> tuple[jax.Array, HybridCache]:
    arch = hp.arch
    attn_layers, rec_layers = hybrid_layer_split(hp)
    aidx = {il: i for i, il in enumerate(attn_layers)}
    ridx = {il: i for i, il in enumerate(rec_layers)}
    parallel_ssm = arch == "falcon-h1"      # attn + ssm per layer
    use_rope = parallel_ssm or hp.rope_finetuned
    rope = (ops.rope_frequencies(
        hp.head_dim, hp.n_rot, hp.rope_freq_base,
        1.0 / hp.rope_scale_factor if hp.rope_scaling == "linear" else 1.0)
        if use_rope else None)
    # granite attention multiplier; 0 → 1/sqrt(D)
    kq_scale = hp.f_attn_scale if hp.f_attn_scale > 0.0 else None
    res = hp.f_residual_scale                # granite residual multiplier

    kv = cache.attn
    slots = kv_write_slots(kv, tokens.shape[1])
    kv = kv_advance(kv, slots, pos)
    mask = causal_mask(kv.pos, pos)

    x = params["token_embd"][tokens] * hp.f_embedding_scale
    conv_new = list(cache.rec.conv)
    ssm_new = list(cache.rec.ssm)
    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if parallel_ssm:                     # falcon-h1: both, summed
            a, kv = _attn(layer, hp, h, kv, aidx[il], slots, mask,
                          rope=rope, pos=pos, kq_scale=kq_scale)
            li = ridx[il]
            s, cs, ss = mamba_mixer(layer, hp, h, cache.rec.conv[li],
                                    cache.rec.ssm[li])
            conv_new[li], ssm_new[li] = cs, ss
            x = x + a + s
            h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
            x = x + dense_ffn(h, layer, hp)
            continue
        if hp.is_recurrent_layer(il):
            li = ridx[il]
            y, cs, ss = mamba_mixer(layer, hp, h, cache.rec.conv[li],
                                    cache.rec.ssm[li])
            conv_new[li], ssm_new[li] = cs, ss
        elif il in aidx:
            y, kv = _attn(layer, hp, h, kv, aidx[il], slots, mask,
                          rope=rope, pos=pos, kq_scale=kq_scale)
        else:                                # nemotron-h pure-FFN layer
            y = (moe_ffn(h, layer, hp) if "ffn_gate_inp" in layer
                 else dense_ffn(h, layer, hp))
        x = x + y * res

        if arch.startswith("granite"):       # FFN follows every layer
            h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
            ffn = (moe_ffn(h, layer, hp) if "ffn_gate_exps" in layer
                   else dense_ffn(h, layer, hp))
            x = x + ffn * res

    cache = HybridCache(attn=kv, rec=RecurrentCache(conv=jnp.stack(conv_new),
                                                    ssm=jnp.stack(ssm_new)))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    if hp.logit_scale != 1.0:                # granite logits divisor
        logits = logits * hp.logit_scale
    return logits, cache
