"""Jamba-family hybrid forward: interleaved attention + mamba(SSM) layers
with optional MoE FFN.

Behavioral reference: src/models/jamba.cpp (llm_build_jamba) — per layer,
n_head_kv(il) == 0 routes to the mamba mixer (with jamba's dt/B/C RMS norms,
graph-context-mamba.cpp:94-97), else rope-less attention; FFN is dense or MoE
by ffn_gate_inp presence. Memory is a HybridCache (llama_memory_hybrid
counterpart): KV slots for attention layers, conv+ssm state for SSM layers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.recurrent import HybridCache, RecurrentCache
from ..runtime.kv_cache import (
    KVCache,
    causal_mask,
    kv_advance,
    kv_cache_init,
    kv_update_layer,
    kv_write_slots,
)
from .hparams import HParams
from .llama import dense_ffn, mm, moe_ffn
from .mamba import _mamba_mixer


def hybrid_layer_split(hp: HParams) -> tuple[list[int], list[int]]:
    """(attention_layers, ssm_layers). falcon-h1 runs both per layer;
    nemotron-h additionally has pure-FFN layers in neither list."""
    if hp.arch == "falcon-h1":
        alls = list(range(hp.n_layer))
        return alls, list(alls)
    if hp.arch == "qwen3next":   # head counts are uniform; split by formula
        rec = [il for il in range(hp.n_layer) if hp.is_recurrent_layer(il)]
        attn = [il for il in range(hp.n_layer) if il not in rec]
        return attn, rec
    attn = [il for il in range(hp.n_layer) if hp.n_head_kv_il(il) > 0]
    rec = [il for il in range(hp.n_layer) if hp.is_recurrent_layer(il)]
    return attn, rec


def hybrid_cache_init(hp: HParams, batch: int, max_seq: int,
                      dtype=jnp.float32) -> HybridCache:
    attn, rec = hybrid_layer_split(hp)
    from ..runtime.recurrent import recurrent_cache_init

    if hp.shortconv_l_cache > 0:   # lfm2: rolling conv columns, no SSM state
        rec_cache = recurrent_cache_init(
            len(rec), batch, hp.shortconv_l_cache, 1, 1, dtype,
            conv_dim=hp.n_embd)
    else:
        rec_cache = recurrent_cache_init(len(rec), batch, hp.ssm_d_conv,
                                         hp.ssm_d_inner, hp.ssm_d_state,
                                         dtype, conv_dim=hp.ssm_conv_dim)
    return HybridCache(
        attn=kv_cache_init(len(attn), batch, max_seq, hp.n_head_kv,
                           hp.head_dim, hp.head_dim_v, dtype),
        rec=rec_cache,
    )


def jamba_forward(
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

    kv = cache.attn
    slots = kv_write_slots(kv, T)
    kv = kv_advance(kv, slots, pos)
    mask = causal_mask(kv.pos, pos)
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    scale = 1.0 / (D ** 0.5)

    x = params["token_embd"][tokens]
    conv_new = list(cache.rec.conv)
    ssm_new = list(cache.rec.ssm)
    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        if hp.n_head_kv_il(il) == 0:
            li = ridx[il]
            y, cs, ss = _mamba_mixer(layer, hp, h, cache.rec.conv[li],
                                     cache.rec.ssm[li])
            conv_new[li], ssm_new[li] = cs, ss
        else:
            li = aidx[il]
            q = mm(h, layer["wq"]).reshape(B, T, H, D)
            k = mm(h, layer["wk"]).reshape(B, T, Hkv, D)
            v = mm(h, layer["wv"]).reshape(B, T, Hkv, Dv)
            # no RoPE (jamba.cpp:44)
            kv = kv_update_layer(kv, li, slots, k, v)
            attn = ops.attention_ref(q, kv.k[li], kv.v[li], mask, scale=scale)
            y = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        x = x + y

        h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "ffn_gate_exps" in layer:
            ffn = moe_ffn(h, layer, hp)
        else:
            ffn = dense_ffn(h, layer, hp)
        x = x + ffn

    cache = HybridCache(attn=kv, rec=RecurrentCache(conv=jnp.stack(conv_new),
                                                    ssm=jnp.stack(ssm_new)))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache
