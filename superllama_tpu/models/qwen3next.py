"""Qwen3-Next forward: hybrid of gated-delta-net linear-attention layers
(3 of every 4) and gated full-attention layers, with a qwen3moe-style MoE
(+ sigmoid-gated shared expert) after every layer.

Behavioral reference: src/models/qwen3next.cpp —
 - linear layers (build_layer_attn_linear): fused ssm_in projects per
   k-head-group interleaved [q|k|v|z]; ssm_ba projects interleaved
   [beta|alpha] per group; decay g = softplus(alpha + dt_bias) · A where
   the GGUF ssm_a stores −exp(A_log); [q|k|v] run through a depthwise
   causal conv + silu with a rolling state; q/k repeat to the v heads,
   l2-normalized (x / max(‖x‖, rms_eps)), q scaled 1/√Dv; the DELTA RULE
   recurrence (HF torch_recurrent_gated_delta_rule — ggml's chunked scan is
   the same operator): S←S·eᵍ; Δ=(v−kᵀS)·σ(β); S←S+k⊗Δ; y=qᵀS; output is
   RMS-normed per head and gated by silu(z) before the out-projection.
 - attention layers (build_layer_attn): wq emits per-head-interleaved
   [q|gate]; per-head q/k RMS norms, partial NEOX rope; the attention
   output is multiplied by σ(gate) before wo.
 - every layer: x += mixer(rms(x, attn_norm)); h = rms(x, attn_post_norm);
   x += moe(h) + silu-shared-expert·σ(gate_inp_shexp·h).
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


def _l2norm(x: jax.Array, eps: float) -> jax.Array:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def delta_net(q, k, v, g, beta, state, eps: float):
    """Gated delta rule over (B,T,Hv,D) q/k/v with (B,T,Hv) g (log-decay)
    and beta (pre-sigmoid); state (B,Hv,D,D) [i=key, j=val]. Returns
    (y (B,T,Hv,D), state)."""
    D = v.shape[-1]
    q = _l2norm(q.astype(jnp.float32), eps) / (D ** 0.5)
    k = _l2norm(k.astype(jnp.float32), eps)
    b = jax.nn.sigmoid(beta.astype(jnp.float32))

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp          # (B,Hv,D) ×3, (B,Hv) ×2
        S = S * jnp.exp(g_t)[..., None, None]
        kv = jnp.einsum("bhi,bhij->bhj", k_t, S)
        delta = (v_t - kv) * b_t[..., None]
        S = S + jnp.einsum("bhi,bhj->bhij", k_t, delta)
        y = jnp.einsum("bhi,bhij->bhj", q_t, S)
        return S, y

    tx = lambda x: x.astype(jnp.float32).transpose(1, 0, 2, 3)
    state, ys = jax.lax.scan(
        step, state.astype(jnp.float32),
        (tx(q), tx(k), tx(v), g.astype(jnp.float32).transpose(1, 0, 2),
         b.transpose(1, 0, 2)))
    return ys.transpose(1, 0, 2, 3), state


def _linear_layer(layer: dict, hp: HParams, h: jax.Array, conv_state,
                  ssm_state):
    B, T, E = h.shape
    Dk = Dv = hp.ssm_d_state
    Hk, Hv = hp.ssm_n_group, hp.ssm_dt_rank
    R = Hv // Hk
    dc = hp.ssm_d_conv

    if "ssm_qkv" in layer:
        # ecosystem layout (convert_hf_to_gguf Qwen3NextModel): attn_qkv =
        # head-contiguous [q|k|v] streams, attn_gate = z
        qkv_flat = mm(h, layer["ssm_qkv"])
        q = qkv_flat[..., :Hk * Dk]
        k = qkv_flat[..., Hk * Dk:2 * Hk * Dk]
        v = qkv_flat[..., 2 * Hk * Dk:]
        z = mm(h, layer["attn_gate"]).reshape(B, T, Hv, Dv)
    else:
        # fused ssm_in: per-k-head interleaved [q|k|v|z] (build_qkvz)
        qkvz = mm(h, layer["ssm_in"]).reshape(B, T, Hk, 2 * Dk + 2 * Dv * R)
        q = qkvz[..., :Dk].reshape(B, T, Hk * Dk)
        k = qkvz[..., Dk:2 * Dk].reshape(B, T, Hk * Dk)
        v = qkvz[..., 2 * Dk:2 * Dk + Dv * R].reshape(B, T, Hv * Dv)
        z = qkvz[..., 2 * Dk + Dv * R:].reshape(B, T, Hv, Dv)

    ba = mm(h, layer["ssm_beta_alpha"]).reshape(B, T, Hk, 2 * R)
    beta = ba[..., :R].reshape(B, T, Hv)
    alpha = ba[..., R:].reshape(B, T, Hv)
    # decay: softplus(alpha + dt_bias) · A  (A = −exp(A_log), stored)
    g = (jax.nn.softplus(alpha.astype(jnp.float32)
                         + layer["ssm_dt_b"].astype(jnp.float32))
         * layer["ssm_a"].astype(jnp.float32))

    qkv = jnp.concatenate([q, k, v], axis=-1)    # conv over [q|k|v] channels
    seq = jnp.concatenate([conv_state.astype(qkv.dtype), qkv], axis=1)
    w = layer["ssm_conv1d"]                       # (dc, C)
    y = sum(seq[:, j:j + T] * w[j] for j in range(dc))
    if "ssm_conv1d_b" in layer:
        y = y + layer["ssm_conv1d_b"]
    new_conv = seq[:, T:]
    qkv = ops.silu(y)
    q = qkv[..., :Hk * Dk].reshape(B, T, Hk, Dk)
    k = qkv[..., Hk * Dk:2 * Hk * Dk].reshape(B, T, Hk, Dk)
    v = qkv[..., 2 * Hk * Dk:].reshape(B, T, Hv, Dv)
    if R > 1:
        q = jnp.repeat(q[:, :, :, None], R, 2).reshape(B, T, Hv, Dk)
        k = jnp.repeat(k[:, :, :, None], R, 2).reshape(B, T, Hv, Dk)

    state = ssm_state.astype(jnp.float32).reshape(B, Hv, Dk, Dv)
    y, state = delta_net(q, k, v, g, beta, state, hp.rms_eps)

    y = ops.rms_norm(y.astype(h.dtype), layer["ssm_norm"], hp.rms_eps)
    y = y * ops.silu(z)
    out = mm(y.reshape(B, T, Hv * Dv), layer["ssm_out"])
    return (out, new_conv.astype(conv_state.dtype),
            state.reshape(B, Hv * Dv, Dk).astype(ssm_state.dtype))


def qwen3next_forward(
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
    inv_freq, ms = ops.rope_frequencies(D, hp.n_rot, hp.rope_freq_base)
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
            y, conv_new[li], ssm_new[li] = _linear_layer(
                layer, hp, h, cache.rec.conv[li], cache.rec.ssm[li])
        else:
            # gated attention: wq emits interleaved per-head [q | gate]
            qfull = mm(h, layer["wq"]).reshape(B, T, H, 2 * D)
            q, gate = qfull[..., :D], qfull[..., D:]
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = mm(h, layer["wk"]).reshape(B, T, Hkv, D)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
            v = mm(h, layer["wv"]).reshape(B, T, Hkv, Dv)
            q = ops.apply_rope(q, safe_pos, inv_freq, hp.rope_type, ms)
            k = ops.apply_rope(k, safe_pos, inv_freq, hp.rope_type, ms)
            li = aidx[il]
            kv = kv_update_layer(kv, li, slots, k, v)
            scale = (hp.f_attn_scale if hp.f_attn_scale > 0.0
                     else 1.0 / (D ** 0.5))
            attn = ops.attention_ref(q, kv.k[li], kv.v[li], mask, scale=scale)
            attn = attn * jax.nn.sigmoid(gate)
            y = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        x = x + y

        h2 = ops.rms_norm(x, layer["attn_post_norm"], hp.rms_eps)
        ffn = (moe_ffn(h2, layer, hp) if "ffn_gate_inp" in layer
               else dense_ffn(h2, layer, hp))
        x = x + ffn

    cache = HybridCache(attn=kv, rec=RecurrentCache(
        conv=jnp.stack(conv_new), ssm=jnp.stack(ssm_new)))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache
