"""Gemma3n (MatFormer E2B/E4B) forward — AltUp multi-stream hidden state,
LAUREL low-rank residual, per-layer input embeddings, activation sparsity,
and shared-KV tail layers.

Behavioral reference: src/models/gemma3n-iswa.cpp (+ HF
transformers.models.gemma3n.modeling_gemma3n for the AltUp index order):
 - the hidden state is a STACK of n_altup streams; each layer predicts all
   streams from the active one (router → per-pair coefficients), runs
   attention+FFN on the active prediction only, then corrects every stream
   with the innovation;
 - LAUREL: low-rank residual (laurel_l·laurel_r + post norm) added to the
   attention output, scaled 1/sqrt(2);
 - per-layer inputs: a second embedding table (n_embd_altup per layer)
   merged with a projection of the input embedding, gating the correction
   added to the non-active streams;
 - activation sparsity on the first 10 layers' FFN gate
   (relu(x − (mean + 1.6448·std)), models.h:198);
 - layers ≥ n_layer_kv_from_start (20) compute Q only and attend the KV
   cache of layer 18 (swa) / 19 (full) (llama-model.cpp layer_reuse_cb);
 - attention: per-head q/k RMS norms, NON-parametric RMS on V, kq scale 1,
   iSWA pattern 5 with a separate SWA rope base; final logit softcap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.kv_cache import (ISWACache, causal_mask, iswa_layer_split,
                                kv_advance, kv_ring_advance, kv_ring_slots,
                                kv_update_layer, kv_write_slots)
from .hparams import HParams
from .llama import mm

def _magnitude(x):
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def _gelu(x):
    return ops.ACT_FNS["gelu_tanh"](x)  # ggml_gelu = tanh approximation


def _modalities(layer: dict, hp: HParams, x: jax.Array) -> jax.Array:
    ri = ops.rms_norm(x, layer["altup_router_norm"], hp.rms_eps) / hp.n_embd
    return jnp.tanh(mm(ri, layer["altup_router"]).astype(jnp.float32)
                    ).astype(x.dtype)


def _altup_predict(layer: dict, hp: HParams, X: jax.Array,
                   i_act: int) -> jax.Array:
    """X (A,B,T,E) → predictions (A,B,T,E) (Gemma3nTextAltUp.predict)."""
    A = X.shape[0]
    mod = _modalities(layer, hp, X[i_act])                   # (B,T,A)
    coefs = mm(mod, layer["altup_predict_coef"])             # (B,T,A²)
    coefs = coefs.reshape(*mod.shape[:-1], A, A).swapaxes(-1, -2)
    pred = jnp.einsum("ibte,btij->jbte", X.astype(jnp.float32),
                      coefs.astype(jnp.float32)).astype(X.dtype)
    return pred + X


def _altup_correct(layer: dict, hp: HParams, pred: jax.Array,
                   activated: jax.Array, i_act: int) -> jax.Array:
    """(Gemma3nTextAltUp.correct): every stream gets innovation·(coef+1)."""
    mod = _modalities(layer, hp, activated)                  # (B,T,A)
    innovation = activated - pred[i_act]                     # (B,T,E)
    coefs = mm(mod, layer["altup_correct_coef"]) + 1.0       # (B,T,A)
    return pred + innovation[None] * jnp.moveaxis(coefs, -1, 0)[..., None]


def _laurel(layer: dict, hp: HParams, x: jax.Array) -> jax.Array:
    t = mm(mm(x, layer["laurel_l"]), layer["laurel_r"])
    return ops.rms_norm(t, layer["laurel_post_norm"], hp.rms_eps) + x


def _gaussian_topk(x: jax.Array, std_mul: float) -> jax.Array:
    # biased std (/N), matching HF + the original JAX model (jnp.std);
    # ggml's gemma3n-iswa.cpp:314 uses /(N-1) — indistinguishable at the
    # real n_ff (16k) but not at test sizes.
    mean = jnp.mean(x, axis=-1, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True))
    return jax.nn.relu(x - (mean + std_mul * std))


def gemma3n_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,
    pos: jax.Array,
    cache: ISWACache,
) -> tuple[jax.Array, ISWACache]:
    B, T = tokens.shape
    g = hp.extra["gemma3n"]
    A, EA, i_act = g["n_altup"], g["n_embd_altup"], g["i_altup_act"]
    n_kv_layers = g["n_layer_kv_from_start"]
    E, L = hp.n_embd, hp.n_layer
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    safe_pos = jnp.maximum(pos, 0)

    inv_freq, ms = ops.rope_frequencies(D, hp.n_rot, hp.rope_freq_base)
    if hp.rope_freq_base_swa > 0.0:
        inv_freq_swa, _ = ops.rope_frequencies(D, hp.n_rot,
                                               hp.rope_freq_base_swa)
    else:
        inv_freq_swa = inv_freq

    # iSWA cache bookkeeping (same plumbing as the shared llama forward)
    full_layers, swa_layers = iswa_layer_split(hp)
    fidx = {il: i for i, il in enumerate(full_layers)}
    sidx = {il: i for i, il in enumerate(swa_layers)}
    slots_full = kv_write_slots(cache.full, T)
    slots_swa = kv_ring_slots(pos, cache.swa.max_seq)
    cache = ISWACache(full=kv_advance(cache.full, slots_full, pos),
                      swa=kv_ring_advance(cache.swa, slots_swa, pos))
    mask_full = causal_mask(cache.full.pos, pos)
    mask_swa = causal_mask(cache.swa.pos, pos, hp.swa_window)

    x0 = params["token_embd"][tokens] * (E ** 0.5)           # (B,T,E)

    # ---- per-layer inputs: [B,T,L,EA] (project_per_layer_inputs)
    pl_embd = params["per_layer_token_embd"][tokens].reshape(B, T, L, EA)
    pl_embd = pl_embd * (EA ** 0.5)
    pl_proj = (mm(x0, params["per_layer_model_proj"]) / (E ** 0.5)
               ).reshape(B, T, L, EA)
    pl_proj = ops.rms_norm(pl_proj, params["per_layer_proj_norm"], hp.rms_eps)
    per_layer = (pl_proj + pl_embd) * (2.0 ** -0.5)

    # ---- expand to n_altup streams with magnitude matching
    target_mag = _magnitude(x0)
    added = jnp.einsum("bte,jeo->jbto", x0, params["altup_proj"])
    added = added * target_mag[None] / jnp.maximum(_magnitude(added), 1e-30)
    X = jnp.concatenate([x0[None], added], axis=0)           # (A,B,T,E)

    for il, layer in enumerate(params["layers"]):
        is_swa = hp.is_swa_layer(il)
        pred = _altup_predict(layer, hp, X, i_act)
        act = pred[i_act]
        h = ops.rms_norm(act, layer["attn_norm"], hp.rms_eps)
        laurel_out = _laurel(layer, hp, h)

        f = inv_freq_swa if is_swa else inv_freq
        q = mm(h, layer["wq"]).reshape(B, T, H, D)
        q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
        q = ops.apply_rope(q, safe_pos, f, hp.rope_type, ms)
        if il < n_kv_layers:
            k = mm(h, layer["wk"]).reshape(B, T, Hkv, D)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
            k = ops.apply_rope(k, safe_pos, f, hp.rope_type, ms)
            v = mm(h, layer["wv"]).reshape(B, T, Hkv, Dv)
            v = ops.rms_norm(v, None, hp.rms_eps)      # non-parametric RMS
            kv_il = il
            if is_swa:
                cache = cache._replace(swa=kv_update_layer(
                    cache.swa, sidx[il], slots_swa, k, v, mode="drop"))
            else:
                cache = cache._replace(full=kv_update_layer(
                    cache.full, fidx[il], slots_full, k, v))
        else:
            # shared-KV tail: attend the cache of the last same-type KV
            # layer (llama-model.cpp: n_kv_from_start − (swa ? 2 : 1))
            kv_il = n_kv_layers - (2 if is_swa else 1)
        if is_swa:
            ck, cv = cache.swa.k[sidx[kv_il]], cache.swa.v[sidx[kv_il]]
            use_mask = mask_swa
        else:
            ck, cv = cache.full.k[fidx[kv_il]], cache.full.v[fidx[kv_il]]
            use_mask = mask_full
        attn = ops.attention_ref(q, ck, cv, use_mask, scale=1.0)
        attn = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        attn = ops.rms_norm(attn, layer["attn_post_norm"], hp.rms_eps)
        attn = attn + act
        attn_laurel = (attn + laurel_out) * (2.0 ** -0.5)

        h2 = ops.rms_norm(attn_laurel, layer["ffn_norm"], hp.rms_eps)
        gate = mm(h2, layer["ffn_gate"])
        if g["sparsity"][il] > 0.0:
            gate = _gaussian_topk(gate, g["sparsity"][il])
        ffn = mm(_gelu(gate) * mm(h2, layer["ffn_up"]), layer["ffn_down"])
        ffn = ops.rms_norm(ffn, layer["ffn_post_norm"], hp.rms_eps)
        gated = ffn + attn_laurel

        corrected = _altup_correct(layer, hp, pred, gated, i_act)
        fp = corrected[i_act] * layer["altup_correct_scale"]
        fp = _gelu(mm(fp, layer["per_layer_inp_gate"]))      # (B,T,EA)
        fp = fp * per_layer[:, :, il]
        fp = mm(fp, layer["per_layer_proj"])                 # (B,T,E)
        fp = ops.rms_norm(fp, layer["per_layer_post_norm"], hp.rms_eps)
        X = jnp.concatenate([corrected[:1], corrected[1:] + fp[None]], axis=0)

    # merge streams: active + magnitude-matched unembeddings of the rest
    target_mag = _magnitude(X[i_act])
    unembd = jnp.einsum("jbte,jeo->jbto", X[1:], params["altup_unembd_proj"])
    unembd = unembd * target_mag[None] / jnp.maximum(_magnitude(unembd), 1e-30)
    x = (X[0] + unembd.sum(axis=0)) / A

    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    cap = hp.final_logit_softcap
    if cap > 0.0:
        logits = cap * jnp.tanh(logits.astype(jnp.float32) / cap
                                ).astype(logits.dtype)
    return logits, cache
