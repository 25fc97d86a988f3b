"""DeepSeek-V2/V3 family forward pass — MLA (multi-head latent attention).

Behavioral reference: src/models/deepseek2.cpp (llm_build_deepseek2) +
llama.cpp's MLA tensor layout. Correctness-first formulation: the compressed
KV latent is up-projected and the full per-head K/V are cached (standard
cache shapes); the absorbed-weight compressed-cache optimization is a perf
follow-up tracked in ops/.

Key shapes:
  q:  optional LoRA path  h → q_a(rank_q) → norm → q_b → (H, d_nope + d_rope)
  kv: h → kv_a(rank_kv + d_rope); latent part norm → kv_b → (H, d_nope + d_v)
  rope applies only to the d_rope slices; k_rope is a single shared head.
MoE: leading dense layers, softmax gate → top-k (scaled by
expert_weights_scale), always-on shared experts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.kv_cache import (
    KVCache,
    causal_mask,
    kv_advance,
    kv_update_layer,
    kv_write_slots,
)
from .hparams import HParams
from .llama import dense_ffn, mm, moe_ffn


def deepseek2_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,
    pos: jax.Array,
    cache: KVCache,
    flash: bool | None = None,
) -> tuple[jax.Array, KVCache]:
    B, T = tokens.shape
    H = hp.n_head
    d_rope = hp.n_rot
    d_nope = hp.head_dim - d_rope
    d_v = hp.head_dim_v

    inv_freq, mscale = ops.rope_frequencies(d_rope, d_rope, hp.rope_freq_base,
                                            1.0 / hp.rope_scale_factor
                                            if hp.rope_scaling == "linear" else 1.0)
    kq_scale = hp.f_attn_scale if hp.f_attn_scale > 0.0 else 1.0 / (hp.head_dim ** 0.5)

    x = params["token_embd"][tokens] * hp.f_embedding_scale
    slots = kv_write_slots(cache, T)
    cache = kv_advance(cache, slots, pos)
    mask = causal_mask(cache.pos, pos)
    safe_pos = jnp.maximum(pos, 0)

    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)

        if "wq_a" in layer:  # query LoRA compression
            qc = ops.rms_norm(mm(h, layer["wq_a"]), layer["attn_q_a_norm"], hp.rms_eps)
            q = mm(qc, layer["wq_b"])
        else:
            q = mm(h, layer["wq"])
        q = q.reshape(B, T, H, d_nope + d_rope)
        q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]

        ckv = mm(h, layer["wkv_a"])                    # (B,T, rank_kv + d_rope)
        kv_c, k_pe = ckv[..., :-d_rope], ckv[..., -d_rope:]
        kv = mm(ops.rms_norm(kv_c, layer["attn_kv_a_norm"], hp.rms_eps),
                layer["wkv_b"])                        # (B,T, H*(d_nope+d_v))
        kv = kv.reshape(B, T, H, d_nope + d_v)
        k_nope, v = kv[..., :d_nope], kv[..., d_nope:]

        rt = hp.rope_type if hp.rope_type >= 0 else ops.ROPE_TYPE_NORM
        q_pe = ops.apply_rope(q_pe, safe_pos, inv_freq, rt, mscale)
        k_pe = ops.apply_rope(k_pe[:, :, None, :], safe_pos, inv_freq,
                              rt, mscale)  # (B,T,1,d_rope)

        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe, (B, T, H, d_rope))], axis=-1)
        q = jnp.concatenate([q_nope, q_pe], axis=-1)

        cache = kv_update_layer(cache, il, slots, k, v)
        attn = ops.attention_ref(q, cache.k[il], cache.v[il], mask,
                                 scale=kq_scale)
        attn = mm(attn.reshape(B, T, H * d_v), layer["wo"])
        x = x + attn * hp.f_residual_scale   # minicpm3: 1.4/sqrt(n_layer)

        h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        if "ffn_gate_exps" in layer and il >= hp.n_layer_dense_lead:
            ffn = moe_ffn(h, layer, hp)
        else:
            ffn = dense_ffn(h, layer, hp)
        x = x + ffn * hp.f_residual_scale

    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    if hp.logit_scale != 1.0:   # minicpm3 lm-head scaling n_embd_base/n_embd
        logits = logits * hp.logit_scale
    return logits, cache
