"""Encoder-family forwards: BERT variants + ModernBERT/NeoBERT +
EmbeddingGemma — all bidirectional, no KV cache, used by the embeddings /
rerank pipeline (pooling + optional classification head; tools/server
/embeddings and /rerank counterparts).

Behavioral references:
  src/models/bert.cpp — one builder covers bert (learned positions, GELU-seq
    FFN w/ biases), nomic-bert (NEOX rope, silu-par gated FFN), nomic-bert-moe
    (rope, gate-less GELU MoE on every Nth layer, GELU-seq dense elsewhere),
    jina-bert-v2 (ALiBi, geglu/gelu FFN, optional second attn norm with a
    double residual), jina-bert-v3 (rope + GELU-seq); optional fused wqkv and
    full-width q/k LayerNorms. Post-norm residuals throughout.
  src/models/modern-bert.cpp — pre-norm LayerNorm (layer 0 ships no attn
    norm), fused wqkv, NEOX rope with a separate base on symmetric
    sliding-window layers (every 3rd layer global), fused GEGLU FFN, final
    output_norm.
  src/models/neo-bert.cpp — pre-norm RMS, fused wqkv, NORM rope, fused
    SWIGLU FFN, final enc.output_norm.
  src/models/gemma-embedding.cpp — the gemma3 graph run bidirectionally with
    symmetric SWA (pattern 6), q scaled by f_attention_scale, GELU-par FFN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from .hparams import HParams
from .llama import mm

PRE_NORM_ENCODERS = {"modern-bert", "neo-bert"}
ROPE_ENCODERS = {"nomic-bert", "nomic-bert-moe", "jina-bert-v3",
                 "modern-bert", "neo-bert", "gemma-embedding"}
ENCODER_ARCHS = {"bert", "nomic-bert", "nomic-bert-moe", "jina-bert-v2",
                 "jina-bert-v3", "modern-bert", "neo-bert", "gemma-embedding"}


def _alibi_bias(hp: HParams, T: int) -> jax.Array:
    """(H, T, T) BIDIRECTIONAL ALiBi bias −slope·|q−k| (jina-bert-v2): the
    causal shift-invariant slope·k form is NOT valid for encoders; the
    reference writes −|p0−p1| into the mask and soft_max_ext multiplies by
    the per-head slope (llama-graph.cpp:350)."""
    H = hp.n_head
    n2 = 1 << (H.bit_length() - 1)
    m0 = 2.0 ** (-hp.max_alibi_bias / n2)
    m1 = 2.0 ** (-hp.max_alibi_bias / (2 * n2))
    slopes = jnp.asarray(
        [m0 ** (i + 1) if i < n2 else m1 ** (2 * (i - n2) + 1)
         for i in range(H)], jnp.float32)
    d = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
                ).astype(jnp.float32)
    return -slopes[:, None, None] * d[None]


def _enc_masks(hp: HParams, attn_mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(full, swa) additive bidirectional masks (B, H|1, T, T); the swa mask
    adds the SYMMETRIC window constraint |q_pos − k_pos| < n_swa
    (LLAMA_SWA_TYPE_SYMMETRIC, llama-hparams.h:302)."""
    B, T = attn_mask.shape
    pad = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
    full = pad
    if hp.arch == "jina-bert-v2":
        full = pad + _alibi_bias(hp, T)[None]
    if hp.swa_window > 0:
        # SYMMETRIC: visible iff |q−k| ≤ n_swa/2 (half-window each side,
        # llama-hparams.h LLAMA_SWA_TYPE_SYMMETRIC)
        d = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
        swa = jnp.where(d <= hp.swa_window // 2, 0.0, -jnp.inf)[None, None]
        return full, full + swa
    return full, full


def _enc_moe(layer: dict, hp: HParams, x: jax.Array) -> jax.Array:
    """nomic-bert-moe: gate-less GELU experts, softmax top-k, unnormalized
    weights (bert.cpp build_moe_ffn call: GELU, norm_w=false)."""
    probs = jax.nn.softmax(
        mm(x, layer["ffn_gate_inp"]).astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, hp.n_expert_used)
    up = layer["ffn_up_exps"][top_i]            # (B,T,K,E,F) gather
    down = layer["ffn_down_exps"][top_i]
    h = jnp.einsum("btd,btkdf->btkf", x, up, preferred_element_type=jnp.float32)
    h = ops.ACT_FNS["gelu_tanh"](h.astype(x.dtype))
    o = jnp.einsum("btkf,btkfo->btko", h, down,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("btko,btk->bto", o, top_w).astype(x.dtype)


def _enc_ffn(layer: dict, hp: HParams, x: jax.Array, il: int) -> jax.Array:
    """Encoder FFN. Fused gate‖up tensors (modern-bert GEGLU, neo-bert
    SWIGLU, jina-v2 geglu) are split into gate/up at load; the reference's
    ggml_gelu is the TANH approximation (ggml-cpu/vec.h:976)."""
    n = hp.extra.get("moe_every_n_layers", 0)
    if n > 0 and il % n == 1 and "ffn_up_exps" in layer:
        return _enc_moe(layer, hp, x)
    gelu = ops.ACT_FNS["gelu_tanh"]
    up = mm(x, layer["ffn_up"])
    if "ffn_up_b" in layer:
        up = up + layer["ffn_up_b"]
    if "ffn_gate" in layer:                      # gated: silu (nomic/neo) or
        gate = mm(x, layer["ffn_gate"])          # gelu (jina-v2/modern-bert)
        actf = (jax.nn.silu if hp.arch in ("nomic-bert", "neo-bert")
                else gelu)
        act = actf(gate) * up
    else:                                        # bert/jina-v3/moe-dense GELU
        act = gelu(up)
    out = mm(act, layer["ffn_down"])
    if "ffn_down_b" in layer:
        out = out + layer["ffn_down_b"]
    return out


def bert_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,       # (B, T) int32
    attn_mask: jax.Array,    # (B, T) 1 = real token, 0 = padding
) -> jax.Array:
    """Returns final hidden states (B, T, E)."""
    arch = hp.arch
    if arch == "gemma-embedding":
        return gemma_embedding_forward(params, hp, tokens, attn_mask)
    B, T = tokens.shape
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    prenorm = arch in PRE_NORM_ENCODERS
    rms = hp.norm_type == "rms"

    def norm(v, w, b=None):
        return (ops.rms_norm(v, w, hp.rms_eps) if rms
                else ops.layer_norm(v, w, b, hp.norm_eps))

    x = params["token_embd"][tokens]
    if params.get("token_types") is not None:
        x = x + params["token_types"][jnp.zeros_like(tokens)]
    if arch == "bert" and params.get("position_embd") is not None:
        x = x + params["position_embd"][jnp.arange(T)][None]
    if params.get("token_embd_norm") is not None:
        x = norm(x, params["token_embd_norm"], params.get("token_embd_norm_b"))

    mask_full, mask_swa = _enc_masks(hp, attn_mask)
    rope = arch in ROPE_ENCODERS and hp.rope_type >= 0
    if rope:
        inv_freq, mscale = ops.rope_frequencies(D, hp.n_rot, hp.rope_freq_base)
        if hp.rope_freq_base_swa > 0.0:
            inv_freq_swa, _ = ops.rope_frequencies(D, hp.n_rot,
                                                   hp.rope_freq_base_swa)
        else:
            inv_freq_swa = inv_freq
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    # under a symmetric window, fully-masked padded QUERY rows go NaN in the
    # softmax; keep padded rows zeroed so masked-out (0-weight) V rows can't
    # re-poison real rows in later layers (0·NaN = NaN)
    live = attn_mask[..., None] > 0

    for il, layer in enumerate(params["layers"]):
        swa = hp.swa_window > 0 and hp.is_swa_layer(il)
        x = jnp.where(live, x, 0)
        h = x
        if prenorm and "attn_norm" in layer:     # modern-bert layer 0: none
            h = norm(h, layer["attn_norm"], layer.get("attn_norm_b"))
        q = mm(h, layer["wq"])
        k = mm(h, layer["wk"])
        v = mm(h, layer["wv"])
        if "bq" in layer:
            q, k, v = q + layer["bq"], k + layer["bk"], v + layer["bv"]
        if "attn_q_norm" in layer:               # full-width LN (bert family)
            q = norm(q, layer["attn_q_norm"], layer.get("attn_q_norm_b"))
            k = norm(k, layer["attn_k_norm"], layer.get("attn_k_norm_b"))
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, Hkv, D)
        v = v.reshape(B, T, Hkv, Dv)
        if rope:
            f = inv_freq_swa if swa else inv_freq
            q = ops.apply_rope(q, pos, f, hp.rope_type, mscale)
            k = ops.apply_rope(k, pos, f, hp.rope_type, mscale)
        attn = ops.attention_ref(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3),
                                 mask_swa if swa else mask_full,
                                 scale=1.0 / (D ** 0.5))
        attn = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        if "bo" in layer:
            attn = attn + layer["bo"]

        if prenorm:
            x = x + attn
            h2 = norm(x, layer["ffn_norm"], layer.get("ffn_norm_b"))
            x = x + _enc_ffn(layer, hp, h2, il)
            continue
        # post-norm (bert family)
        x_in = x
        x = norm(x + attn, layer["attn_post_norm"],
                 layer.get("attn_post_norm_b"))
        if "attn_norm_2" in layer:               # jina-v2 double residual
            x = norm(x + x_in, layer["attn_norm_2"],
                     layer.get("attn_norm_2_b"))
        ff = _enc_ffn(layer, hp, x, il)
        x = norm(x + ff, layer["ffn_post_norm"],
                 layer.get("ffn_post_norm_b"))

    if params.get("output_norm") is not None:
        x = norm(x, params["output_norm"], params.get("output_norm_b"))
    return x


def gemma_embedding_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,
    attn_mask: jax.Array,
) -> jax.Array:
    """EmbeddingGemma: the gemma3 block run bidirectionally — symmetric SWA,
    per-head q/k RMS norms, per-layer rope base, q × f_attention_scale with
    kq_scale 1 (gemma-embedding.cpp:35-39), GELU-par FFN, dual post-norms."""
    B, T = tokens.shape
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    mask_full, mask_swa = _enc_masks(hp, attn_mask)
    inv_freq, mscale = ops.rope_frequencies(D, hp.n_rot, hp.rope_freq_base)
    if hp.rope_freq_base_swa > 0.0:
        inv_freq_swa, _ = ops.rope_frequencies(D, hp.n_rot,
                                               hp.rope_freq_base_swa)
    else:
        inv_freq_swa = inv_freq
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    qscale = hp.f_attn_scale if hp.f_attn_scale > 0.0 else 1.0 / (D ** 0.5)

    x = params["token_embd"][tokens] * (hp.n_embd ** 0.5)
    live = attn_mask[..., None] > 0     # see bert_forward: NaN containment
    for il, layer in enumerate(params["layers"]):
        swa = hp.swa_window > 0 and hp.is_swa_layer(il)
        x = jnp.where(live, x, 0)
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = mm(h, layer["wq"]).reshape(B, T, H, D)
        k = mm(h, layer["wk"]).reshape(B, T, Hkv, D)
        v = mm(h, layer["wv"]).reshape(B, T, Hkv, Dv)
        q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
        k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
        f = inv_freq_swa if swa else inv_freq
        q = ops.apply_rope(q, pos, f, hp.rope_type, mscale)
        k = ops.apply_rope(k, pos, f, hp.rope_type, mscale)
        q = q * qscale
        attn = ops.attention_ref(q, k.transpose(0, 2, 1, 3),
                                 v.transpose(0, 2, 1, 3),
                                 mask_swa if swa else mask_full, scale=1.0)
        attn = mm(attn.reshape(B, T, H * Dv), layer["wo"])
        if "attn_post_norm" in layer:
            attn = ops.rms_norm(attn, layer["attn_post_norm"], hp.rms_eps)
        x = x + attn
        h2 = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        gate = mm(h2, layer["ffn_gate"])
        ff = mm(ops.ACT_FNS["gelu_tanh"](gate) * mm(h2, layer["ffn_up"]),
                layer["ffn_down"])
        if "ffn_post_norm" in layer:
            ff = ops.rms_norm(ff, layer["ffn_post_norm"], hp.rms_eps)
        x = x + ff
    return ops.rms_norm(x, params["output_norm"], hp.rms_eps)


def pool(hidden: jax.Array, attn_mask: jax.Array, pooling: str = "mean",
         normalize: bool = True) -> jax.Array:
    """Sequence pooling (llama_pooling_type counterpart: NONE/MEAN/CLS/LAST)."""
    m = attn_mask.astype(hidden.dtype)[..., None]
    if pooling == "mean":
        # padded QUERY rows can be all-masked under symmetric SWA → NaN
        # hidden states; zero them before pooling (0·NaN would still be NaN)
        out = jnp.where(m > 0, hidden, 0).sum(1) / jnp.maximum(m.sum(1), 1e-9)
    elif pooling == "cls":
        out = hidden[:, 0]
    elif pooling == "last":
        idx = attn_mask.sum(1).astype(jnp.int32) - 1
        out = hidden[jnp.arange(hidden.shape[0]), idx]
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if normalize:
        out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-9)
    return out


def rerank_score(params: dict, hidden: jax.Array, attn_mask: jax.Array) -> jax.Array:
    """Classification-head score per sequence (pooling RANK: cls head on the
    CLS token, tools/server /rerank counterpart)."""
    x = hidden[:, 0]
    if params.get("cls") is not None:
        x = jnp.tanh(mm(x, params["cls"]) + params["cls_b"])
    if params.get("cls_out") is not None:
        x = mm(x, params["cls_out"]) + params.get("cls_out_b", 0.0)
    return x[..., 0]
