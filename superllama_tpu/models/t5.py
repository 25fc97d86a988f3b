"""T5 encoder-decoder (t5 / flan-t5 / t5encoder).

Behavioral reference: src/models/t5-enc.cpp + t5-dec.cpp (graph structure),
llama_relative_position_bucket (src/llama-graph.cpp:2357) for the relative
attention bias, GGUF tensor names enc.*/dec.* (src/llama-arch.cpp:409-435).
HF-parity tested against transformers T5ForConditionalGeneration.

TPU-native: encoder is one jitted call; decoder self-attention uses the
functional KVCache; cross K/V are precomputed once per request from the
encoder output (the counterpart of build_inp_cross_embd).
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
from .llama import mm

T5_MAX_DISTANCE = 128  # fixed in the reference (llama-graph.cpp:2359)


def relative_position_bucket(rel: jax.Array, n_buckets: int,
                             bidirectional: bool) -> jax.Array:
    """Bucket index for relative position rel = k_pos − q_pos
    (llama_relative_position_bucket semantics, = HF T5)."""
    bucket = jnp.zeros_like(rel)
    if bidirectional:
        n_buckets //= 2
        bucket = (rel > 0).astype(jnp.int32) * n_buckets
        rel = jnp.abs(rel)
    else:
        rel = -jnp.minimum(rel, 0)
    max_exact = n_buckets // 2
    import math
    large = max_exact + (
        jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(T5_MAX_DISTANCE / max_exact) * (n_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n_buckets - 1)
    return bucket + jnp.where(rel < max_exact, rel, large)


def _pos_bias(rel_b: jax.Array, q_pos: jax.Array, k_pos: jax.Array,
              n_buckets: int, bidirectional: bool) -> jax.Array:
    """(B, H, T, S) additive attention bias from the (n_buckets, H) embedding."""
    rel = k_pos[:, None, :] - q_pos[:, :, None]          # (B, T, S)
    buckets = relative_position_bucket(rel, n_buckets, bidirectional)
    bias = rel_b[buckets]                                # (B, T, S, H)
    return bias.transpose(0, 3, 1, 2)


def _attn(q, k, v, mask, n_head):
    """Unscaled multi-head attention with additive mask/bias (T5 uses no
    1/sqrt(d) — kq_scale 1.0 in t5-enc.cpp:49)."""
    B, T, E = q.shape
    S = k.shape[1]
    D = E // n_head
    H = n_head
    Hkv = k.shape[-1] // D
    qh = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, S, Hkv, D).transpose(0, 2, 1, 3)
    if Hkv != H:
        rep = H // Hkv
        kh = jnp.repeat(kh, rep, axis=1)
        vh = jnp.repeat(vh, rep, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = scores + mask
    p = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, T, E)


def _ffn(x, layer, sfx=""):
    gate = layer.get("ffn_gate" + sfx)
    up = mm(x, layer["ffn_up" + sfx])
    if gate is not None:  # flan-t5: gelu-gated (parallel)
        act = ops.gelu(mm(x, gate)) * up
    else:                 # t5: relu sequential
        act = jax.nn.relu(up)
    return mm(act, layer["ffn_down" + sfx])


def t5_encode(params: dict, hp: HParams, tokens: jax.Array) -> jax.Array:
    """Encoder stack → (B, S, E) embeddings (llm_build_t5_enc)."""
    B, S = tokens.shape
    x = params["token_embd"][tokens]
    pos = jnp.arange(S, dtype=jnp.int32)[None].repeat(B, 0)
    rel_b0 = None
    for layer in params["enc_layers"]:
        rel_b = layer.get("attn_rel_b_enc", rel_b0)
        if "attn_rel_b_enc" in layer and rel_b0 is None:
            rel_b0 = layer["attn_rel_b_enc"]
        bias = _pos_bias(rel_b, pos, pos, hp.n_rel_attn_bkts, True)
        h = ops.rms_norm(x, layer["attn_norm_enc"], hp.rms_eps)
        q = mm(h, layer["wq_enc"])
        k = mm(h, layer["wk_enc"])
        v = mm(h, layer["wv_enc"])
        attn = _attn(q, k, v, bias, hp.n_head)
        x = x + mm(attn, layer["wo_enc"])
        h = ops.rms_norm(x, layer["ffn_norm_enc"], hp.rms_eps)
        x = x + _ffn(h, layer, "_enc")
    return ops.rms_norm(x, params["output_norm_enc"], hp.rms_eps)


def t5_cross_kv(params: dict, hp: HParams, enc_out: jax.Array) -> list[dict]:
    """Precompute per-layer cross-attention K/V from the encoder output."""
    out = []
    for layer in params["dec_layers"]:
        out.append({
            "k": mm(enc_out, layer["wk_cross"]),
            "v": mm(enc_out, layer["wv_cross"]),
        })
    return out


def t5_decode(params: dict, hp: HParams, tokens: jax.Array, pos: jax.Array,
              cache: KVCache, cross_kv: list[dict],
              enc_mask: jax.Array | None = None):
    """Decoder step (llm_build_t5_dec): self-attn (cached, causal, rel-bias)
    + cross-attn into the encoder output + FFN. Returns (logits, cache)."""
    B, T = tokens.shape
    x = params["token_embd"][tokens]
    slots = kv_write_slots(cache, T)
    cache = kv_advance(cache, slots, pos)
    mask_self = causal_mask(cache.pos, pos)[:, 0]        # (B, T, S)
    mask_self = mask_self[:, None]                       # (B, 1, T, S)
    if enc_mask is None:
        cross_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
    else:
        cross_mask = jnp.where(enc_mask[:, None, None, :], 0.0, -jnp.inf)

    rel_b0 = None
    safe_pos = jnp.maximum(pos, 0)
    cache_pos = jnp.maximum(cache.pos, 0)
    for il, layer in enumerate(params["dec_layers"]):
        rel_b = layer.get("attn_rel_b", rel_b0)
        if "attn_rel_b" in layer and rel_b0 is None:
            rel_b0 = layer["attn_rel_b"]
        bias = _pos_bias(rel_b, safe_pos, cache_pos, hp.n_rel_attn_bkts, False)

        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        q = mm(h, layer["wq"])
        k = mm(h, layer["wk"])
        v = mm(h, layer["wv"])
        Hkv = hp.n_head_kv or hp.n_head
        D = hp.head_dim
        cache = kv_update_layer(cache, il, slots,
                                k.reshape(B, T, Hkv, D), v.reshape(B, T, Hkv, D))
        S = cache.max_seq
        kc = cache.k[il].transpose(0, 2, 1, 3).reshape(B, S, Hkv * D)
        vc = cache.v[il].transpose(0, 2, 1, 3).reshape(B, S, Hkv * D)
        attn = _attn(q, kc, vc, mask_self + bias, hp.n_head)
        x = x + mm(attn, layer["wo"])

        h = ops.rms_norm(x, layer["attn_norm_cross"], hp.rms_eps)
        qx = mm(h, layer["wq_cross"])
        attn = _attn(qx, cross_kv[il]["k"], cross_kv[il]["v"], cross_mask,
                     hp.n_head)
        x = x + mm(attn, layer["wo_cross"])

        h = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        x = x + _ffn(h, layer)

    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    if w_out is not None:
        logits = mm(x, w_out)
    else:  # tied embeddings: T5 scales by d_model^-0.5
        logits = (x * hp.n_embd ** -0.5) @ params["token_embd"].T
    return logits, cache


class T5Model:
    """Seq2seq convenience wrapper: encode once, greedy-decode with a KV
    cache (the decoder loop llama-cli runs for T5)."""

    def __init__(self, model, n_ctx: int = 512):
        self.model = model
        self.hp = model.hparams
        self.n_ctx = n_ctx
        self._encode = jax.jit(lambda p, t: t5_encode(p, self.hp, t))
        self._decode = jax.jit(
            lambda p, t, pos, c, ckv: t5_decode(p, self.hp, t, pos, c, ckv),
            donate_argnums=(3,))

    def generate(self, input_ids: list[int], n_gen: int = 32) -> list[int]:
        hp = self.hp
        params = self.model.params
        enc = self._encode(params, jnp.asarray([input_ids], jnp.int32))
        ckv = t5_cross_kv(params, hp, enc)
        cache = KVCache(
            k=jnp.zeros((hp.dec_n_layer, 1, hp.n_head_kv or hp.n_head,
                         self.n_ctx, hp.head_dim), jnp.float32),
            v=jnp.zeros((hp.dec_n_layer, 1, hp.n_head_kv or hp.n_head,
                         self.n_ctx, hp.head_dim_v), jnp.float32),
            pos=jnp.full((1, self.n_ctx), -1, jnp.int32),
            cursor=jnp.zeros((1,), jnp.int32),
        )
        tok = hp.dec_start_token_id
        out = []
        eos = self.model.tokenizer.vocab.eos_id if self.model.tokenizer else -1
        for i in range(n_gen):
            logits, cache = self._decode(
                params, jnp.asarray([[tok]], jnp.int32),
                jnp.asarray([[i]], jnp.int32), cache, ckv)
            tok = int(jnp.argmax(logits[0, -1]))
            if tok == eos:
                break
            out.append(tok)
        return out
