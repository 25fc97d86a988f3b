"""BERT-family encoder forward (bert/nomic-bert/jina-bert style).

Behavioral reference: src/models/bert.cpp (llm_build_bert) — bidirectional
encoder: token + position + token-type embeddings, post-attention and
post-FFN LayerNorms (post-norm architecture), GELU FFN with biases, no KV
cache. Used for the embeddings / rerank pipeline (pooling + optional
classification head, tools/server /embeddings and /rerank counterparts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from .hparams import HParams
from .llama import mm


def bert_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,       # (B, T) int32
    attn_mask: jax.Array,    # (B, T) 1 = real token, 0 = padding
) -> jax.Array:
    """Returns final hidden states (B, T, E)."""
    B, T = tokens.shape
    H, D = hp.n_head, hp.head_dim

    x = params["token_embd"][tokens]
    if params.get("token_types") is not None:
        x = x + params["token_types"][jnp.zeros_like(tokens)]
    if params.get("position_embd") is not None:
        x = x + params["position_embd"][jnp.arange(T)][None]
    x = ops.layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_b"), hp.norm_eps)

    # additive bidirectional mask from padding flags
    maskf = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -jnp.inf)

    for layer in params["layers"]:
        q = mm(x, layer["wq"]) + layer["bq"]
        k = mm(x, layer["wk"]) + layer["bk"]
        v = mm(x, layer["wv"]) + layer["bv"]
        q = q.reshape(B, T, H, D)
        k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)   # (B,H,T,D)
        v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        attn = ops.attention_ref(q, k, v, maskf, scale=1.0 / (D ** 0.5))
        attn = mm(attn.reshape(B, T, H * D), layer["wo"]) + layer["bo"]
        x = ops.layer_norm(x + attn, layer["attn_post_norm"],
                           layer.get("attn_post_norm_b"), hp.norm_eps)

        ff = mm(x, layer["ffn_up"]) + layer["ffn_up_b"]
        ff = ops.gelu_erf(ff)
        ff = mm(ff, layer["ffn_down"]) + layer["ffn_down_b"]
        x = ops.layer_norm(x + ff, layer["ffn_post_norm"],
                           layer.get("ffn_post_norm_b"), hp.norm_eps)
    return x


def pool(hidden: jax.Array, attn_mask: jax.Array, pooling: str = "mean",
         normalize: bool = True) -> jax.Array:
    """Sequence pooling (llama_pooling_type counterpart: NONE/MEAN/CLS/LAST)."""
    m = attn_mask.astype(hidden.dtype)[..., None]
    if pooling == "mean":
        out = (hidden * m).sum(1) / jnp.maximum(m.sum(1), 1e-9)
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
