"""WavTokenizer decoder (audio-codes → STFT-frame embeddings).

Behavioral reference: src/models/wavtokenizer-dec.cpp — code embeddings →
conv1d(k7) → posnet (2 resnet blocks, 1 single-head attention block at il=2,
2 more resnet blocks, group norm at il=5) → token layernorm → convnext stack
(dw k7 + LN + pw1 gelu pw2 · gamma) → final LN → output head producing
(T, n_fft/2+1 magnitudes ∥ phases) consumed by tools/tts.embd_to_audio.
Tensor names/shapes per src/llama-model.cpp:5925-6022.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from .hparams import HParams


def _conv1d_same(x: jax.Array, w: jax.Array, b: jax.Array | None,
                 groups: int = 1) -> jax.Array:
    """x (B, T, Cin); w (Cout, Cin/groups, K) [GGUF layout]; SAME padding."""
    kernel = w.transpose(2, 1, 0)                  # (K, Cin/groups, Cout)
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    if b is not None:
        y = y + b.reshape(-1)
    return y


def _group_norm(x: jax.Array, w: jax.Array, b: jax.Array,
                n_groups: int, eps: float) -> jax.Array:
    """GroupNorm over (T, C/G) per group; x (B, T, C) (ggml_group_norm)."""
    B, T, C = x.shape
    g = x.reshape(B, T, n_groups, C // n_groups).astype(jnp.float32)
    mu = g.mean(axis=(1, 3), keepdims=True)
    var = g.var(axis=(1, 3), keepdims=True)
    g = ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, C).astype(x.dtype)
    return g * w.reshape(-1) + b.reshape(-1)


def wavtokenizer_decode(params: dict, hp: HParams,
                        codes: jax.Array) -> jax.Array:
    """codes (B, T) int32 → (B, T, n_embd_out) STFT-frame embeddings."""
    gn = lambda x, l, p: _group_norm(x, l[p + "_w"], l[p + "_b"],
                                     hp.n_norm_groups, hp.f_norm_group_eps)
    x = params["token_embd"][codes]                        # (B, T, features)
    x = _conv1d_same(x, params["conv1d"], params.get("conv1d_b"))

    for il, layer in enumerate(params["posnet"]):
        inp = x
        if "norm1_w" in layer:                              # resnet block
            h = gn(x, layer, "norm1")
            h = h * jax.nn.sigmoid(h)                       # swish
            h = _conv1d_same(h, layer["conv1"], layer.get("conv1_b"))
            h = gn(h, layer, "norm2")
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, layer["conv2"], layer.get("conv2_b"))
            x = h + inp
        elif "attn_q" in layer:                             # attention block
            h = gn(x, layer, "attn_norm")
            q = _conv1d_same(h, layer["attn_q"], layer.get("attn_q_b"))
            k = _conv1d_same(h, layer["attn_k"], layer.get("attn_k_b"))
            v = _conv1d_same(h, layer["attn_v"], layer.get("attn_v_b"))
            scores = jnp.einsum("btc,bsc->bts", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(scores / (q.shape[-1] ** 0.5), axis=-1)
            h = jnp.einsum("bts,bsc->btc", p.astype(x.dtype), v)
            h = _conv1d_same(h, layer["attn_o"], layer.get("attn_o_b"))
            x = h + inp
        else:                                               # final group norm
            x = gn(x, layer, "norm")

    x = ops.layer_norm(x, params["token_embd_norm"].reshape(-1),
                       params["token_embd_norm_b"].reshape(-1), hp.norm_eps)

    for layer in params["convnext"]:
        h = _conv1d_same(x, layer["dw"], layer.get("dw_b"),
                         groups=x.shape[-1])
        h = ops.layer_norm(h, layer["norm"], layer.get("norm_b"), hp.norm_eps)
        h = ops.gelu(h @ layer["pw1"] + layer["pw1_b"])
        h = h @ layer["pw2"] + layer["pw2_b"]
        h = h * layer["gamma"]
        x = x + h

    x = ops.layer_norm(x, params["output_norm"],
                       params.get("output_norm_b"), hp.norm_eps)
    x = x @ params["output"]
    if params.get("output_b") is not None:
        x = x + params["output_b"]
    return x
