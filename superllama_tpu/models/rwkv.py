"""RWKV6 ("Finch") and RWKV7 ("Goose") forward passes.

Behavioral reference: src/models/rwkv6{,-base}.cpp and rwkv7{,-base}.cpp for
the graph structure, and the CPU kernels ggml_compute_forward_rwkv_wkv6/7
(ggml/src/ggml-cpu/ops.cpp:9410,9901) for the exact recurrence semantics:

  wkv6:  y_j += r_i · (u_i k_i v_j + S[i,j]);  S[i,j] ← w_{t,i} S[i,j] + k_i v_j
  wkv7:  sa_i = Σ_j a_j S[i,j];
         S[i,j] ← w_j S[i,j] + v_i k_j + sa_i b_j;   y_i = Σ_j S[i,j] r_j

TPU-native: the per-token recurrence is a lax.scan with the (B,H,D,D) state in
f32; everything around it is batched matmuls. State (token-shift pair + wkv
matrix) lives in an RWKVCache, so prefill and decode share one functional step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.recurrent import RWKVCache
from .hparams import HParams
from .llama import mm


def _group_norm(x: jax.Array, weight, bias, n_head: int,
                eps: float = 64e-5) -> jax.Array:
    """ggml_norm over head_size groups + affine (time_mix_ln),
    rwkv6-base.cpp:151-157."""
    B, T, E = x.shape
    g = x.reshape(B, T, n_head, E // n_head).astype(jnp.float32)
    mu = g.mean(axis=-1, keepdims=True)
    var = g.var(axis=-1, keepdims=True)
    g = ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(B, T, E).astype(x.dtype)
    return g * weight + bias


def wkv6(r, k, v, u, w, state):
    """RWKV6 linear-attention recurrence (ggml-cpu/ops.cpp:9410 semantics).

    r/k/v/w: (B, T, H, D); u: (H, D); state: (B, H, D, D) with [i=key, j=val].
    Returns (y (B,T,H,D), state).
    """
    def step(S, inp):
        r_t, k_t, v_t, w_t = inp                               # (B,H,D)
        kv = jnp.einsum("bhi,bhj->bhij", k_t, v_t)             # keyᵢ ⊗ valⱼ
        y = jnp.einsum("bhi,bhij->bhj", r_t, S + u[None, :, :, None] * kv)
        S = S * w_t[..., None] + kv
        return S, y

    tx = lambda x: x.astype(jnp.float32).transpose(1, 0, 2, 3)  # (T,B,H,D)
    state, ys = jax.lax.scan(step, state.astype(jnp.float32),
                             (tx(r), tx(k), tx(v), tx(w)))
    return ys.transpose(1, 0, 2, 3), state


def wkv7(r, w, k, v, a, b, state):
    """RWKV7 recurrence (ggml-cpu/ops.cpp:9901 semantics).

    All of r/w/k/v/a/b: (B, T, H, D); state: (B, H, D, D) with [i=val, j=key].
    """
    def step(S, inp):
        r_t, w_t, k_t, v_t, a_t, b_t = inp
        sa = jnp.einsum("bhj,bhij->bhi", a_t, S)               # (B,H,D)
        S = (S * w_t[:, :, None, :]
             + jnp.einsum("bhi,bhj->bhij", v_t, k_t)
             + jnp.einsum("bhi,bhj->bhij", sa, b_t))
        y = jnp.einsum("bhij,bhj->bhi", S, r_t)
        return S, y

    tx = lambda x: x.astype(jnp.float32).transpose(1, 0, 2, 3)
    state, ys = jax.lax.scan(step, state.astype(jnp.float32),
                             (tx(r), tx(w), tx(k), tx(v), tx(a), tx(b)))
    return ys.transpose(1, 0, 2, 3), state


def gla(r, k, v, w, state, scale: float):
    """Gated linear attention (ggml_gated_linear_attn, ggml-cpu/ops.cpp:9626):
    S = S·diag(w) + k⊗v BEFORE the output read y = scale·r·S; no bonus term.
    Used by the qrwkv archs (rwkv6qwen2)."""
    def step(S, inp):
        r_t, k_t, v_t, w_t = inp                               # (B,H,D)
        S = S * w_t[..., None] + jnp.einsum("bhi,bhj->bhij", k_t, v_t)
        y = jnp.einsum("bhi,bhij->bhj", r_t * scale, S)
        return S, y

    tx = lambda x: x.astype(jnp.float32).transpose(1, 0, 2, 3)
    state, ys = jax.lax.scan(step, state.astype(jnp.float32),
                             (tx(r), tx(k), tx(v), tx(w)))
    return ys.transpose(1, 0, 2, 3), state


def _token_shift(x_norm: jax.Array, shift: jax.Array) -> jax.Array:
    """x_prev: previous token's value per position; first position comes from
    the carried shift state (rwkv6.cpp:36-38)."""
    return jnp.concatenate([shift[:, None, :], x_norm[:, :-1, :]], axis=1)


def _rwkv6_time_mix(layer: dict, hp: HParams, cur: jax.Array,
                    x_prev: jax.Array, state: jax.Array):
    B, T, E = cur.shape
    D = hp.wkv_head_size
    H = E // D

    sx = x_prev - cur
    xxx = cur + sx * layer["time_mix_lerp_x"].reshape(E)
    xxx = jnp.tanh(mm(xxx, layer["time_mix_w1"]))              # (B,T,5*ed)
    ed = xxx.shape[-1] // 5
    xxx = xxx.reshape(B, T, 5, ed)
    w2 = layer["time_mix_w2"]                                  # (5, ed, E)
    xxx = jnp.einsum("btif,ifo->btio", xxx, w2)                # (B,T,5,E)

    if "time_mix_lerp_fused" in layer:
        fused = layer["time_mix_lerp_fused"].reshape(5, E)
        mixed = cur[:, :, None, :] + (xxx + fused) * sx[:, :, None, :]
        xw, xk, xv, xr, xg = [mixed[:, :, i, :] for i in range(5)]
    else:
        lerps = [layer["time_mix_lerp_" + n].reshape(E)
                 for n in ("w", "k", "v", "r", "g")]
        xw, xk, xv, xr, xg = [
            cur + (xxx[:, :, i, :] + lerps[i]) * sx for i in range(5)
        ]

    # qrwkv (rwkv6qwen2): no bonus tensor, sigmoid gate, GQA k/v, k·(1−w),
    # gated-linear-attention recurrence, no group norm (rwkv6-base.cpp:20)
    qrwkv = "time_mix_first" not in layer
    r = mm(xr, layer["time_mix_receptance"])
    k = mm(xk, layer["time_mix_key"])
    v = mm(xv, layer["time_mix_value"])
    if "time_mix_receptance_b" in layer:
        r = r + layer["time_mix_receptance_b"]
    if "time_mix_key_b" in layer:
        k = k + layer["time_mix_key_b"]
    if "time_mix_value_b" in layer:
        v = v + layer["time_mix_value_b"]
    gate = mm(xg, layer["time_mix_gate"])
    g = jax.nn.sigmoid(gate) if qrwkv else ops.silu(gate)
    if k.shape[-1] != E:                       # GQA: repeat kv heads
        Hkv = k.shape[-1] // D
        k = jnp.repeat(k.reshape(B, T, Hkv, 1, D), H // Hkv, 2).reshape(B, T, E)
        v = jnp.repeat(v.reshape(B, T, Hkv, 1, D), H // Hkv, 2).reshape(B, T, E)

    w = mm(jnp.tanh(mm(xw, layer["time_mix_decay_w1"])), layer["time_mix_decay_w2"])
    w = w + layer["time_mix_decay"].reshape(E)
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    shp = (B, T, H, D)
    if qrwkv:
        k = k * (1.0 - w).astype(k.dtype)
        y, state = gla(r.reshape(shp), k.reshape(shp), v.reshape(shp),
                       w.reshape(shp), state, D ** -0.5)
        y = y.reshape(B, T, E).astype(cur.dtype)
    else:
        u = layer["time_mix_first"].reshape(H, D).astype(jnp.float32)
        y, state = wkv6(r.reshape(shp), k.reshape(shp), v.reshape(shp),
                        u, w.reshape(shp), state)
        y = y.reshape(B, T, E).astype(cur.dtype)
        y = _group_norm(y, layer["time_mix_ln"], layer["time_mix_ln_b"], H)
    y = y * g
    return mm(y, layer["time_mix_output"]), state


def _rwkv7_time_mix(layer: dict, hp: HParams, cur: jax.Array,
                    x_prev: jax.Array, state: jax.Array,
                    v_first: jax.Array | None):
    B, T, E = cur.shape
    D = hp.wkv_head_size
    H = E // D
    has_gating = "time_mix_g1" in layer

    sx = x_prev - cur
    n_mix = 6 if has_gating else 5
    fused = layer["time_mix_lerp_fused"].reshape(n_mix, E)
    mixed = cur[:, :, None, :] + fused * sx[:, :, None, :]     # (B,T,n,E)
    xr, xw, xk, xv = (mixed[:, :, i, :] for i in range(4))
    xa = mixed[:, :, 4, :]
    xg = mixed[:, :, 5, :] if has_gating else None

    r = mm(xr, layer["time_mix_receptance"])
    w = mm(jnp.tanh(mm(xw, layer["time_mix_w1"])), layer["time_mix_w2"])
    w = w + layer["time_mix_w0"].reshape(E)
    # decay ∈ (exp(-0.606531), 1): exp(-e^-0.5 · sigmoid(w)) per rwkv7-base.cpp:69
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w.astype(jnp.float32)))

    k = mm(xk, layer["time_mix_key"])
    v = mm(xv, layer["time_mix_value"])
    if v_first is None:
        v_first = v
    else:
        # residual value mixing toward the first layer's value stream
        lv = mm(mm(xv, layer["time_mix_v1"]), layer["time_mix_v2"])
        v = v + (v_first - v) * jax.nn.sigmoid(lv + layer["time_mix_v0"].reshape(E))

    a = jax.nn.sigmoid(
        mm(mm(xa, layer["time_mix_a1"]), layer["time_mix_a2"])
        + layer["time_mix_a0"].reshape(E))

    kk = (k * layer["time_mix_k_k"].reshape(E)).reshape(B, T, H, D)
    kk = kk * jax.lax.rsqrt(
        jnp.sum(kk.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-12
    ).astype(kk.dtype)                                         # l2 norm per head
    ka = k * layer["time_mix_k_a"].reshape(E)
    k = k + a * ka - ka

    shp = (B, T, H, D)
    y, state = wkv7(r.reshape(shp), w.reshape(shp), k.reshape(shp),
                    v.reshape(shp), -kk, kk * a.reshape(shp), state)
    y = y.reshape(B, T, E).astype(cur.dtype)

    if "time_mix_ln" in layer:
        y = _group_norm(y, layer["time_mix_ln"], layer["time_mix_ln_b"], H)
    # bonus: per-head (r·k·r_k) scalar times v (rwkv7-base.cpp:124-126)
    rk = jnp.sum((k * r).reshape(shp)
                 * layer["time_mix_r_k"].reshape(H, D), axis=-1, keepdims=True)
    y = y + (v.reshape(shp) * rk).reshape(B, T, E)
    if has_gating:
        g = mm(jax.nn.sigmoid(mm(xg, layer["time_mix_g1"])), layer["time_mix_g2"])
        y = y * g
    return mm(y, layer["time_mix_output"]), state, v_first


def _channel_mix(layer: dict, cur: jax.Array, x_prev: jax.Array,
                 v7: bool) -> jax.Array:
    sx = x_prev - cur
    xk = cur + sx * layer["channel_mix_lerp_k"].reshape(-1)
    k = jnp.square(jax.nn.relu(mm(xk, layer["channel_mix_key"])))
    if v7:
        return mm(k, layer["channel_mix_value"])
    xr = cur + sx * layer["channel_mix_lerp_r"].reshape(-1)
    r = jax.nn.sigmoid(mm(xr, layer["channel_mix_receptance"]))
    return r * mm(k, layer["channel_mix_value"])


def _rwkv_forward(params, hp, tokens, cache, v7: bool):
    x = params["token_embd"][tokens]
    x = ops.layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_b"), hp.norm_eps)
    shift_new, wkv_new = [], []
    v_first = None
    for il, layer in enumerate(params["layers"]):
        att_norm = ops.layer_norm(x, layer["attn_norm"],
                                  layer.get("attn_norm_b"), hp.norm_eps)
        x_prev = _token_shift(att_norm, cache.shift[il, :, 0])
        if v7:
            y, wkv, v_first = _rwkv7_time_mix(layer, hp, att_norm, x_prev,
                                              cache.wkv[il], v_first)
        else:
            y, wkv = _rwkv6_time_mix(layer, hp, att_norm, x_prev,
                                     cache.wkv[il])
        x = x + y

        ffn_norm = ops.layer_norm(x, layer["attn_norm_2"],
                                  layer.get("attn_norm_2_b"), hp.norm_eps)
        x_prev = _token_shift(ffn_norm, cache.shift[il, :, 1])
        x = x + _channel_mix(layer, ffn_norm, x_prev, v7)

        shift_new.append(jnp.stack([att_norm[:, -1], ffn_norm[:, -1]], axis=1))
        wkv_new.append(wkv)
        if hp.rescale_every_n_layers and (il + 1) % hp.rescale_every_n_layers == 0:
            x = x * 0.5

    cache = RWKVCache(shift=jnp.stack(shift_new).astype(cache.shift.dtype),
                      wkv=jnp.stack(wkv_new))
    x = ops.layer_norm(x, params["output_norm"], params.get("output_norm_b"),
                       hp.norm_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache


def rwkv6_forward(params, hp, tokens, pos, cache: RWKVCache):
    """pos is unused (state is positionless); kept for registry API parity."""
    return _rwkv_forward(params, hp, tokens, cache, v7=False)


def rwkv7_forward(params, hp, tokens, pos, cache: RWKVCache):
    return _rwkv_forward(params, hp, tokens, cache, v7=True)


def arwkv7_forward(params, hp, tokens, pos, cache: RWKVCache):
    """ARWKV-7 (src/models/arwkv7.cpp): rwkv7 time mix (with v_first
    residual) between RMS norms and a qwen-style silu-gated FFN; ONE
    token-shift stream; no embedding LN; no channel mix."""
    from .llama import dense_ffn

    x = params["token_embd"][tokens]
    shift_new, wkv_new = [], []
    v_first = None
    for il, layer in enumerate(params["layers"]):
        att_norm = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        x_prev = _token_shift(att_norm, cache.shift[il, :, 0])
        y, wkv, v_first = _rwkv7_time_mix(layer, hp, att_norm, x_prev,
                                          cache.wkv[il], v_first)
        x = x + y
        h2 = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        x = x + dense_ffn(h2, layer, hp)
        shift_new.append(jnp.stack([att_norm[:, -1]] * 2, axis=1))
        wkv_new.append(wkv)
    cache = RWKVCache(shift=jnp.stack(shift_new).astype(cache.shift.dtype),
                      wkv=jnp.stack(wkv_new))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    logits = mm(x, params["output"])
    return logits, cache


def rwkv6qwen2_forward(params, hp, tokens, pos, cache: RWKVCache):
    """RWKV6-in-Qwen2 (src/models/rwkv6qwen2.cpp): qrwkv time mix (gated
    linear attention, no bonus/group-norm, sigmoid gate, GQA kv) between
    RMS norms with a Qwen2-style silu-gated FFN; ONE token-shift stream;
    no embedding LN."""
    from .llama import dense_ffn

    x = params["token_embd"][tokens]
    shift_new, wkv_new = [], []
    for il, layer in enumerate(params["layers"]):
        att_norm = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        x_prev = _token_shift(att_norm, cache.shift[il, :, 0])
        y, wkv = _rwkv6_time_mix(layer, hp, att_norm, x_prev, cache.wkv[il])
        x = x + y
        h2 = ops.rms_norm(x, layer["ffn_norm"], hp.rms_eps)
        x = x + dense_ffn(h2, layer, hp)
        shift_new.append(jnp.stack([att_norm[:, -1]] * 2, axis=1))
        wkv_new.append(wkv)
    cache = RWKVCache(shift=jnp.stack(shift_new).astype(cache.shift.dtype),
                      wkv=jnp.stack(wkv_new))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    logits = mm(x, params["output"])
    return logits, cache
