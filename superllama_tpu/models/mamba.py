"""Mamba (selective state-space) forward pass.

Behavioral reference: src/models/mamba.cpp (llm_build_mamba) with semantics
cross-checked against the upstream selective-scan recurrence: per layer a
gated in-projection, depthwise causal conv over time, data-dependent (dt,B,C)
selection, the exp(dt·A) discretized state recurrence, skip D, silu gate,
out-projection. State lives in a RecurrentCache (conv shift + SSM state), so
prefill and decode are the same functional step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..runtime.recurrent import RecurrentCache
from .hparams import HParams
from .llama import mm


def _mamba_mixer(layer: dict, hp: HParams, x_in: jax.Array,
                 conv_state: jax.Array, ssm_state: jax.Array):
    """One mixer over (B, T, E). Returns (y, conv_state, ssm_state)."""
    B, T, _ = x_in.shape
    di, ds = hp.ssm_d_inner, hp.ssm_d_state
    dc, rank = hp.ssm_d_conv, hp.ssm_dt_rank

    xz = mm(x_in, layer["ssm_in"])                      # (B, T, 2*di)
    x, z = xz[..., :di], xz[..., di:]

    # depthwise causal conv over time: state carries the last dc-1 inputs
    seq = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # (B, dc-1+T, di)
    w = layer["ssm_conv1d"]                             # (dc, di)
    y = sum(seq[:, j:j + T] * w[j] for j in range(dc))
    if "ssm_conv1d_b" in layer:
        y = y + layer["ssm_conv1d_b"]
    new_conv = seq[:, T:]                               # last dc-1 inputs
    x = ops.silu(y)

    # selection
    sel = mm(x, layer["ssm_x"])                         # (B, T, rank+2*ds)
    dt = sel[..., :rank]
    Bm = sel[..., rank:rank + ds].astype(jnp.float32)   # (B, T, ds)
    Cm = sel[..., rank + ds:].astype(jnp.float32)
    if "ssm_dt_norm" in layer:  # jamba: RMS-normed dt/B/C selection streams
        dt = ops.rms_norm(dt, layer["ssm_dt_norm"], hp.rms_eps)
        Bm = ops.rms_norm(Bm, layer["ssm_b_norm"], hp.rms_eps)
        Cm = ops.rms_norm(Cm, layer["ssm_c_norm"], hp.rms_eps)
    elif hp.extra.get("ssm_dt_b_c_rms"):
        # falcon-mamba: NON-parametric RMS on the selection streams
        # (graph-context-mamba.cpp:94, ssm.dt_b_c_rms KV)
        dt = ops.rms_norm(dt, None, hp.rms_eps)
        Bm = ops.rms_norm(Bm, None, hp.rms_eps)
        Cm = ops.rms_norm(Cm, None, hp.rms_eps)
    dt = mm(dt, layer["ssm_dt"]) + layer["ssm_dt_b"]
    dt = jax.nn.softplus(dt.astype(jnp.float32))        # (B, T, di)

    # GGUF ssm_a stores A = -exp(A_log) ALREADY TRANSFORMED (ecosystem
    # convention, convert_hf_to_gguf.py "A_log --> A"); use it directly
    A = layer["ssm_a"].astype(jnp.float32)              # (di, ds)
    xf = x.astype(jnp.float32)

    def step(state, inp):
        dt_t, b_t, c_t, x_t = inp                       # (B,di) (B,ds) (B,ds) (B,di)
        dA = jnp.exp(dt_t[..., None] * A[None])         # (B, di, ds)
        dBx = (dt_t * x_t)[..., None] * b_t[:, None, :]
        state = state * dA + dBx
        y_t = jnp.einsum("bds,bs->bd", state, c_t)
        return state, y_t

    ssm_f = ssm_state.astype(jnp.float32)
    ssm_f, ys = jax.lax.scan(
        step, ssm_f,
        (dt.transpose(1, 0, 2), Bm.transpose(1, 0, 2),
         Cm.transpose(1, 0, 2), xf.transpose(1, 0, 2)))
    y = ys.transpose(1, 0, 2) + xf * layer["ssm_d"].astype(jnp.float32)
    y = (y.astype(x.dtype)) * ops.silu(z)
    out = mm(y, layer["ssm_out"])
    return out, new_conv.astype(conv_state.dtype), ssm_f.astype(ssm_state.dtype)


def _mamba2_mixer(layer: dict, hp: HParams, x_in: jax.Array,
                  conv_state: jax.Array, ssm_state: jax.Array):
    """Mamba-2 mixer (build_mamba2_layer, src/models/graph-context-mamba.cpp:146):
    fused [z | xBC | dt] in-projection, conv over the concatenated [x,B,C]
    stream, per-head scalar decay A, grouped B/C (head h -> group
    h // (n_head/G), ggml-cpu/ops.cpp ssm_scan 'repeat_interleave'), skip-D,
    silu(z) gate, optional grouped RMS norm, out-projection.

    ssm_state is the flat (B, d_inner, d_state) layout shared with mamba1;
    heads are a reshape (n_head, head_dim) of d_inner.
    """
    B, T, _ = x_in.shape
    di, ds = hp.ssm_d_inner, hp.ssm_d_state
    dc, nh, G = hp.ssm_d_conv, hp.ssm_dt_rank, hp.ssm_n_group
    hd = di // nh
    conv_dim = di + 2 * G * ds

    zxbcdt = mm(x_in, layer["ssm_in"])              # (B,T, 2di + 2G·ds + nh)
    z = zxbcdt[..., :di]
    xBC = zxbcdt[..., di:di + conv_dim]
    dt = zxbcdt[..., di + conv_dim:]                # (B,T,nh)

    # depthwise causal conv over time on the [x,B,C] stream
    seq = jnp.concatenate([conv_state.astype(xBC.dtype), xBC], axis=1)
    w = layer["ssm_conv1d"]                         # (dc, conv_dim)
    y = sum(seq[:, j:j + T] * w[j] for j in range(dc))
    if "ssm_conv1d_b" in layer:
        y = y + layer["ssm_conv1d_b"]
    new_conv = seq[:, T:]
    xBC = ops.silu(y)

    x = xBC[..., :di].astype(jnp.float32).reshape(B, T, nh, hd)
    Bm = xBC[..., di:di + G * ds].astype(jnp.float32).reshape(B, T, G, ds)
    Cm = xBC[..., di + G * ds:].astype(jnp.float32).reshape(B, T, G, ds)

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + layer["ssm_dt_b"].astype(jnp.float32))  # (B,T,nh)
    # GGUF ssm_a = -exp(A_log) already (ecosystem convention); per-head
    A = layer["ssm_a"].astype(jnp.float32).reshape(nh)

    def step(state, inp):                           # state (B,nh,hd,ds)
        dt_t, b_t, c_t, x_t = inp   # (B,nh) (B,G,ds) (B,G,ds) (B,nh,hd)
        dA = jnp.exp(dt_t * A)                      # (B,nh)
        b_h = jnp.repeat(b_t, nh // G, axis=1)      # (B,nh,ds)
        c_h = jnp.repeat(c_t, nh // G, axis=1)
        dBx = (dt_t[..., None] * x_t)[..., None] * b_h[:, :, None, :]
        state = state * dA[..., None, None] + dBx
        y_t = jnp.einsum("bhds,bhs->bhd", state, c_h)
        return state, y_t

    ssm_f = ssm_state.astype(jnp.float32).reshape(B, nh, hd, ds)
    ssm_f, ys = jax.lax.scan(
        step, ssm_f,
        (dt.transpose(1, 0, 2), Bm.transpose(1, 0, 2, 3),
         Cm.transpose(1, 0, 2, 3), x.transpose(1, 0, 2, 3)))
    y = ys.transpose(1, 0, 2, 3)                    # (B,T,nh,hd)
    y = y + x * layer["ssm_d"].astype(jnp.float32).reshape(nh, 1)
    y = y.reshape(B, T, di) * ops.silu(z.astype(jnp.float32))
    if "ssm_norm" in layer:  # grouped RMS norm (d_inner/G per group)
        y = ops.rms_norm(y.reshape(B, T, G, di // G),
                         layer["ssm_norm"].reshape(G, di // G),
                         hp.rms_eps).reshape(B, T, di)
    out = mm(y.astype(x_in.dtype), layer["ssm_out"])
    return (out, new_conv.astype(conv_state.dtype),
            ssm_f.reshape(B, di, ds).astype(ssm_state.dtype))


def plamo2_mixer(layer: dict, hp: HParams, x_in: jax.Array,
                 conv_state: jax.Array, ssm_state: jax.Array):
    """PLaMo-2 mamba layer (plamo2.cpp build_plamo2_mamba_layer):
    in_proj to PER-HEAD-INTERLEAVED [z_h | x_h] pairs, conv+silu over x
    only (no bias), ssm_x projects post-conv x to [B | C | dt] (B first),
    each RMS-normed, dt then projected per-head (+bias), mamba2-style
    scalar-decay scan with a single B/C group, D-skip, silu(z) gate, no
    grouped output norm."""
    B, T, E = x_in.shape
    di, ds = hp.ssm_d_inner, hp.ssm_d_state
    dc, nh = hp.ssm_d_conv, hp.ssm_dt_rank
    hd = di // nh
    dt_dim = max(64, E // 16)

    zx = mm(x_in, layer["ssm_in"]).reshape(B, T, nh, 2 * hd)
    z = zx[..., :hd].reshape(B, T, di)
    x = zx[..., hd:].reshape(B, T, di)

    seq = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    w = layer["ssm_conv1d"]                        # (dc, di)
    y = sum(seq[:, j:j + T] * w[j] for j in range(dc))
    new_conv = seq[:, T:]
    x = ops.silu(y)

    bcdt = mm(x, layer["ssm_x"])                   # (B,T, 2ds + dt_dim)
    Bm = ops.rms_norm(bcdt[..., :ds], layer["ssm_b_norm"], hp.rms_eps)
    Cm = ops.rms_norm(bcdt[..., ds:2 * ds], layer["ssm_c_norm"], hp.rms_eps)
    dt = ops.rms_norm(bcdt[..., 2 * ds:], layer["ssm_dt_norm"], hp.rms_eps)
    dt = mm(dt, layer["ssm_dt"]) + layer["ssm_dt_b"]          # (B,T,nh)
    dt = jax.nn.softplus(dt.astype(jnp.float32))
    A = layer["ssm_a"].astype(jnp.float32).reshape(nh)        # = -exp(A_log)

    xh = x.astype(jnp.float32).reshape(B, T, nh, hd)
    Bm = Bm.astype(jnp.float32)[:, :, None, :]     # (B,T,1,ds)
    Cm = Cm.astype(jnp.float32)[:, :, None, :]

    def step(state, inp):                          # state (B,nh,hd,ds)
        dt_t, b_t, c_t, x_t = inp
        dA = jnp.exp(dt_t * A)                     # (B,nh)
        b_h = jnp.repeat(b_t, nh, axis=1)          # single group → all heads
        c_h = jnp.repeat(c_t, nh, axis=1)
        dBx = (dt_t[..., None] * x_t)[..., None] * b_h[:, :, None, :]
        state = state * dA[..., None, None] + dBx
        y_t = jnp.einsum("bhds,bhs->bhd", state, c_h)
        return state, y_t

    ssm_f = ssm_state.astype(jnp.float32).reshape(B, nh, hd, ds)
    ssm_f, ys = jax.lax.scan(
        step, ssm_f,
        (dt.transpose(1, 0, 2), Bm.transpose(1, 0, 2, 3),
         Cm.transpose(1, 0, 2, 3), xh.transpose(1, 0, 2, 3)))
    y = ys.transpose(1, 0, 2, 3)                   # (B,T,nh,hd)
    y = y + xh * layer["ssm_d"].astype(jnp.float32).reshape(nh, 1)
    y = (ops.silu(z.astype(jnp.float32)) * y.reshape(B, T, di))
    out = mm(y.astype(x_in.dtype), layer["ssm_out"])
    return (out, new_conv.astype(conv_state.dtype),
            ssm_f.reshape(B, di, ds).astype(ssm_state.dtype))


def mamba_mixer(layer: dict, hp: HParams, x_in: jax.Array,
                conv_state: jax.Array, ssm_state: jax.Array):
    """Version dispatch: ssm_n_group > 0 selects the mamba2 layout."""
    if hp.ssm_n_group > 0:
        return _mamba2_mixer(layer, hp, x_in, conv_state, ssm_state)
    return _mamba_mixer(layer, hp, x_in, conv_state, ssm_state)


def mamba_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,       # (B, T)
    pos: jax.Array,          # unused (state is positionless); kept for API parity
    cache: RecurrentCache,
) -> tuple[jax.Array, RecurrentCache]:
    x = params["token_embd"][tokens]
    conv_new, ssm_new = [], []
    for il, layer in enumerate(params["layers"]):
        h = ops.rms_norm(x, layer["attn_norm"], hp.rms_eps)
        y, cs, ss = mamba_mixer(layer, hp, h, cache.conv[il], cache.ssm[il])
        conv_new.append(cs)
        ssm_new.append(ss)
        x = x + y
    cache = RecurrentCache(conv=jnp.stack(conv_new), ssm=jnp.stack(ssm_new))
    x = ops.rms_norm(x, params["output_norm"], hp.rms_eps)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    return logits, cache
