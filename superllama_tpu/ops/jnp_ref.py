"""Reference ops in plain jnp.

These define the numerical semantics of the framework (the role the ggml CPU
backend plays in the reference, SURVEY.md §4: every optimized kernel is
conformance-tested against these). Computation-critical reductions run in f32.

Op semantics follow the reference's definitions:
 - rms_norm: ggml_rms_norm (ggml.h:1356)
 - rope: ggml_rope_ext NORM/NEOX modes incl. YaRN (ggml.h:1770)
 - attention: ggml_flash_attn_ext semantics (ggml.h:2325) — f32 softmax
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# ----------------------------------------------------------------- norms


def rms_norm(x: jax.Array, weight: jax.Array | None,
             eps: float = 1e-5) -> jax.Array:
    """RMSNorm; weight=None → non-parametric (gemma3n V-norm)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array | None, bias: jax.Array | None,
               eps: float = 1e-5) -> jax.Array:
    """LayerNorm; weight=None → non-parametric (olmo-style)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


# ----------------------------------------------------------------- rope

ROPE_TYPE_NONE = -1
ROPE_TYPE_NORM = 0     # rotate adjacent pairs (2i, 2i+1) — llama-style GGUF layout
ROPE_TYPE_NEOX = 2     # rotate split halves (i, i + n/2)


def rope_frequencies(
    head_dim: int,
    n_rot: int,
    freq_base: float = 10000.0,
    freq_scale: float = 1.0,
    *,
    ext_factor: float = 0.0,
    attn_factor: float = 1.0,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    orig_ctx: int = 0,
) -> tuple[jax.Array, float]:
    """Per-dimension inverse frequencies + magnitude scale, incl. YaRN ramp.

    Returns (inv_freq[n_rot//2] as "theta per unit position", mscale).
    Linear scaling = freq_scale < 1 with ext_factor == 0.
    """
    dims = jnp.arange(0, n_rot, 2, dtype=jnp.float32)
    theta = freq_base ** (-dims / n_rot)

    if ext_factor == 0.0:
        return theta * freq_scale, attn_factor

    # YaRN (semantics of ggml rope_yarn / ggml_rope_yarn_corr_dims)
    def corr_dim(n_orig_ctx, beta):
        return n_rot * math.log(n_orig_ctx / (beta * 2 * math.pi)) / (2 * math.log(freq_base))

    low = max(0.0, math.floor(corr_dim(orig_ctx, beta_fast)))
    high = min(n_rot - 1.0, math.ceil(corr_dim(orig_ctx, beta_slow)))
    # ramp: 0 → use interpolated (scaled), 1 → use extrapolated (original)
    dim_idx = dims / 2.0 * 2.0  # actual rotation dim index (0,2,4..)
    ramp = jnp.clip((dim_idx / 2.0 - low / 2.0) / max((high - low) / 2.0, 1e-3), 0.0, 1.0)
    ramp = 1.0 - ramp
    theta_interp = theta * freq_scale
    theta_mix = theta_interp * (1.0 - ramp * ext_factor) + theta * (ramp * ext_factor)
    mscale = attn_factor * (1.0 + 0.1 * math.log(1.0 / freq_scale)) if freq_scale < 1.0 else attn_factor
    return theta_mix, mscale


def apply_rope(
    x: jax.Array,  # (..., T, H, D)
    pos: jax.Array,  # (..., T)
    inv_freq: jax.Array,  # (n_rot//2,)
    rope_type: int = ROPE_TYPE_NORM,
    mscale: float = 1.0,
) -> jax.Array:
    """Rotary position embedding over the first n_rot dims of each head."""
    n_rot = inv_freq.shape[0] * 2
    d = x.shape[-1]
    angles = pos[..., None].astype(jnp.float32) * inv_freq  # (..., T, n_rot/2)
    cos = (jnp.cos(angles) * mscale)[..., None, :]  # (..., T, 1, n_rot/2)
    sin = (jnp.sin(angles) * mscale)[..., None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :n_rot], xf[..., n_rot:]
    if rope_type == ROPE_TYPE_NEOX:
        x1, x2 = rot[..., : n_rot // 2], rot[..., n_rot // 2 :]
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    else:  # NORM: adjacent pairs
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x1 * sin + x2 * cos
        out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    if d > n_rot:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)


# ----------------------------------------------------------------- attention


def attention_ref(
    q: jax.Array,        # (B, T, H, D)
    k: jax.Array,        # (B, H_kv, S, D) — KV-cache layout (S on sublanes)
    v: jax.Array,        # (B, H_kv, S, Dv)
    mask: jax.Array,     # (B, 1, T, S) additive, -inf for masked
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,  # (H,) per-head sink logit (gpt-oss)
) -> jax.Array:
    """Reference scaled-dot-product attention with GQA broadcast, f32 softmax.

    ``sinks`` implements attention sinks (gpt-oss): a learned per-head logit
    that joins the softmax normalization but contributes no value — i.e. the
    softmax denominator gains exp(sink − m).
    """
    B, T, H, D = q.shape
    H_kv, S = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    rep = H // H_kv
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)               # (B,H,T,D)
    kf = jnp.repeat(k.astype(jnp.float32), rep, axis=1)            # (B,H,S,D)
    vf = jnp.repeat(v.astype(jnp.float32), rep, axis=1)            # (B,H,S,Dv)
    logits = jnp.einsum("bhtd,bhsd->bhts", qf, kf) * scale
    if logit_softcap > 0.0:
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)
    logits = logits + mask.astype(jnp.float32)
    if sinks is not None:
        sink = sinks.astype(jnp.float32).reshape(1, H, 1, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m)
        probs = p / denom
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, vf)                 # (B,H,T,Dv)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def attention_gqa(
    q: jax.Array,        # (B, T, H, D)
    k: jax.Array,        # (B, H_kv, S, D)
    v: jax.Array,        # (B, H_kv, S, Dv)
    mask: jax.Array,     # (B, 1 or H, T, S) additive
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,
) -> jax.Array:
    """Bandwidth-lean attention for the XLA (non-flash) path: grouped-query
    einsums instead of repeating K/V to H heads (attention_ref materializes
    the repeat — ~G× the KV traffic, ruinous at long context), dots in the
    stored dtype with f32 accumulation, f32 softmax. Conformance-tested
    against attention_ref."""
    B, T, H, D = q.shape
    H_kv, S = k.shape[1], k.shape[2]
    G = H // H_kv
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    # merge (G, T) into one row dim → plain 4-D batched GEMMs over Hkv
    qg = (q.reshape(B, T, H_kv, G, D).transpose(0, 2, 3, 1, 4)
          .reshape(B, H_kv, G * T, D))
    logits = jnp.einsum("bkrd,bksd->bkrs", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap > 0.0:
        logits = logit_softcap * jnp.tanh(logits / logit_softcap)
    if mask.shape[1] == 1:
        mrow = jnp.broadcast_to(mask.astype(jnp.float32),
                                (B, G, T, S)).reshape(B, 1, G * T, S)
    else:  # per-head mask (alibi): (B,H,T,S) rows grouped by kv head
        mrow = (mask.astype(jnp.float32).reshape(B, H_kv, G, T, S)
                .reshape(B, H_kv, G * T, S))
    logits = logits + mrow
    if sinks is not None:
        sink = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(H_kv, G, 1), (H_kv, G, T)
        ).reshape(1, H_kv, G * T, 1)
        m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), sink)
        p = jnp.exp(logits - m)
        probs = p / (jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m))
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bkrs,bksd->bkrd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return (out.reshape(B, H_kv, G, T, v.shape[3]).transpose(0, 3, 1, 2, 4)
            .reshape(B, T, H, v.shape[3]).astype(q.dtype))


# ----------------------------------------------------------------- activations


def silu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jnp.tanh(0.7978845608028654 * (xf + 0.044715 * xf**3)))).astype(x.dtype)


def gelu_erf(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def relu(x):
    return jnp.maximum(x, 0)


def relu_sq(x):
    """Squared ReLU (nemotron hidden_act="relu2")."""
    r = jnp.maximum(x, 0)
    return r * r


def xielu(x, alpha_n_raw, alpha_p_raw, beta, eps):
    """xIELU activation (apertus; ggml.c ggml_xielu): the raw GGUF params are
    log-space — effective alpha_p = softplus(raw), alpha_n = beta +
    softplus(raw). Positive branch alpha_p·x² + beta·x; negative branch
    (expm1(min(x, eps)) - x)·alpha_n + beta·x."""
    xf = x.astype(jnp.float32)
    a_p = jax.nn.softplus(alpha_p_raw)
    a_n = beta + jax.nn.softplus(alpha_n_raw)
    pos = a_p * xf * xf + beta * xf
    neg = (jnp.expm1(jnp.minimum(xf, eps)) - xf) * a_n + beta * xf
    return jnp.where(xf > 0, pos, neg).astype(x.dtype)


def quick_gelu(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def swiglu(gate, up):
    return silu(gate) * up


def geglu(gate, up):
    return gelu(gate) * up


def swiglu_oai(gate, up, alpha: float = 1.702, limit: float = 7.0):
    """gpt-oss clamped swiglu: (up+1) · gate·σ(α·gate), gate≤limit, |up|≤limit."""
    g = jnp.clip(gate.astype(jnp.float32), None, limit)
    u = jnp.clip(up.astype(jnp.float32), -limit, limit)
    return ((u + 1.0) * g * jax.nn.sigmoid(alpha * g)).astype(gate.dtype)


# gated (gate, up) -> act; "gelu"/"gelu_tanh" name the tanh approximation the
# ecosystem uses; gelu_erf is the exact form
GLU_FNS = {
    "silu": swiglu,
    "gelu": geglu,
    "gelu_tanh": geglu,
    "gelu_erf": lambda g, u: gelu_erf(g) * u,
    "relu": lambda g, u: relu(g) * u,
    "relu2": lambda g, u: relu_sq(g) * u,   # bitnet-b1.58 gated squared-relu
}
ACT_FNS = {"silu": silu, "gelu": gelu, "gelu_tanh": gelu, "gelu_erf": gelu_erf,
           "relu": relu, "relu2": relu_sq}


# ----------------------------------------------------------------- softmax / misc


def softmax_ext(x: jax.Array, mask: jax.Array | None = None, scale: float = 1.0, max_bias: float = 0.0) -> jax.Array:
    """ggml_soft_max_ext semantics (scale + optional additive mask), f32 math."""
    xf = x.astype(jnp.float32) * scale
    if mask is not None:
        xf = xf + mask.astype(jnp.float32)
    return jax.nn.softmax(xf, axis=-1).astype(x.dtype)


@partial(jax.jit, static_argnames=("k",))
def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Mask all but the top-k logits to -inf (for sampler chain)."""
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)
