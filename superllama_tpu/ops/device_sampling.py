"""On-device (in-graph) sampling — the reference's "backend sampling"
(llama_set_sampler, include/llama.h:1021/1270: sampling fused into the compute
graph so the per-token loop never leaves the device).

All transforms are jit-safe pure functions over (B, V) logits. The host-side
chain (runtime/sampling.py) remains the full-featured reference; these cover
the hot serving configs: greedy, temperature, top-k, top-p, min-p.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def greedy(logits: jax.Array) -> jax.Array:
    """(B, V) → (B,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _mask_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus: keep the smallest set of tokens with cumulative prob ≥ p."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep while the cumulative mass *before* this token is < p
    keep = cum - probs < p
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _mask_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    mx = jnp.max(logits, axis=-1, keepdims=True)
    return jnp.where(logits < mx + jnp.log(min_p), -jnp.inf, logits)


@partial(jax.jit, static_argnames=("temp", "top_k", "top_p", "min_p"))
def sample(logits: jax.Array, key: jax.Array, *, temp: float = 1.0,
           top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0) -> jax.Array:
    """One sampled token per row. temp ≤ 0 → greedy."""
    lf = logits.astype(jnp.float32)
    if temp <= 0.0:
        return greedy(lf)
    if top_k > 0:
        lf = _mask_top_k(lf, top_k)
    if min_p > 0.0:
        lf = _mask_min_p(lf, min_p)
    if top_p < 1.0:
        lf = _mask_top_p(lf, top_p)
    lf = lf / temp
    return jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)
