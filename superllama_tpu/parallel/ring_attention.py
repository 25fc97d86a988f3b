"""Ring attention over the sequence-parallel mesh axis.

TPU-native long-context attention (SURVEY §2.7 sequence/context parallelism;
the reference has no equivalent — long context there is SWA/YaRN only):
queries stay sharded on the `sp` axis while K/V shards rotate around the
ring with `jax.lax.ppermute`, one hop per step, overlapping the collective
with each block's compute. Softmax is accumulated online (flash-attention
style running max / normalizer), so the full S×S logits matrix never
materializes and per-chip memory is O(T/sp · S/sp).

Causal masking works on GLOBAL positions carried alongside the shards, so
any ring layout of positions (contiguous or striped) is supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attn(q, k, v, qpos, kpos, scale, causal):
    """One (local-q × visiting-kv) block: returns (unnormalized out,
    running max m, normalizer l) contributions."""
    logits = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        mask = (qpos[:, None, :, None] >= kpos[:, None, None, :])
        logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)                          # (B,H,T)
    # fully-masked rows: keep m finite so exp() stays 0 without NaNs
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m_safe[..., None])
    p = jnp.where(jnp.isfinite(logits), p, 0.0)
    l = jnp.sum(p, axis=-1)                               # (B,H,T)
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o, m_safe, l


def _ring_body(i, carry, *, axis, scale, causal, n_steps):
    o, m, l, k, v, kpos, q, qpos = carry
    bo, bm, bl = _block_attn(q, k, v, qpos, kpos, scale, causal)
    # online-softmax merge of (bo, bm, bl) into (o, m, l)
    m_new = jnp.maximum(m, bm)
    c_old = jnp.exp(m - m_new)
    c_blk = jnp.exp(bm - m_new)
    o = o * c_old[..., None].swapaxes(1, 2) + bo * c_blk[..., None].swapaxes(1, 2)
    l = l * c_old + bl * c_blk
    # rotate K/V (and their positions) one hop around the ring; skipped on
    # the final step (the shard would return home)
    def rotate(x):
        n = jax.lax.psum(1, axis)
        return jax.lax.ppermute(x, axis,
                                [(j, (j + 1) % n) for j in range(n)])
    k, v, kpos = jax.lax.cond(
        i < n_steps - 1,
        lambda t: tuple(rotate(x) for x in t),
        lambda t: t, (k, v, kpos))
    return (o, m_new, l, k, v, kpos, q, qpos)


def ring_attention_sharded(q, k, v, q_pos, kv_pos, *, axis: str = "sp",
                           scale: float, causal: bool = True):
    """Per-shard function (run under shard_map): q/k/v (B, T_loc, H, D);
    q_pos/kv_pos (B, T_loc) GLOBAL positions. Returns (B, T_loc, H, D)."""
    n = jax.lax.psum(1, axis)
    B, T, H, D = q.shape
    o0 = jnp.zeros((B, T, H, v.shape[-1]), jnp.float32)
    m0 = jnp.full((B, H, T), -jnp.inf, jnp.float32)
    # seed m with 0 so the first merge's exp(m - m_new) is well-defined
    m0 = jnp.where(jnp.isinf(m0), -1e30, m0)
    l0 = jnp.zeros((B, H, T), jnp.float32)
    body = functools.partial(_ring_body, axis=axis, scale=scale,
                             causal=causal, n_steps=n)
    o, m, l, *_ = jax.lax.fori_loop(
        0, n, body, (o0, m0, l0, k, v, kv_pos, q, q_pos))
    l = jnp.where(l == 0.0, 1.0, l)                       # dead rows → 0 out
    return (o / l[..., None].swapaxes(1, 2)).astype(q.dtype)


def ring_attention(q, k, v, q_pos, kv_pos, mesh: Mesh, *,
                   scale: float | None = None, causal: bool = True,
                   axis: str = "sp"):
    """Global entry: q/k/v (B, T, H, D) with T divisible by mesh.shape[axis];
    q_pos/kv_pos (B, T). Shards the sequence dim over `axis` and runs the
    ppermute ring."""
    from jax.experimental.shard_map import shard_map

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, axis, None, None)
    pspec = P(None, axis)
    fn = shard_map(
        functools.partial(ring_attention_sharded, axis=axis, scale=scale,
                          causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec, pspec, pspec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(q, k, v, q_pos, kv_pos)
