"""Memory-type policy for the serving Engine.

The reference serves EVERY architecture through one slot loop:
``llama_model::create_memory`` returns kv / iswa / recurrent / hybrid
(src/llama-model.cpp:7505-7570) and ``update_slots``
(tools/server/server-context.cpp:1947) is memory-agnostic. This module is
the TPU-native analog: a small dispatch layer that gives the Engine uniform
row-wise operations over any cache pytree —

 - ``make_cache``      : build the right cache for the model (shared with
                         Context.new_cache)
 - ``mask_rows``       : keep idle rows' recurrent state unchanged after a
                         batched step (recurrent state is cumulative; unlike
                         ring-KV writes there is no position predicate to
                         mask junk updates on read)
 - ``truncate_rows``   : dense rings truncate to any position; recurrent
                         state only supports reset-to-zero (the reference's
                         llama_memory_recurrent::seq_rm with p0>0 fails the
                         same way) — keep==0 resets, anything else is a
                         keep-as-is no-op
 - ``get_row/set_row`` : slot state save/restore blobs

Recurrent rows must never see padded (invalid) tokens — a pad token would
advance the state. The Engine therefore prefills recurrent/hybrid slots with
fully-valid power-of-two chunks (``pow2_chunk``) instead of padded buckets.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import ISWACache, KVCache, kv_truncate_rows
from .recurrent import HybridCache, RecurrentCache, RWKVCache


def cache_kind(hp) -> str:
    """'dense' | 'recurrent' | 'hybrid' — how the Engine must treat rows."""
    if hp.is_hybrid:
        return "hybrid"
    if hp.is_recurrent:
        return "recurrent"
    return "dense"


def make_cache(hp, batch: int, n_ctx: int, kv_dtype, iswa: bool = False,
               n_ubatch: int = 512):
    """Build the model's memory (create_memory counterpart). Mirrors
    Context.new_cache; n_ubatch sizes the iSWA ring's write headroom
    (size_swa = window + n_ubatch, src/llama-kv-cache-iswa.cpp)."""
    if hp.is_hybrid:
        from ..models.jamba import hybrid_cache_init

        return hybrid_cache_init(hp, batch, n_ctx, dtype=kv_dtype)
    if hp.recurrent_kind == "rwkv":
        from .recurrent import rwkv_cache_init

        return rwkv_cache_init(hp.n_layer, batch, hp.n_embd,
                               hp.n_embd // hp.wkv_head_size,
                               hp.wkv_head_size, dtype=jnp.float32)
    if hp.is_recurrent:
        from .recurrent import recurrent_cache_init

        return recurrent_cache_init(hp.n_layer, batch, hp.ssm_d_conv,
                                    hp.ssm_d_inner, hp.ssm_d_state,
                                    dtype=kv_dtype,
                                    conv_dim=hp.ssm_conv_dim)
    if iswa:
        from .kv_cache import iswa_cache_init

        return iswa_cache_init(hp, batch, n_ctx, n_ubatch=n_ubatch,
                               dtype=kv_dtype)
    from .kv_cache import kv_cache_init

    return kv_cache_init(hp.n_layer, batch, n_ctx, hp.n_head_kv,
                         hp.head_dim, hp.head_dim_v, dtype=kv_dtype)


def _rec_where(active: jax.Array, new, old):
    """Row-select every leaf along its batch axis (axis 1 for L-leading
    recurrent state arrays)."""
    def sel(n, o):
        m = active.reshape((1, -1) + (1,) * (n.ndim - 2))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def mask_rows(new_cache, old_cache, active: jax.Array):
    """After a batched step: rows with active=False keep their OLD state.

    Dense KV writes are already masked by position predicates on read, so
    only the recurrent part needs selecting; hybrid masks its rec half."""
    if isinstance(new_cache, (RecurrentCache, RWKVCache)):
        return _rec_where(active, new_cache, old_cache)
    if isinstance(new_cache, HybridCache):
        return HybridCache(
            attn=new_cache.attn,
            rec=_rec_where(active, new_cache.rec, old_cache.rec))
    return new_cache


def _rec_reset(cache, zero: jax.Array):
    def z(a):
        m = zero.reshape((1, -1) + (1,) * (a.ndim - 2))
        return jnp.where(m, jnp.zeros_like(a), a)

    return jax.tree_util.tree_map(z, cache)


def truncate_rows(cache, keep: jax.Array):
    """Dense: exact per-row truncation. Recurrent: reset rows with keep==0,
    keep the rest untouched (state can't rewind — callers that need rewind
    are disabled for recurrent engines). Hybrid: both."""
    if isinstance(cache, KVCache):
        return kv_truncate_rows(cache, keep)
    if isinstance(cache, ISWACache):
        from .kv_cache import iswa_truncate_pos

        return iswa_truncate_pos(cache, keep)
    if isinstance(cache, (RecurrentCache, RWKVCache)):
        return _rec_reset(cache, keep == 0)
    if isinstance(cache, HybridCache):
        return HybridCache(attn=kv_truncate_rows(cache.attn, keep),
                           rec=_rec_reset(cache.rec, keep == 0))
    raise TypeError(f"truncate_rows: unsupported cache {type(cache)}")


def get_row(cache, idx: int):
    """Device→host slot state blob (llama_state_seq_get_data analog)."""
    if isinstance(cache, ISWACache):
        return {"full": _kv_get_row(cache.full, idx),
                "swa": _kv_get_row(cache.swa, idx)}
    if isinstance(cache, HybridCache):
        return {"attn": _kv_get_row(cache.attn, idx),
                "rec": get_row(cache.rec, idx)}
    if isinstance(cache, (RecurrentCache, RWKVCache)):
        return {f: np.asarray(leaf[:, idx])
                for f, leaf in zip(cache._fields, cache)}
    raise TypeError(type(cache))


def set_row(cache, idx: int, blob: dict):
    if isinstance(cache, ISWACache):
        return ISWACache(full=_kv_set_row(cache.full, idx, blob["full"]),
                         swa=_kv_set_row(cache.swa, idx, blob["swa"]))
    if isinstance(cache, HybridCache):
        return HybridCache(attn=_kv_set_row(cache.attn, idx, blob["attn"]),
                           rec=set_row(cache.rec, idx, blob["rec"]))
    if isinstance(cache, (RecurrentCache, RWKVCache)):
        return type(cache)(*[
            leaf.at[:, idx].set(jnp.asarray(blob[f], leaf.dtype))
            for f, leaf in zip(cache._fields, cache)])
    raise TypeError(type(cache))


def _kv_get_row(kv: KVCache, idx: int) -> dict:
    out = {"k": np.asarray(kv.k[:, idx]), "v": np.asarray(kv.v[:, idx]),
           "pos": np.asarray(kv.pos[idx]),
           "cursor": int(np.asarray(kv.cursor[idx]))}
    if kv.k_scale is not None:
        out["k_scale"] = np.asarray(kv.k_scale[:, idx])
        out["v_scale"] = np.asarray(kv.v_scale[:, idx])
    return out


def _kv_set_row(kv: KVCache, idx: int, blob: dict) -> KVCache:
    k = kv.k.at[:, idx].set(jnp.asarray(blob["k"], kv.k.dtype))
    v = kv.v.at[:, idx].set(jnp.asarray(blob["v"], kv.v.dtype))
    pos = kv.pos.at[idx].set(jnp.asarray(blob["pos"], kv.pos.dtype))
    cursor = kv.cursor.at[idx].set(int(blob["cursor"]))
    ksc, vsc = kv.k_scale, kv.v_scale
    if kv.k_scale is not None:
        ksc = kv.k_scale.at[:, idx].set(jnp.asarray(blob["k_scale"]))
        vsc = kv.v_scale.at[:, idx].set(jnp.asarray(blob["v_scale"]))
    return KVCache(k=k, v=v, pos=pos, cursor=cursor, k_scale=ksc, v_scale=vsc)


def pow2_chunk(remaining: int, cap: int) -> int:
    """Largest power of two ≤ min(remaining, cap): recurrent prompts load in
    fully-valid chunks (no padding) with a log-bounded set of compile
    shapes."""
    n = min(remaining, cap)
    return 1 << (n.bit_length() - 1)
