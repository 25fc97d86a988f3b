"""KV cache as a donated pytree of device arrays.

TPU-native re-design of the reference's llama_kv_cache slot machinery
(src/llama-kv-cache.{h,cpp}): instead of mutable cell bookkeeping on the host,
the cache is a fixed-shape ring of (k, v, pos) arrays updated functionally
inside jit; causal masking derives from the stored per-slot positions, so
mixed prefill/decode batches and per-sequence offsets need no host bookkeeping.

seq_* operations (seq_rm/seq_cp/seq_add/seq_div/seq_keep) mirror the memory
API in include/llama.h:705-771.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KVCache(NamedTuple):
    k: jax.Array        # (n_layer, B, H_kv, S, D) — S on sublanes, D on lanes
    v: jax.Array        # (n_layer, B, H_kv, S, Dv)
    pos: jax.Array      # (B, S) int32; -1 = empty slot
    cursor: jax.Array   # (B,) int32 next write slot
    # Q8_0-style quantized KV (cache_type_k/v counterpart, llama.h:372-373):
    # k/v hold int8 codes, scales are per-(layer,row,head,slot) f32
    k_scale: jax.Array | None = None   # (n_layer, B, H_kv, S)
    v_scale: jax.Array | None = None

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def q4(self) -> bool:
        """Q4_0-style nibble-packed KV (scales are per-32-group: the extra
        trailing dim distinguishes from Q8_0's per-row scale)."""
        return self.k_scale is not None and self.k_scale.ndim == self.k.ndim


def kv_cache_init(n_layer: int, batch: int, max_seq: int, n_head_kv: int,
                  head_dim: int, head_dim_v: int | None = None,
                  dtype=jnp.bfloat16) -> KVCache:
    """dtype may be a float dtype or the strings "q8_0" (int8 codes,
    per-row scale) / "q4_0" (nibble-packed codes, per-32-group scale) —
    the reference's cache_type_k/v counterparts."""
    head_dim_v = head_dim_v if head_dim_v is not None else head_dim
    q8 = isinstance(dtype, str) and dtype in ("q8_0", "q8", "int8")
    q4 = isinstance(dtype, str) and dtype in ("q4_0", "q4", "int4")
    sh = (n_layer, batch, n_head_kv, max_seq)
    if q4:
        assert head_dim % 32 == 0 and head_dim_v % 32 == 0, \
            "q4_0 KV needs head dims divisible by 32"
        return KVCache(
            k=jnp.zeros((*sh, head_dim // 2), jnp.uint8),
            v=jnp.zeros((*sh, head_dim_v // 2), jnp.uint8),
            pos=jnp.full((batch, max_seq), -1, jnp.int32),
            cursor=jnp.zeros((batch,), jnp.int32),
            k_scale=jnp.zeros((*sh, head_dim // 32), jnp.float32),
            v_scale=jnp.zeros((*sh, head_dim_v // 32), jnp.float32),
        )
    store = jnp.int8 if q8 else dtype
    return KVCache(
        k=jnp.zeros((*sh, head_dim), store),
        v=jnp.zeros((*sh, head_dim_v), store),
        pos=jnp.full((batch, max_seq), -1, jnp.int32),
        cursor=jnp.zeros((batch,), jnp.int32),
        k_scale=jnp.zeros(sh, jnp.float32) if q8 else None,
        v_scale=jnp.zeros(sh, jnp.float32) if q8 else None,
    )


def q4_quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) float → (uint8 nibble-packed codes (..., D/2), f32 per-32-
    group scales (..., D/32)): Q4_0 semantics (symmetric, amax/7)."""
    D = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], D // 32, 32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(amax > 0, 7.0 / amax, 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -7, 7).astype(jnp.int32) + 8
    q = q.reshape(*x.shape[:-1], D)
    lo, hi = q[..., 0::2], q[..., 1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, scale


def q4_dequant(codes: jax.Array, scales: jax.Array,
               dtype=jnp.float32) -> jax.Array:
    """Inverse of q4_quantize_rows."""
    c = codes.astype(jnp.int32)
    lo = (c & 0xF) - 8
    hi = (c >> 4) - 8
    D = codes.shape[-1] * 2
    q = jnp.stack([lo, hi], axis=-1).reshape(*codes.shape[:-1], D)
    g = q.reshape(*codes.shape[:-1], D // 32, 32).astype(jnp.float32)
    return (g * scales[..., None]).reshape(*codes.shape[:-1], D).astype(dtype)


def q8_quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., D) float → (int8 codes, f32 per-row scale): Q8_0 semantics."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    codes = jnp.round(xf * inv[..., None]).astype(jnp.int8)
    return codes, scale


def kv_layer(cache: KVCache, il: int, dtype=jnp.float32):
    """K/V arrays of one layer, dequantized when the cache is quantized."""
    ck, cv = cache.k[il], cache.v[il]
    if cache.q4:
        return (q4_dequant(ck, cache.k_scale[il], dtype),
                q4_dequant(cv, cache.v_scale[il], dtype))
    if cache.k_scale is not None:
        ck = (ck.astype(jnp.float32)
              * cache.k_scale[il][..., None]).astype(dtype)
        cv = (cv.astype(jnp.float32)
              * cache.v_scale[il][..., None]).astype(dtype)
    return ck, cv


def kv_write_slots(cache: KVCache, n_new: int) -> jax.Array:
    """Slot indices (B, n_new) the next write will occupy."""
    return cache.cursor[:, None] + jnp.arange(n_new, dtype=jnp.int32)[None, :]


def kv_update_layer(cache: KVCache, layer: int, slots: jax.Array,
                    k_new: jax.Array, v_new: jax.Array,
                    mode: str | None = None) -> KVCache:
    """Write (B, T, H_kv, D) new keys/values at the given slots for one layer.

    mode="drop" discards out-of-bounds slot indices (ring caches route padded
    tokens to slot == S so they vanish instead of clobbering a live slot).
    """
    B, T = slots.shape
    Hkv = k_new.shape[2]
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None, None]      # (B,1,1)
    h_idx = jnp.arange(Hkv, dtype=jnp.int32)[None, :, None]    # (1,Hkv,1)
    s_idx = slots[:, None, :]                                  # (B,1,T)
    kt = k_new.transpose(0, 2, 1, 3)                           # (B,Hkv,T,D)
    vt = v_new.transpose(0, 2, 1, 3)
    if cache.k_scale is not None:
        quantize = q4_quantize_rows if cache.q4 else q8_quantize_rows
        kc, ks = quantize(kt)
        vc, vs = quantize(vt)
        k = cache.k.at[layer, b_idx, h_idx, s_idx].set(kc, mode=mode)
        v = cache.v.at[layer, b_idx, h_idx, s_idx].set(vc, mode=mode)
        k_scale = cache.k_scale.at[layer, b_idx, h_idx, s_idx].set(ks, mode=mode)
        v_scale = cache.v_scale.at[layer, b_idx, h_idx, s_idx].set(vs, mode=mode)
        return cache._replace(k=k, v=v, k_scale=k_scale, v_scale=v_scale)
    k = cache.k.at[layer, b_idx, h_idx, s_idx].set(kt.astype(cache.k.dtype), mode=mode)
    v = cache.v.at[layer, b_idx, h_idx, s_idx].set(vt.astype(cache.v.dtype), mode=mode)
    return cache._replace(k=k, v=v)


def kv_advance(cache: KVCache, slots: jax.Array, pos_new: jax.Array) -> KVCache:
    """Record positions for the written slots and advance cursors.

    pos_new: (B, T) positions; rows may carry padding marked pos < 0, which is
    not counted toward the cursor advance and leaves slots empty.
    """
    b_idx = jnp.arange(pos_new.shape[0], dtype=jnp.int32)[:, None]
    valid = pos_new >= 0
    # write -1 for padded entries so masking ignores them
    stored = jnp.where(valid, pos_new, -1)
    pos = cache.pos.at[b_idx, slots].set(stored.astype(jnp.int32))
    cursor = cache.cursor + valid.sum(axis=1).astype(jnp.int32)
    return cache._replace(pos=pos, cursor=cursor)


def causal_mask(cache_pos: jax.Array, q_pos: jax.Array,
                swa_window: int = 0) -> jax.Array:
    """Additive mask (B, 1, T, S): slot visible iff occupied ∧ pos ≤ q_pos
    (∧ within sliding window when swa_window > 0)."""
    cp = cache_pos[:, None, None, :]        # (B,1,1,S)
    qp = q_pos[:, None, :, None]            # (B,1,T,1)
    ok = (cp >= 0) & (cp <= qp)
    if swa_window > 0:
        ok &= cp > qp - swa_window
    # padded query rows (q_pos < 0) mask everything except slot 0 to keep
    # softmax finite; their outputs are discarded by the caller
    ok |= (qp < 0) & (jnp.arange(cache_pos.shape[1])[None, None, None, :] == 0)
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)


def kv_gather_slots(cache: KVCache, idx: jax.Array, n_valid: jax.Array) -> KVCache:
    """Reorder/compact cache rows by slot index: new slot j takes old slot
    idx[b, j]; slots ≥ n_valid[b] become empty. Powers tree-decoding accept
    (lookahead: keep prefix + the winning branch's entries, drop the rest)."""
    L, B, H, S, _ = cache.k.shape
    gi = idx[None, :, None, :, None]
    k = jnp.take_along_axis(cache.k, jnp.broadcast_to(
        gi, (L, B, H, S, cache.k.shape[-1])), axis=3)
    v = jnp.take_along_axis(cache.v, jnp.broadcast_to(
        gi, (L, B, H, S, cache.v.shape[-1])), axis=3)
    pos = jnp.take_along_axis(cache.pos, idx, axis=1)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < n_valid[:, None]
    pos = jnp.where(valid, pos, -1)
    ksc = vsc = None
    if cache.k_scale is not None:
        gs = idx[None, :, None, :]
        ksc = jnp.take_along_axis(cache.k_scale, gs, axis=3)
        vsc = jnp.take_along_axis(cache.v_scale, gs, axis=3)
    return KVCache(k=k, v=v, pos=pos, cursor=n_valid.astype(jnp.int32),
                   k_scale=ksc, v_scale=vsc)


def kv_truncate_rows(cache: KVCache, keep: jax.Array) -> KVCache:
    """Per-row truncation to the first ``keep[b]`` slots (speculative-decoding
    rollback of rejected draft entries). Slots are append-ordered, so slot
    index == write order; stale K/V beyond the cut stay in memory but are
    masked by pos = -1 and overwritten by future writes."""
    idx = jnp.arange(cache.pos.shape[1], dtype=jnp.int32)[None, :]
    pos = jnp.where(idx < keep[:, None], cache.pos, -1)
    return cache._replace(pos=pos, cursor=keep.astype(jnp.int32))


def kv_context_shift(cache: KVCache, keep: jax.Array, discard: jax.Array,
                     inv_freq: jax.Array, rope_type: int = 0,
                     mscale: float = 1.0) -> KVCache:
    """Context shift (server-context.cpp:1976-2023 semantics): per row, drop
    positions [keep, keep+discard) and slide later positions down by
    ``discard``. K entries are re-roped by −discard (rotations compose
    additively, the reference's rope-rerun shift) and the row is compacted so
    slot order stays == position order (the invariant truncation relies on).

    keep/discard: (B,) int32; discard == 0 → row untouched.
    """
    from ..ops.jnp_ref import apply_rope

    B, S = cache.pos.shape
    pos = cache.pos
    kd = (keep + discard)[:, None]
    sel_discard = (pos >= keep[:, None]) & (pos < kd) & (discard[:, None] > 0)
    sel_shift = (pos >= kd) & (discard[:, None] > 0)
    new_pos = jnp.where(sel_discard, -1,
                        jnp.where(sel_shift, pos - discard[:, None], pos))
    delta = jnp.where(sel_shift, -discard[:, None], 0).astype(jnp.int32)

    # re-rope K by the (per-slot) position delta: (L,B,Hkv,S,D) → rope over S
    k, k_scale = _rerope_k(cache, delta, inv_freq, rope_type, mscale)

    # compact: stable-sort slots by new position (holes → end)
    big = jnp.int32(2**30)
    order = jnp.argsort(jnp.where(new_pos < 0, big, new_pos), axis=1)
    pos_c = jnp.take_along_axis(new_pos, order, axis=1)

    def gather_s(x):  # (L,B,Hkv,S,D) gathered along S with per-row order
        return jnp.take_along_axis(
            x, order[None, :, None, :, None], axis=3)

    k_c = gather_s(k)
    v_c = gather_s(cache.v)
    ksc = vsc = None
    if cache.k_scale is not None:
        gs = order[None, :, None, :]
        ksc = jnp.take_along_axis(k_scale, gs, axis=3)
        vsc = jnp.take_along_axis(cache.v_scale, gs, axis=3)
    cursor = jnp.sum(pos_c >= 0, axis=1).astype(jnp.int32)
    return KVCache(k=k_c, v=v_c, pos=pos_c, cursor=cursor,
                   k_scale=ksc, v_scale=vsc)


# --- iSWA two-tier cache ------------------------------------------------------
#
# TPU-native counterpart of llama_kv_cache_iswa (src/llama-kv-cache-iswa.h):
# full-attention layers keep the regular append-ordered cache; sliding-window
# layers share a small RING cache of O(window) slots indexed by pos % S_swa.
# Old entries are overwritten in place — exactly the tokens the window mask
# would hide anyway — so SWA layers cost window-sized HBM instead of n_ctx.


class ISWACache(NamedTuple):
    full: KVCache   # (n_full_layer, B, Hkv, S_full, D), append-ordered
    swa: KVCache    # (n_swa_layer,  B, Hkv, S_swa,  D), ring by pos % S_swa

    @property
    def max_seq(self) -> int:
        return self.full.max_seq


def iswa_layer_split(hp) -> tuple[list[int], list[int]]:
    """(full_layers, swa_layers) index lists — static routing per model."""
    full = [il for il in range(hp.n_layer) if not hp.is_swa_layer(il)]
    swa = [il for il in range(hp.n_layer) if hp.is_swa_layer(il)]
    return full, swa


def iswa_swa_seq(window: int, n_ubatch: int, max_seq: int) -> int:
    """Ring size: window + one ubatch of headroom, lane-padded, capped at
    max_seq (matching the reference's size_swa = window + n_ubatch,
    src/llama-kv-cache-iswa.cpp)."""
    s = window + n_ubatch
    s = -(-s // 128) * 128
    return min(s, max_seq)


def iswa_cache_init(hp, batch: int, max_seq: int, n_ubatch: int = 512,
                    dtype=jnp.bfloat16) -> ISWACache:
    full, swa = iswa_layer_split(hp)
    s_swa = iswa_swa_seq(hp.swa_window, n_ubatch, max_seq)
    return ISWACache(
        full=kv_cache_init(len(full), batch, max_seq, hp.n_head_kv,
                           hp.head_dim, hp.head_dim_v, dtype),
        swa=kv_cache_init(len(swa), batch, s_swa, hp.n_head_kv,
                          hp.head_dim, hp.head_dim_v, dtype),
    )


def kv_ring_slots(pos: jax.Array, max_seq: int) -> jax.Array:
    """Ring slot per token: pos % S; padded tokens (pos < 0) → S (dropped)."""
    return jnp.where(pos >= 0, pos % max_seq, max_seq).astype(jnp.int32)


def kv_ring_advance(cache: KVCache, slots: jax.Array,
                    pos_new: jax.Array) -> KVCache:
    """Record positions at ring slots (mode=drop for padding); the cursor
    tracks high-water position + 1 for bookkeeping only."""
    b_idx = jnp.arange(pos_new.shape[0], dtype=jnp.int32)[:, None]
    pos = cache.pos.at[b_idx, slots].set(pos_new.astype(jnp.int32), mode="drop")
    cursor = jnp.maximum(cache.cursor, (pos_new.max(axis=1) + 1).astype(jnp.int32))
    return cache._replace(pos=pos, cursor=cursor)


def iswa_truncate_pos(cache: ISWACache, keep_pos: jax.Array) -> ISWACache:
    """Invalidate all entries with pos >= keep_pos[b] in both tiers
    (speculative rollback by position; the full tier stays append-ordered so
    its cursor is recomputed from surviving entries)."""
    cut = keep_pos[:, None]
    fpos = jnp.where(cache.full.pos < cut, cache.full.pos, -1)
    spos = jnp.where(cache.swa.pos < cut, cache.swa.pos, -1)
    fcur = jnp.sum(fpos >= 0, axis=1).astype(jnp.int32)
    scur = jnp.minimum(cache.swa.cursor, keep_pos.astype(jnp.int32))
    return ISWACache(
        full=cache.full._replace(pos=fpos, cursor=fcur),
        swa=cache.swa._replace(pos=spos, cursor=scur),
    )


# --- sequence ops (host-side, operate on concrete arrays) --------------------


def seq_rm(cache: KVCache, b: int, p0: int, p1: int) -> KVCache:
    """Remove positions [p0, p1) of row b (llama_memory_seq_rm semantics)."""
    keep = ~((cache.pos[b] >= p0) & (cache.pos[b] < p1))
    pos = cache.pos.at[b].set(jnp.where(keep, cache.pos[b], -1))
    return cache._replace(pos=pos)


def seq_add(cache: KVCache, b: int, p0: int, p1: int, delta: int) -> KVCache:
    """Shift positions in [p0, p1) by delta (context-shift / self-extend).

    Note: the reference re-ropes K on shift (src/llama-kv-cache.cpp shift via
    rope rerun); with per-slot positions we instead store K un-rotated?  No —
    K is stored rotated, so callers that shift must also re-rope externally.
    This helper only rewrites the position table (sufficient for masking and
    for models where V has no position dependence).
    """
    sel = (cache.pos[b] >= p0) & (cache.pos[b] < p1)
    pos = cache.pos.at[b].set(jnp.where(sel, cache.pos[b] + delta, cache.pos[b]))
    return cache._replace(pos=pos)


def _rerope_k(cache: KVCache, delta: jax.Array, inv_freq: jax.Array,
              rope_type: int = 0, mscale: float = 1.0):
    """Re-rotate stored K by a per-(row, slot) position delta (the reference's
    shift-via-rope-rerun, src/llama-kv-cache.cpp). Q8_0 caches dequantize,
    rotate, and requantize. Returns (k, k_scale_or_None)."""
    from ..ops.jnp_ref import apply_rope

    k = cache.k
    if cache.k_scale is not None:
        k = k.astype(jnp.float32) * cache.k_scale[..., None]
    k = k.transpose(0, 1, 3, 2, 4)                       # (L,B,S,Hkv,D)
    k = apply_rope(k, delta[None].astype(jnp.int32), inv_freq, rope_type, mscale)
    k = k.transpose(0, 1, 3, 2, 4)
    if cache.k_scale is not None:
        return q8_quantize_rows(k)
    return k.astype(cache.k.dtype), None


def seq_add_rerope(cache: KVCache, b: int, p0: int, p1: int, delta: int,
                   inv_freq: jax.Array, rope_type: int = 0,
                   mscale: float = 1.0) -> KVCache:
    """seq_add with K rope-rerun: positions in [p0, p1) of row b shift by
    delta and K is re-rotated to match (exact llama_memory_seq_add)."""
    sel = (cache.pos[b] >= p0) & (cache.pos[b] < p1)
    d = jnp.zeros_like(cache.pos).at[b].set(
        jnp.where(sel, jnp.int32(delta), 0))
    k, ks = _rerope_k(cache, d, inv_freq, rope_type, mscale)
    pos = cache.pos.at[b].set(
        jnp.where(sel, cache.pos[b] + delta, cache.pos[b]))
    if ks is not None:
        return cache._replace(k=k, pos=pos, k_scale=ks)
    return cache._replace(k=k, pos=pos)


def seq_div(cache: KVCache, b: int, p0: int, p1: int, d: int,
            inv_freq: jax.Array, rope_type: int = 0,
            mscale: float = 1.0) -> KVCache:
    """Integer-divide positions in [p0, p1) of row b by d, re-roping K by the
    per-slot delta — self-extend / grouped attention
    (llama_memory_seq_div; examples/passkey/passkey.cpp:138-139)."""
    sel = (cache.pos[b] >= p0) & (cache.pos[b] < p1)
    new_pos = jnp.where(sel, cache.pos[b] // d, cache.pos[b])
    delta = jnp.zeros_like(cache.pos).at[b].set(
        jnp.where(sel, new_pos - cache.pos[b], 0))
    k, ks = _rerope_k(cache, delta, inv_freq, rope_type, mscale)
    pos = cache.pos.at[b].set(new_pos)
    if ks is not None:
        return cache._replace(k=k, pos=pos, k_scale=ks)
    return cache._replace(k=k, pos=pos)


def seq_cp(cache: KVCache, src: int, dst: int) -> KVCache:
    """Copy row src over row dst (llama_memory_seq_cp for batch-row seqs)."""
    k = cache.k.at[:, dst].set(cache.k[:, src])
    v = cache.v.at[:, dst].set(cache.v[:, src])
    pos = cache.pos.at[dst].set(cache.pos[src])
    cursor = cache.cursor.at[dst].set(cache.cursor[src])
    ksc = vsc = None
    if cache.k_scale is not None:
        ksc = cache.k_scale.at[:, dst].set(cache.k_scale[:, src])
        vsc = cache.v_scale.at[:, dst].set(cache.v_scale[:, src])
    return KVCache(k=k, v=v, pos=pos, cursor=cursor,
                   k_scale=ksc, v_scale=vsc)


def seq_keep(cache: KVCache, b: int) -> KVCache:
    """Clear all rows except b."""
    mask = jnp.arange(cache.pos.shape[0])[:, None] == b
    pos = jnp.where(mask, cache.pos, -1)
    cursor = jnp.where(jnp.arange(cache.pos.shape[0]) == b, cache.cursor, 0)
    return cache._replace(pos=pos, cursor=cursor)
