"""Paged KV cache: device page pool + page tables + HBM⇄host spill manager.

The fork's llama_kv_cache_paged capability (src/llama-kv-cache-paged.h:40-218:
fixed-size pages, GPU/CPU location per page, LRU eviction under pressure,
pinning, prefetch, ≥4-adjacent coalescing) built TPU-native and actually wired
in (the reference never instantiates its paged cache — SURVEY.md preamble):

 - device side: a global page pool (N_pages per layer) + per-sequence page
   tables; attention runs the scalar-prefetch Pallas kernel over the table
   (ops/paged_attention.py) — no gathers, absent pages masked via NULL page
 - host side: ``PagedKVManager`` owns allocation, LRU spill of cold pages to
   host memory, pinning, batched (coalesced) restore, and telemetry counters
   mirroring the fork's stats

Page slot 0 is reserved as the NULL page (all positions −1).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PagedKVCache(NamedTuple):
    """Device-side state; a pure pytree, donated through the jitted step."""
    k_pages: jax.Array    # (L, N, H_kv, P, D)
    v_pages: jax.Array    # (L, N, H_kv, P, Dv)
    page_pos: jax.Array   # (N, P) int32 global positions, -1 = empty
    table: jax.Array      # (B, MAXP) int32 pool slot per logical page, -1 absent
    cur_page: jax.Array   # (B,) int32 logical index of the open page
    cur_off: jax.Array    # (B,) int32 next write offset in the open page

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]


def paged_cache_init(n_layer: int, n_pages: int, page_size: int, n_seqs: int,
                     max_pages_per_seq: int, n_head_kv: int, head_dim: int,
                     head_dim_v: int | None = None, dtype=jnp.bfloat16) -> PagedKVCache:
    head_dim_v = head_dim_v or head_dim
    return PagedKVCache(
        k_pages=jnp.zeros((n_layer, n_pages, n_head_kv, page_size, head_dim), dtype),
        v_pages=jnp.zeros((n_layer, n_pages, n_head_kv, page_size, head_dim_v), dtype),
        page_pos=jnp.full((n_pages, page_size), -1, jnp.int32),
        table=jnp.full((n_seqs, max_pages_per_seq), -1, jnp.int32),
        cur_page=jnp.zeros((n_seqs,), jnp.int32),
        cur_off=jnp.zeros((n_seqs,), jnp.int32),
    )


# ------------------------- jit-side functional update ------------------------


def paged_advance(cache: PagedKVCache, pos_new: jax.Array) -> tuple[PagedKVCache, jax.Array, jax.Array]:
    """Record positions for the incoming (B, T) tokens and advance offsets.

    Precondition (enforced by the manager): all T tokens of a call fit in the
    row's open page. Returns (cache, slots (B,) pool page ids, offs (B,)).
    """
    B, T = pos_new.shape
    b_idx = jnp.arange(B, dtype=jnp.int32)
    slots = cache.table[b_idx, cache.cur_page]              # (B,) pool slot
    # idle rows (no open page) write into the NULL page: its pos stays −1 so
    # the junk is masked — lets inactive engine slots ride along in a batch
    slots = jnp.maximum(slots, 0)
    offs = cache.cur_off                                    # (B,)
    valid = pos_new >= 0
    stored = jnp.where(valid, pos_new, -1).astype(jnp.int32)
    col = offs[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    page_pos = cache.page_pos.at[slots[:, None], col].set(stored)
    n_new = valid.sum(axis=1).astype(jnp.int32)
    return cache._replace(page_pos=page_pos, cur_off=offs + n_new), slots, offs


def paged_update_layer(cache: PagedKVCache, layer: int, slots: jax.Array,
                       offs: jax.Array, k_new: jax.Array, v_new: jax.Array) -> PagedKVCache:
    """Write (B, T, H_kv, D) K/V into each row's open page at its offset.

    ``slots`` already NULL-clamped by paged_advance (idle rows' junk K/V land
    in the NULL page whose pos stays −1 → masked)."""
    B, T = k_new.shape[:2]
    Hkv = k_new.shape[2]
    h_idx = jnp.arange(Hkv, dtype=jnp.int32)[None, :, None]
    col = (offs[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :])[:, None, :]
    kt = k_new.transpose(0, 2, 1, 3).astype(cache.k_pages.dtype)
    vt = v_new.transpose(0, 2, 1, 3).astype(cache.v_pages.dtype)
    k = cache.k_pages.at[layer, slots[:, None, None], h_idx, col].set(kt)
    v = cache.v_pages.at[layer, slots[:, None, None], h_idx, col].set(vt)
    return cache._replace(k_pages=k, v_pages=v)


# ------------------------------ host manager ---------------------------------


@dataclass
class _PageMeta:
    seq: int = -1
    logical: int = -1
    last_use: float = 0.0
    pinned: bool = False


@dataclass
class PagedKVManager:
    """Host-side page allocator + HBM⇄host tiering.

    Mirrors llama_kv_cache_paged semantics: allocate-on-write, LRU eviction of
    unpinned cold pages to host memory under pool pressure, pin/unpin,
    coalesced restore of adjacent pages, stats.
    """
    cache: PagedKVCache
    stats: dict = field(default_factory=lambda: {
        "allocs": 0, "evictions": 0, "restores": 0, "coalesced_restores": 0,
        "spill_bytes": 0, "restore_bytes": 0,
    })

    def __post_init__(self):
        n = self.cache.k_pages.shape[1]
        self.meta = [_PageMeta() for _ in range(n)]
        self.meta[0].pinned = True      # NULL page never allocated
        self.free = list(range(n - 1, 0, -1))
        # host store: (seq, logical) → (k (L,Hkv,P,D) np, v, pos (P,) np)
        self.host: dict[tuple[int, int], tuple] = {}
        self._table_np = np.asarray(self.cache.table).copy()
        self._cur_page = np.asarray(self.cache.cur_page).copy()
        self._cur_off = np.asarray(self.cache.cur_off).copy()

    # -- helpers
    @property
    def page_size(self) -> int:
        return self.cache.page_size

    def _sync_table(self):
        # .copy() is load-bearing: on the CPU backend jnp.asarray(np_array)
        # may alias the host buffer zero-copy, and these mirrors are mutated
        # by finish_step while the jitted step may still be in flight
        self.cache = self.cache._replace(
            table=jnp.asarray(self._table_np.copy()),
            cur_page=jnp.asarray(self._cur_page.copy()),
            cur_off=jnp.asarray(self._cur_off.copy()),
        )

    def _alloc_slot(self, seq: int, logical: int) -> int:
        if not self.free:
            self._evict_lru()
        slot = self.free.pop()
        m = self.meta[slot]
        m.seq, m.logical, m.last_use, m.pinned = seq, logical, time.monotonic(), False
        self.stats["allocs"] += 1
        return slot

    def _evict_lru(self, n: int = 1):
        """Spill the n least-recently-used unpinned resident pages to host."""
        resident = [(m.last_use, s) for s, m in enumerate(self.meta)
                    if m.seq >= 0 and not m.pinned]
        if len(resident) < n:
            raise RuntimeError("page pool exhausted: all pages pinned")
        resident.sort()
        for _, slot in resident[:n]:
            m = self.meta[slot]
            k = np.asarray(self.cache.k_pages[:, slot])
            v = np.asarray(self.cache.v_pages[:, slot])
            p = np.asarray(self.cache.page_pos[slot])
            self.host[(m.seq, m.logical)] = (k, v, p)
            self.stats["evictions"] += 1
            self.stats["spill_bytes"] += k.nbytes + v.nbytes
            self._table_np[m.seq, m.logical] = -1
            self.cache = self.cache._replace(
                page_pos=self.cache.page_pos.at[slot].set(-1))
            m.seq = m.logical = -1
            self.free.append(slot)

    def touch(self, seq: int):
        now = time.monotonic()
        for lg in range(int(self._cur_page[seq]) + 1):
            slot = self._table_np[seq, lg]
            if slot >= 0:
                self.meta[slot].last_use = now

    def pin(self, seq: int, pinned: bool = True):
        for lg in range(self._table_np.shape[1]):
            slot = self._table_np[seq, lg]
            if slot >= 0:
                self.meta[slot].pinned = pinned

    # -- public API
    def ensure_resident(self, seq: int):
        """Restore all spilled pages of a sequence (coalescing adjacent ones).

        The sequence's pages — already-resident and newly-restored alike — are
        pinned for the duration: a restore's own allocation may trigger LRU
        eviction, and without the pin it could spill the very pages of the
        sequence being made resident (the stale host copy would then clobber
        tokens written to the re-allocated page later). Re-scans until no
        spilled pages remain; prior pin state is restored on exit."""
        prev_pin: dict[int, bool] = {}

        def _pin_now(slot: int):
            if slot not in prev_pin:
                prev_pin[slot] = self.meta[slot].pinned
            self.meta[slot].pinned = True

        for lg in range(self._table_np.shape[1]):
            slot = self._table_np[seq, lg]
            if slot >= 0:
                _pin_now(slot)
        while True:
            logicals = sorted(lg for (s, lg) in self.host if s == seq)
            if not logicals:
                break
            run: list[int] = []
            for lg in logicals + [None]:
                if lg is not None and (not run or lg == run[-1] + 1):
                    run.append(lg)
                    continue
                if run:
                    if len(run) >= 4:
                        self.stats["coalesced_restores"] += 1
                    for r in run:
                        self._restore_page(seq, r)
                        _pin_now(self._table_np[seq, r])
                run = [lg] if lg is not None else []
        for slot, pinned in prev_pin.items():
            if self.meta[slot].seq == seq:      # may have been evicted+reused
                self.meta[slot].pinned = pinned
        self._sync_table()

    def _restore_page(self, seq: int, logical: int):
        k, v, p = self.host.pop((seq, logical))
        slot = self._alloc_slot(seq, logical)
        self.cache = self.cache._replace(
            k_pages=self.cache.k_pages.at[:, slot].set(jnp.asarray(k)),
            v_pages=self.cache.v_pages.at[:, slot].set(jnp.asarray(v)),
            page_pos=self.cache.page_pos.at[slot].set(jnp.asarray(p)),
        )
        self._table_np[seq, logical] = slot
        self.meta[slot].last_use = time.monotonic()
        self.stats["restores"] += 1
        self.stats["restore_bytes"] += k.nbytes + v.nbytes

    def plan_step(self, active: dict[int, int]):
        """Prepare one jitted step appending ``active[seq]`` tokens per row.

        Every row's tokens must fit one page (callers chunk prefills to ≤ P);
        if the open page can't hold them, it is closed (tail stays empty —
        positions are explicit, gaps are masked for free) and a fresh page is
        allocated. Device table/cur_page/cur_off are synced to the write
        starts, so the in-graph paged_advance/paged_update_layer write to the
        right slots."""
        P = self.page_size
        self._plan = dict(active)
        for seq, n in active.items():
            if n > P:
                raise ValueError(f"step of {n} tokens exceeds page size {P}")
            off = int(self._cur_off[seq])
            pg = int(self._cur_page[seq])
            if off + n > P:
                pg += 1
                if pg >= self._table_np.shape[1]:
                    raise ValueError("sequence exceeds max_pages_per_seq")
                self._cur_page[seq] = pg
                self._cur_off[seq] = 0
            if self._table_np[seq, pg] < 0:
                if (seq, pg) in self.host:
                    # a spilled copy exists: restore it — allocating a fresh
                    # page here would fork the logical page (the stale host
                    # copy would clobber new tokens on a later restore)
                    self._restore_page(seq, pg)
                else:
                    self._table_np[seq, pg] = self._alloc_slot(seq, pg)
            self.touch(seq)
        self._sync_table()

    def finish_step(self, cache: PagedKVCache):
        """Adopt the post-step device arrays; advance host offsets."""
        for seq, n in self._plan.items():
            self._cur_off[seq] += n
        self._plan = {}
        self.cache = cache._replace(
            cur_page=jnp.asarray(self._cur_page.copy()),
            cur_off=jnp.asarray(self._cur_off.copy()))

    def save_cursor(self, seq: int) -> tuple[int, int]:
        """(cur_page, cur_off) snapshot for block-overshoot rollback."""
        return int(self._cur_page[seq]), int(self._cur_off[seq])

    def rollback(self, seq: int, cursor: tuple[int, int], accepted: int,
                 planned: int) -> None:
        """Partial-acceptance rewind after a decode block (overshoot on a
        stop): of the ``planned`` tokens appended from the pre-plan
        ``cursor``, keep the first ``accepted`` and invalidate the rest
        (positions → -1 so they are never attended). plan_step guarantees
        the whole block landed in ONE page (the open page, or a fresh one
        if it couldn't fit)."""
        pg0, off0 = cursor
        P = self.page_size
        if off0 + planned > P:      # plan opened a fresh page for the block
            pg, off = pg0 + 1, accepted
        else:
            pg, off = pg0, off0 + accepted
        for g in range(pg, int(self._cur_page[seq]) + 1):
            slot = int(self._table_np[seq, g])
            if slot < 0:
                continue
            lo = off if g == pg else 0
            row = self.cache.page_pos[slot]
            idx = jnp.arange(row.shape[0])
            self.cache = self.cache._replace(
                page_pos=self.cache.page_pos.at[slot].set(
                    jnp.where(idx >= lo, -1, row)))
        self._cur_page[seq] = pg
        self._cur_off[seq] = off
        self.cache = self.cache._replace(
            cur_page=jnp.asarray(self._cur_page.copy()),
            cur_off=jnp.asarray(self._cur_off.copy()))

    def seq_pages(self, seq: int) -> int:
        """Logical pages a sequence owns (resident + spilled)."""
        n = sum(1 for lg in range(self._table_np.shape[1])
                if self._table_np[seq, lg] >= 0)
        n += sum(1 for (s, _) in self.host if s == seq)
        return n

    @property
    def n_pool_pages(self) -> int:
        return self.cache.k_pages.shape[1] - 1   # slot 0 = NULL page

    def free_seq(self, seq: int):
        for lg in range(self._table_np.shape[1]):
            slot = self._table_np[seq, lg]
            if slot >= 0:
                m = self.meta[slot]
                m.seq = m.logical = -1
                m.pinned = False
                self.free.append(slot)
                self.cache = self.cache._replace(
                    page_pos=self.cache.page_pos.at[slot].set(-1))
            self._table_np[seq, lg] = -1
        for key in [k for k in self.host if k[0] == seq]:
            del self.host[key]
        self._cur_page[seq] = 0
        self._cur_off[seq] = 0
        self._sync_table()


def _manager_export_row(self, seq: int):
    """Gather a sequence's resident cells into dense per-layer arrays, in
    page order: (k (L, Hkv, n_cells, D), v (L, Hkv, n_cells, Dv),
    pos (n_cells,)). Gap cells (closed-page tails) carry pos −1."""
    self.ensure_resident(seq)
    pgs = [int(self._table_np[seq, g])
           for g in range(int(self._cur_page[seq]) + 1)]
    pgs = [p for p in pgs if p >= 0]
    if not pgs:
        L, _, Hkv, P, D = self.cache.k_pages.shape
        Dv = self.cache.v_pages.shape[-1]
        return (np.zeros((L, Hkv, 0, D), np.float32),
                np.zeros((L, Hkv, 0, Dv), np.float32),
                np.zeros((0,), np.int32))
    k = np.concatenate([np.asarray(self.cache.k_pages[:, p]) for p in pgs],
                       axis=2)
    v = np.concatenate([np.asarray(self.cache.v_pages[:, p]) for p in pgs],
                       axis=2)
    pos = np.concatenate([np.asarray(self.cache.page_pos[p]) for p in pgs])
    return k, v, pos


def _manager_import_row(self, seq: int, k, v, pos) -> None:
    """Replace a sequence's pages with compacted dense cells (cell i at
    slot i of the page chain; pos already position-ordered)."""
    import jax.numpy as jnp

    self.free_seq(seq)
    n = int(pos.shape[0])
    P = self.page_size
    n_pages = max(1, -(-n // P))
    for g in range(n_pages):
        slot = self._alloc_slot(seq, g)
        self._table_np[seq, g] = slot
        lo, hi = g * P, min((g + 1) * P, n)
        width = hi - lo
        kpad = np.zeros(self.cache.k_pages.shape[0:1]
                        + self.cache.k_pages.shape[2:], self.cache.k_pages.dtype)
        vpad = np.zeros(self.cache.v_pages.shape[0:1]
                        + self.cache.v_pages.shape[2:], self.cache.v_pages.dtype)
        ppad = np.full((P,), -1, np.int32)
        kpad[:, :, :width] = k[:, :, lo:hi]
        vpad[:, :, :width] = v[:, :, lo:hi]
        ppad[:width] = pos[lo:hi]
        self.cache = self.cache._replace(
            k_pages=self.cache.k_pages.at[:, slot].set(jnp.asarray(kpad)),
            v_pages=self.cache.v_pages.at[:, slot].set(jnp.asarray(vpad)),
            page_pos=self.cache.page_pos.at[slot].set(jnp.asarray(ppad)),
        )
    self._cur_page[seq] = n_pages - 1
    self._cur_off[seq] = n - (n_pages - 1) * P
    self.cache = self.cache._replace(
        cur_page=jnp.asarray(self._cur_page.copy()),
        cur_off=jnp.asarray(self._cur_off.copy()))
    self._sync_table()


PagedKVManager.export_row = _manager_export_row
PagedKVManager.import_row = _manager_import_row


def _manager_trim_to_position(self, seq: int, keep_pos: int) -> bool:
    """Prompt-cache reuse on pages: invalidate every cell with position ≥
    keep_pos, park the cursor right after the last kept cell, free pages
    past it. Returns False when the sequence has no cells to keep."""
    import jax.numpy as jnp

    self.ensure_resident(seq)
    last = None                     # (logical page, cell index)
    n_log = int(self._cur_page[seq]) + 1
    rows = {}
    for g in range(n_log):
        slot = int(self._table_np[seq, g])
        if slot < 0:
            continue
        row = np.asarray(self.cache.page_pos[slot])
        rows[g] = (slot, row)
        kept = np.nonzero((row >= 0) & (row < keep_pos))[0]
        if kept.size:
            last = (g, int(kept[-1]))
    if last is None:
        return False
    gk, ck = last
    for g, (slot, row) in rows.items():
        if g > gk:
            self._table_np[seq, g] = -1
            self.cache = self.cache._replace(
                page_pos=self.cache.page_pos.at[slot].set(-1))
            m = self.meta[slot]
            m.seq = m.logical = -1
            self.free.append(slot)
            continue
        cut = ck + 1 if g == gk else self.page_size
        mask = (np.arange(self.page_size) < cut) & (row < keep_pos)
        new_row = np.where(mask, row, -1).astype(np.int32)
        if not np.array_equal(new_row, row):
            self.cache = self.cache._replace(
                page_pos=self.cache.page_pos.at[slot].set(
                    jnp.asarray(new_row)))
    # spilled copies past the cut are stale now
    for key in [k for k in self.host if k[0] == seq and k[1] > gk]:
        del self.host[key]
    self._cur_page[seq] = gk
    self._cur_off[seq] = ck + 1
    self._sync_table()
    return True


PagedKVManager.trim_to_position = _manager_trim_to_position
