"""Paged flash attention — Pallas kernel over a page-pool KV layout.

TPU-native realization of the fork's paged KV cache capability
(llama_kv_cache_paged, src/llama-kv-cache-paged.h:40-218 — there a host-side
page manager over the regular cache; here the page table is a scalar-prefetch
input and the kernel DMAs exactly the pages each sequence owns):

 - KV lives in a global page pool ``(N_pages, H_kv, P, D)`` shared by all
   sequences; a per-sequence page table maps logical page s → pool slot.
 - The pools stay in HBM (``pl.ANY``); the kernel issues its own whole-page
   async copies (ALL heads of a page in one contiguous DMA) into a
   double-buffered VMEM scratch, prefetching the next chunk — including
   across batch/row-block grid boundaries — while the current one computes.
   Earlier designs kept the head axis in the grid and fetched each page
   H_kv times as small per-head copies; at decode shapes the compute is
   negligible, so the run was bound by DMA-issue overhead (measured 199-281
   GB/s). One 8×-bigger copy per page removes that wall.
 - Page slot 0 is the NULL page (all positions −1): absent table entries map
   to it and are masked arithmetically — no branches, no gathers.
 - Online softmax carries across pages exactly as across kv blocks; sinks and
   sliding windows compose unchanged.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _NEG


@functools.partial(
    jax.jit,
    static_argnames=("scale", "swa_window", "logit_softcap", "interpret"),
)
def paged_flash_attention(
    q: jax.Array,           # (B, T, H, D)
    k_pages: jax.Array,     # (N_pages, H_kv, P, D) — pool
    v_pages: jax.Array,     # (N_pages, H_kv, P, Dv)
    q_pos: jax.Array,       # (B, T) int32, -1 = padding row
    page_pos: jax.Array,    # (N_pages, P) int32 global positions, -1 = empty
    page_table: jax.Array,  # (B, MAXP) int32 pool slot per logical page, -1 = absent
    scale: float | None = None,
    swa_window: int = 0,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    Hkv, P, Dv = k_pages.shape[1], k_pages.shape[2], v_pages.shape[3]
    MAXP = page_table.shape[1]
    G = H // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    qg = q.reshape(B, T, Hkv, G, D)
    qpos_exp = jnp.repeat(q_pos, G, axis=1)[:, :, None]

    bt = min(T, max(8, 128 // G))
    n_t = pl.cdiv(T, bt)

    has_sinks = sinks is not None
    if has_sinks:
        sinks_exp = jnp.tile(
            sinks.reshape(Hkv, 1, G).astype(jnp.float32), (1, bt, 1)
        ).reshape(Hkv, bt * G, 1)
    else:
        sinks_exp = jnp.zeros((Hkv, bt * G, 1), jnp.float32)

    # NP whole pages per chunk (each one contiguous (Hkv, P, D) copy);
    # double-buffered VMEM budget: 2 slots × NP × Hkv·P·(D+Dv) elements
    NP = max(1, min(4, MAXP))
    n_ch = pl.cdiv(MAXP, NP)
    MAXP2 = n_ch * NP
    # absent/overhang pages route to the NULL page (slot 0, positions -1)
    table = jnp.maximum(page_table, 0).astype(jnp.int32)
    if MAXP2 != MAXP:
        table = jnp.pad(table, ((0, 0), (0, MAXP2 - MAXP)))
    # per-chunk page positions, gathered host-side (tiny: MAXP2·P int32) —
    # pre-flattened to (NP·P,) lanes: the kernel treats a chunk's NP pages
    # as one (NP·P, D) operand, and a (NP, P)→(NP·P,) reshape in-kernel
    # would be a lane-expanding shape cast Mosaic rejects
    pos_g = page_pos[table].reshape(B, n_ch, 1, NP * P)

    kern = functools.partial(
        _paged_dma_kernel, scale=float(scale), NP=NP, n_ch=n_ch, n_t=n_t,
        B=B, Hkv=Hkv, swa=int(swa_window), softcap=float(logit_softcap),
        has_sinks=has_sinks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_t, n_ch),
        in_specs=[
            pl.BlockSpec((1, bt * G, 1), lambda b, t, c, tbl: (b, t, 0)),
            pl.BlockSpec((Hkv, bt * G, 1), lambda b, t, c, tbl: (0, 0, 0)),
            pl.BlockSpec((1, 1, 1, NP * P), lambda b, t, c, tbl: (b, c, 0, 0)),
            pl.BlockSpec((1, bt, Hkv, G, D),
                         lambda b, t, c, tbl: (b, t, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bt, Hkv, G, Dv),
                               lambda b, t, c, tbl: (b, t, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, bt * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, bt * G, 1), jnp.float32),
            pltpu.VMEM((Hkv, bt * G, Dv), jnp.float32),
            pltpu.VMEM((2, NP, Hkv, P, D), k_pages.dtype),
            pltpu.VMEM((2, NP, Hkv, P, Dv), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, NP)),
            pltpu.SemaphoreType.DMA((2, NP)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hkv, G, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * MAXP * P * D,
            bytes_accessed=q.nbytes + k_pages.nbytes + v_pages.nbytes,
            transcendentals=B * H * T * MAXP * P,
        ),
        interpret=interpret,
    )(table, qpos_exp, sinks_exp, pos_g, qg, k_pages, v_pages)
    return out.reshape(B, T, H, Dv)


def _paged_dma_kernel(tbl_ref, qpos_ref, sinks_ref, pgpos_ref, q_ref,
                      k_hbm, v_hbm, o_ref, m_ref, l_ref, acc_ref,
                      kbuf, vbuf, ksem, vsem, *, scale: float, NP: int,
                      n_ch: int, n_t: int, B: int, Hkv: int, swa: int,
                      softcap: float, has_sinks: bool):
    """NP whole pages per chunk with manual double-buffered DMA: at chunk
    step g, start the fetches for global step g+1 (which may belong to the
    next (b, t) block — the prefetch rides across grid boundaries), then
    wait on g's semaphores and run the per-page, per-head online-softmax
    updates."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    c = pl.program_id(2)
    g = (b * n_t + t) * n_ch + c
    total = B * n_t * n_ch

    def start_fetch(gi, slot):
        ci = gi % n_ch
        b2 = (gi // n_ch) // n_t
        for j in range(NP):
            pg = tbl_ref[b2, ci * NP + j]
            pltpu.make_async_copy(k_hbm.at[pg], kbuf.at[slot, j],
                                  ksem.at[slot, j]).start()
            pltpu.make_async_copy(v_hbm.at[pg], vbuf.at[slot, j],
                                  vsem.at[slot, j]).start()

    @pl.when(g == 0)
    def _():
        start_fetch(jnp.int32(0), jnp.int32(0))

    @pl.when(g + 1 < total)
    def _():
        start_fetch(g + 1, (g + 1) % 2)

    @pl.when(c == 0)
    def _():
        if has_sinks:
            m_ref[:] = sinks_ref[:].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    slot = g % 2
    # wait for this chunk's pages (descriptors re-built only for their
    # shape — the wait is on the semaphore)
    for j in range(NP):
        pg = tbl_ref[b, c * NP + j]
        pltpu.make_async_copy(k_hbm.at[pg], kbuf.at[slot, j],
                              ksem.at[slot, j]).wait()
        pltpu.make_async_copy(v_hbm.at[pg], vbuf.at[slot, j],
                              vsem.at[slot, j]).wait()

    qpi = qpos_ref[0]                          # (btG, 1) int32
    bt = q_ref.shape[1]
    G = q_ref.shape[3]
    D = q_ref.shape[4]
    Dv = o_ref.shape[-1]
    _BIG = jnp.int32(1 << 30)
    qp_max = jnp.max(qpi)
    qp_min = jnp.min(jnp.where(qpi < 0, _BIG, qpi))
    qpf = qpi.astype(jnp.float32)

    # the chunk's NP pages form ONE (NP·P, D) operand per head — per-page
    # per-head dots were 4·Hkv small MXU ops per step and their fixed costs
    # bounded the kernel; NULL/absent pages mask arithmetically (pos −1)
    kpi = pgpos_ref[0, 0]                      # (1, NP·P)
    kp_min = jnp.min(jnp.where(kpi < 0, _BIG, kpi))
    vis = kp_min <= qp_max
    if swa > 0:
        kp_max = jnp.max(jnp.where(kpi < 0, -_BIG, kpi))
        vis = jnp.logical_and(vis, kp_max > qp_min - swa)

    @pl.when(vis)
    def _():
        kpf = kpi.astype(jnp.float32)
        pen = jnp.minimum(0.0, qpf - kpf) + jnp.minimum(0.0, kpf)
        if swa > 0:
            pen = pen + jnp.minimum(0.0, kpf - qpf + float(swa) - 1.0)
        pen = pen * _NEG
        for hh in range(Hkv):
            q2 = q_ref[0, :, hh].reshape(bt * G, D)
            k = kbuf[slot, :, hh].reshape(NP * kbuf.shape[3], D)
            v = vbuf[slot, :, hh].reshape(NP * vbuf.shape[3], Dv)
            cdt = (jnp.bfloat16 if q2.dtype == jnp.bfloat16
                   else jnp.float32)
            logits = jax.lax.dot_general(
                q2.astype(cdt), k.astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if softcap > 0.0:
                logits = softcap * jnp.tanh(logits / softcap)
            logits = logits + pen
            m_prev = m_ref[hh]
            m_new = jnp.maximum(
                m_prev, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[hh] = l_ref[hh] * alpha + jnp.sum(p, axis=-1,
                                                    keepdims=True)
            m_ref[hh] = m_new
            upd = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            acc_ref[hh] = acc_ref[hh] * alpha + upd

    @pl.when(c == n_ch - 1)
    def _():
        for hh in range(Hkv):
            denom = jnp.maximum(l_ref[hh], 1e-30)
            out = acc_ref[hh] / denom
            o_ref[0, :, hh] = out.reshape(bt, G, Dv).astype(o_ref.dtype)
