"""Paged flash attention — Pallas kernel over a page-pool KV layout.

TPU-native realization of the fork's paged KV cache capability
(llama_kv_cache_paged, src/llama-kv-cache-paged.h:40-218 — there a host-side
page manager over the regular cache; here the page table is a scalar-prefetch
input and the kernel DMAs exactly the pages each sequence owns):

 - KV lives in a global page pool ``(N_pages, H_kv, P, D)`` shared by all
   sequences; a per-sequence page table maps logical page s → pool slot.
 - The grid's kv dimension iterates logical pages; the BlockSpec index_map
   reads the prefetched table so only owned pages are fetched from HBM.
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

    # multi-page grid steps (VERDICT r4 #6): one grid step per page made
    # each DMA ~P·D·4 bytes (~130 KB) — per-step fixed costs capped the
    # kernel at ~280 GB/s vs 610-710 for the contiguous decode kernel's
    # 2048-row chunks. Fetch NP logical pages per step through NP separate
    # scalar-prefetched BlockSpecs (pages live anywhere in the pool) and
    # run the same per-page online-softmax updates back to back.
    NP = max(1, min(8, MAXP))
    n_sp = pl.cdiv(MAXP, NP)
    MAXP2 = n_sp * NP
    # absent/overhang pages route to the NULL page (slot 0, positions -1)
    table = jnp.maximum(page_table, 0).astype(jnp.int32)
    if MAXP2 != MAXP:
        table = jnp.pad(table, ((0, 0), (0, MAXP2 - MAXP)))

    kern = functools.partial(
        _paged_mp_kernel, scale=float(scale), n_sp=n_sp, NP=NP,
        swa=int(swa_window), softcap=float(logit_softcap),
        has_sinks=has_sinks)

    page_specs = []
    for j in range(NP):
        jj = j   # bind
        page_specs.append(pl.BlockSpec(
            (1, P, 1), lambda b, h, t, s, tbl, jj=jj: (tbl[b, s * NP + jj], 0, 0)))
    for j in range(NP):
        jj = j
        page_specs.append(pl.BlockSpec(
            (1, 1, P, D),
            lambda b, h, t, s, tbl, jj=jj: (tbl[b, s * NP + jj], h, 0, 0)))
    for j in range(NP):
        jj = j
        page_specs.append(pl.BlockSpec(
            (1, 1, P, Dv),
            lambda b, h, t, s, tbl, jj=jj: (tbl[b, s * NP + jj], h, 0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_t, n_sp),
        in_specs=[
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s, tbl: (b, t, 0)),
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s, tbl: (h, 0, 0)),
            pl.BlockSpec((1, bt, 1, G, D),
                         lambda b, h, t, s, tbl: (b, t, h, 0, 0)),
        ] + page_specs,
        out_specs=pl.BlockSpec((1, bt, 1, G, Dv),
                               lambda b, h, t, s, tbl: (b, t, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hkv, G, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * MAXP * P * D,
            bytes_accessed=q.nbytes + k_pages.nbytes + v_pages.nbytes,
            transcendentals=B * H * T * MAXP * P,
        ),
        interpret=interpret,
    )(table, qpos_exp, sinks_exp, qg,
      *([page_pos[:, :, None]] * NP), *([k_pages] * NP), *([v_pages] * NP))
    return out.reshape(B, T, H, Dv)


def _paged_mp_kernel(tbl_ref, qpos_ref, sinks_ref, q_ref, *rest, scale: float,
                     n_sp: int, NP: int, swa: int, softcap: float,
                     has_sinks: bool):
    """NP pages per grid step, each processed with the identical per-page
    online-softmax update the single-page kernel ran (same numerics; the
    page sub-loop only changes DMA granularity)."""
    kpos = rest[:NP]
    kref = rest[NP:2 * NP]
    vref = rest[2 * NP:3 * NP]
    o_ref, m_ref, l_ref, acc_ref = rest[3 * NP:]
    s = pl.program_id(3)

    @pl.when(s == 0)
    def _():
        if has_sinks:
            m_ref[:] = sinks_ref[0].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qpi = qpos_ref[0]                          # (btG, 1) int32
    q = q_ref[0, :, 0]                         # (bt, G, D)
    bt, G, D = q.shape
    q2 = q.reshape(bt * G, D)
    _BIG = jnp.int32(1 << 30)
    qp_max = jnp.max(qpi)
    qp_min = jnp.min(jnp.where(qpi < 0, _BIG, qpi))

    for j in range(NP):
        kpi = kpos[j][0, :, 0][None, :]        # (1, P)
        kp_min = jnp.min(jnp.where(kpi < 0, _BIG, kpi))
        vis = kp_min <= qp_max
        if swa > 0:
            kp_max = jnp.max(jnp.where(kpi < 0, -_BIG, kpi))
            vis = jnp.logical_and(vis, kp_max > qp_min - swa)

        @pl.when(vis)
        def _(j=j, kpi=kpi):
            k = kref[j][0, 0]                  # (P, D)
            v = vref[j][0, 0]                  # (P, Dv)
            cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
            logits = jax.lax.dot_general(
                q2.astype(cdt), k.astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if softcap > 0.0:
                logits = softcap * jnp.tanh(logits / softcap)
            qpf = qpi.astype(jnp.float32)
            kpf = kpi.astype(jnp.float32)
            pen = jnp.minimum(0.0, qpf - kpf) + jnp.minimum(0.0, kpf)
            if swa > 0:
                pen = pen + jnp.minimum(0.0, kpf - qpf + float(swa) - 1.0)
            logits = logits + pen * _NEG
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            m_ref[:] = m_new
            upd = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + upd

    @pl.when(s == n_sp - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom
        o_ref[0, :, 0] = out.reshape(bt, G, o_ref.shape[-1]).astype(o_ref.dtype)
