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

from .flash_attention import _fa_kernel


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

    # absent pages route to the NULL page (slot 0, all positions -1)
    table = jnp.maximum(page_table, 0).astype(jnp.int32)

    kern = functools.partial(
        _fa_kernel, scale=float(scale), n_s=MAXP, swa=int(swa_window),
        softcap=float(logit_softcap), has_sinks=has_sinks, quantized=False,
        s_rem=0,   # pages are whole blocks; NULL pages mask by position
    )

    def wrapped(tbl_ref, qp, kp, sk, qr, kr, vr, o, m, l, a):
        kern(qp, kp, sk, qr, kr, vr, None, None, o, m, l, a)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, n_t, MAXP),
        in_specs=[
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s, tbl: (b, t, 0)),
            pl.BlockSpec((1, P, 1), lambda b, h, t, s, tbl: (tbl[b, s], 0, 0)),
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s, tbl: (h, 0, 0)),
            pl.BlockSpec((1, bt, 1, G, D), lambda b, h, t, s, tbl: (b, t, h, 0, 0)),
            pl.BlockSpec((1, 1, P, D), lambda b, h, t, s, tbl: (tbl[b, s], h, 0, 0)),
            pl.BlockSpec((1, 1, P, Dv), lambda b, h, t, s, tbl: (tbl[b, s], h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, 1, G, Dv),
                               lambda b, h, t, s, tbl: (b, t, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, Dv), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        wrapped,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, Hkv, G, Dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * MAXP * P * D,
            bytes_accessed=q.nbytes + k_pages.nbytes + v_pages.nbytes,
            transcendentals=B * H * T * MAXP * P,
        ),
        interpret=interpret,
    )(table, qpos_exp, page_pos[:, :, None], sinks_exp, qg, k_pages, v_pages)
    return out.reshape(B, T, H, Dv)
