"""Fused dequant + matmul Pallas kernels.

The TPU analog of the reference's quantized GEMM/GEMV kernels
(ggml-cuda/mmq.cu*, mmvq.cu): quantized codes stay packed in HBM, get
dequantized group-wise in VMEM, and feed the MXU — HBM traffic is ~bits-per-
weight instead of 16, which is the whole ballgame for decode (bandwidth-bound).

One kernel covers every repacked format (see ops/qtensor.py): int8 or packed
4-bit codes (+ optional packed high-bit plane) × per-group scales — either
full f32 planes or the compact factored form (integer sub-scales × f16
superblock scale, decoded in VMEM like the reference's in-kernel 6-bit scale
decode in ggml-cuda/mmvq.cu).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import QTensor, dequant_qtensor


def _weight_layout(qt: QTensor) -> tuple[tuple[str, tuple[int, int]], ...]:
    """Static weight-ref layout: (field name, rows-per-k as num/den fraction).

    Block row count for a k-tile of bk rows is bk·num//den; the same fractions
    size full-K GEMV blocks."""
    items = [("codes", (1, 2) if qt.nibble else (1, 1))]
    if qt.hi is not None:
        items.append(("hi", (qt.hi_bits, 8)))
    if qt.scales is not None:
        items.append(("scales", (1, qt.group)))
        if qt.adds is not None:
            items.append(("adds", (1, qt.group)))
    else:  # compact factored form
        items.append(("sc", (1, qt.group)))
        if qt.mn is not None:
            items.append(("mn", (1, qt.group)))
        items.append(("d", (1, qt.group * qt.sb)))
        if qt.dmin is not None:
            items.append(("dmin", (1, qt.group * qt.sb)))
    return tuple(items)


def _k_align(qt: QTensor) -> int:
    """k-tile sizes must cover whole scale/superblock rows."""
    return qt.group * qt.sb if qt.d is not None else qt.group


def _tile_codes(refs: dict, *, nibble: bool, hi_bits: int, gs: int):
    """Unpack a weight tile's integer codes → (bk//gs, gs, bn) int32.

    Mosaic has no 8-bit shifts and no u8→f32 cast; all bit ops ride i32."""
    c = refs["codes"][:]
    bn = c.shape[-1]
    if nibble:
        p = c.reshape(-1, 16, bn).astype(jnp.int32)      # (bk/32, 16, bn)
        q = jnp.concatenate([p & 0x0F, p >> 4], axis=1)  # (bk/32, 32, bn)
        if hi_bits:
            nb, nf = 32 * hi_bits // 8, 8 // hi_bits
            mask = (1 << hi_bits) - 1
            h = refs["hi"][:].reshape(-1, nb, bn).astype(jnp.int32)
            hv = jnp.concatenate(
                [(h >> (hi_bits * j)) & mask for j in range(nf)], axis=1)
            q = q + (hv << 4)
        bk = q.shape[0] * 32
        return q.reshape(bk // gs, gs, bn), bk
    bk = c.shape[0]
    return c.astype(jnp.int32).reshape(bk // gs, gs, bn), bk


def _tile_scales(refs: dict, *, sb: int):
    """(scales, adds) f32 for a weight tile; factored form decodes in VMEM."""
    if "scales" in refs:
        s = refs["scales"][:]
        a = refs["adds"][:] if "adds" in refs else None
        return s, a
    dd = refs["d"][:]
    gd, bn = dd.shape
    rep = lambda v: jnp.broadcast_to(
        v[:, None, :], (gd, sb, bn)).reshape(gd * sb, bn)
    s = rep(dd) * refs["sc"][:].astype(jnp.int32).astype(jnp.float32)
    a = None
    if "mn" in refs:
        a = -(rep(refs["dmin"][:])
              * refs["mn"][:].astype(jnp.int32).astype(jnp.float32))
    return s, a


def _qmm_kernel(x_ref, wrefs, o_ref, acc_ref, *, nibble: bool, hi_bits: int,
                gs: int, sb: int, offset: int, n_k: int, compute_dtype,
                k_rem: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, bk = _tile_codes(wrefs, nibble=nibble, hi_bits=hi_bits, gs=gs)
    bn = q.shape[-1]
    s, a = _tile_scales(wrefs, sb=sb)
    w = (q.astype(jnp.float32) - float(offset)) * s.reshape(-1, 1, bn)
    if a is not None:
        w = w + a.reshape(-1, 1, bn)
    w = w.reshape(bk, bn).astype(compute_dtype)
    x = x_ref[:].astype(compute_dtype)
    if k_rem:
        # partial last k-tile: Pallas out-of-bounds block fill is undefined
        # (garbage scale floats can be NaN, and NaN·0 = NaN through the MXU),
        # so select-zero the overhang on BOTH operands
        valid = jnp.where(k == n_k - 1, k_rem, bk)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bk, 1), 0)
        w = jnp.where(rows < valid, w, jnp.zeros_like(w))
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        x = jnp.where(cols < valid, x, jnp.zeros_like(x))
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_blocks(M: int, K: int, N: int, align: int):
    bm = min(max(8, M), 256)
    bn = min(N, 512)
    bk = max(min(K, 512), align)
    # keep VMEM under ~8MB: w tile f32 + acc + x
    while (bk * bn * 4 + bm * bn * 4 + bm * bk * 4) > 8 * 1024 * 1024 and bk > align:
        bk //= 2
    return bm, max(bk, align), bn


@partial(jax.jit, static_argnames=("interpret", "out_dtype_name"))
def _qmatmul_2d(x, qt: QTensor, interpret=False, out_dtype_name="float32"):
    M, K = x.shape
    N = qt.N
    out_dtype = jnp.dtype(out_dtype_name)
    bm, bk, bn = _pick_blocks(M, K, N, _k_align(qt))
    n_m, n_n, n_k = pl.cdiv(M, bm), pl.cdiv(N, bn), pl.cdiv(K, bk)
    compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    witems = _weight_layout(qt)
    names = tuple(n for n, _ in witems)
    # Mosaic requires block sublane dims divisible by 8 (or the full dim).
    # Superblock-scale planes (d/dmin: one row per group·sb weights) tile to
    # <8 rows per k-step. A dynamic sublane slice of a hoisted full-K block
    # is NOT statically 8-aligned (Mosaic rejects it on hardware), so instead
    # reshape those planes to (n_k, rows, N) and let the grid's k index pick
    # the leading dim — the (rows, N) tile is then a full-dim block, which
    # Mosaic pads internally (matches the reference's in-kernel superblock
    # scale decode, ggml-cuda/mmvq.cu).
    hoisted: set[str] = set()
    in_specs = [
        pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
    ]
    args = [x]
    for name, (num, den) in witems:
        rows = bk * num // den
        plane = getattr(qt, name)
        total = plane.shape[0]
        if rows % 8 == 0 or rows == total:
            in_specs.append(pl.BlockSpec((rows, bn), lambda m, n, k: (k, n),
                                         memory_space=pltpu.VMEM))
        else:
            hoisted.add(name)
            pad_rows = n_k * rows - total
            if pad_rows:
                plane = jnp.pad(plane, ((0, pad_rows), (0, 0)))
            plane = plane.reshape(n_k, rows, plane.shape[1])
            in_specs.append(pl.BlockSpec(
                (1, rows, bn), lambda m, n, k: (k, 0, n),
                memory_space=pltpu.VMEM))
        args.append(plane)
    impl = partial(_qmm_kernel, nibble=qt.nibble, hi_bits=qt.hi_bits,
                   gs=qt.group, sb=qt.sb, offset=qt.offset, n_k=n_k,
                   compute_dtype=compute_dtype, k_rem=K % bk)

    def kern(x_ref, *rest):
        wrefs = {}
        for i, nm in enumerate(names):
            r = rest[i]
            # hoisted planes arrive as (1, rows, bn) blocks — drop the lead
            wrefs[nm] = r[0] if nm in hoisted else r
        o_ref, acc_ref = rest[len(names):]
        impl(x_ref, wrefs, o_ref, acc_ref)

    wbytes = sum(getattr(qt, n).nbytes for n in names)
    return pl.pallas_call(
        kern,
        grid=(n_m, n_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=wbytes + M * K * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


# --- int8-activation GEMV path (the mmvq analog) ------------------------------
#
# For decode-sized M the fused-dequant kernel is VPU-bound (every weight gets
# unpacked to float before a tiny 8-row MXU dot). Like the reference's mmvq
# (ggml-cuda/mmvq.cu with Q8_1 activations), we instead quantize activations
# to int8 per weight-group and do INTEGER dots per group on the MXU:
#   y_n = Σ_g sx_g·s_gn·(Σ_{k∈g} x̂_k q_kn) + Σ_g (a_gn − off·s_gn)·X_g
# Weight codes never become floats; per-element VPU work is just the nibble
# unpack. Accuracy = llama.cpp's Q8 activation standard (NMSE ~1e-6).


def _quantize_acts(x2: jax.Array, gs: int):
    M, K = x2.shape
    g = x2.reshape(M, K // gs, gs).astype(jnp.float32)
    amax = jnp.max(jnp.abs(g), axis=-1)                    # (M, G)
    sx = amax / 127.0
    inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
    xq = jnp.round(g * inv[..., None]).astype(jnp.int8)
    # group sums of the DEQUANTIZED activations (Q8_1's s·Σx̂): makes the
    # code-offset decomposition exact, not just first-order
    xsum = xq.astype(jnp.float32).sum(axis=-1) * sx
    return xq.reshape(M, K), sx, xsum


def _qmv_kernel(xq_ref, sx_ref, xs_ref, wrefs, o_ref, acc_ref, *,
                nibble: bool, hi_bits: int, gs: int, sb: int, offset: int,
                n_k: int):
    """One k-tile: per-group integer dots accumulated into the f32 scratch.

    The grid runs over K (full-N output tiles): finer HBM DMA granularity
    shrinks the pipeline warmup bubble that capped the full-K single-step
    layout (~525 GB/s), and the per-scale-group dot count G·(N/bn) collapses
    to G — measured 580 GB/s vs the 650-680 GB/s no-unpack ceiling of the
    same grid on v5e."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, _ = _tile_codes(wrefs, nibble=nibble, hi_bits=hi_bits, gs=gs)
    q = q.astype(jnp.int8)                                  # (gk, gs, bn)
    gk = q.shape[0]
    s, a = _tile_scales(wrefs, sb=sb)                       # (gk, bn)
    xq = xq_ref[0]                                          # (bm, bk) int8
    sx = sx_ref[0]                                          # (bm, gk)
    acc = acc_ref[:]
    for g in range(gk):
        ig = jax.lax.dot(xq[:, g * gs:(g + 1) * gs], q[g],
                         preferred_element_type=jnp.int32)  # (bm, bn)
        acc = acc + ig.astype(jnp.float32) * (sx[:, g][:, None] * s[g][None, :])
    # group-sum correction: adds term and/or folded code offset
    corr = a
    if offset:
        off = -float(offset) * s
        corr = off if corr is None else corr + off
    if corr is not None:
        acc = acc + jax.lax.dot(xs_ref[0], corr)            # (bm,gk)@(gk,bn)
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret", "out_dtype_name", "block_k"))
def _qmatmul_mv(x, qt: QTensor, interpret=False, out_dtype_name="float32",
                block_k: int | None = None):
    M, K = x.shape
    N = qt.N
    gs = qt.group
    out_dtype = jnp.dtype(out_dtype_name)
    witems = _weight_layout(qt)
    names = tuple(n for n, _ in witems)
    align = _k_align(qt)
    # Tile policy (all measured on v5e, docs/ops.md): the widest n tile cuts
    # the per-scale-group dot count (G·N/bn), but a PARTIAL last tile
    # re-fetches padding — a 4096-tile over N=14336 wasted 12% of HBM
    # traffic. Admit n tiles whose overfetch ceil(N/bn)·bn/N ≤ 3% and take
    # the widest; k tiles then target ~1.2 MB DMA steps (small enough to
    # hide the pipeline warmup, big enough to amortize per-step costs).
    per_kn = sum(num / den * getattr(qt, nm).dtype.itemsize
                 for nm, (num, den) in witems)  # weight bytes per (k, n)
    bn, best_of = min(N, 512), float("inf")
    for cand in range(512, min(N, 4096) + 1, 128):
        of = (pl.cdiv(N, cand) * cand) / N
        if of <= 1.03 or of < best_of - 1e-9:
            if of <= 1.03 and bn <= cand:
                bn, best_of = cand, of
            elif best_of > 1.03 and of < best_of:
                bn, best_of = cand, of
    n_n = pl.cdiv(N, bn)
    bk = align
    kstep_target = max(align, align * round(
        1.2e6 / max(per_kn * bn, 1) / align))
    target = min(K, block_k or kstep_target)
    for cand in range(align, K + 1, align):
        if K % cand == 0 and cand <= target \
                and per_kn * bn * cand <= 6 * 1024 * 1024:
            bk = cand
    n_k = K // bk

    xq, sx, xs = _quantize_acts(x, gs)
    gk = bk // gs
    xq3 = xq.reshape(M, n_k, bk).transpose(1, 0, 2)
    sx3 = sx.reshape(M, n_k, gk).transpose(1, 0, 2)
    xs3 = xs.reshape(M, n_k, gk).transpose(1, 0, 2)
    in_specs = [
        pl.BlockSpec((1, M, bk), lambda n, k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, gk), lambda n, k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, M, gk), lambda n, k: (k, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq3, sx3, xs3]
    # weight planes tile along (k, n); tiles with non-8-aligned row counts
    # (superblock scale planes) reshape to a k-leading axis (_qmatmul_2d's
    # Mosaic workaround)
    hoisted: set[str] = set()
    for name, (num, den) in witems:
        rows = bk * num // den
        plane = getattr(qt, name)
        total = plane.shape[0]
        if rows % 8 == 0 or rows == total:
            in_specs.append(pl.BlockSpec((rows, bn), lambda n, k: (k, n),
                                         memory_space=pltpu.VMEM))
            args.append(plane)
        else:
            hoisted.add(name)
            pad_rows = n_k * rows - total
            if pad_rows:
                plane = jnp.pad(plane, ((0, pad_rows), (0, 0)))
            plane = plane.reshape(n_k, rows, plane.shape[1])
            in_specs.append(pl.BlockSpec(
                (1, rows, bn), lambda n, k: (k, 0, n),
                memory_space=pltpu.VMEM))
            args.append(plane)
    impl = partial(_qmv_kernel, nibble=qt.nibble, hi_bits=qt.hi_bits,
                   gs=gs, sb=qt.sb, offset=qt.offset, n_k=n_k)

    def kern(xq_ref, sx_ref, xs_ref, *rest):
        wrefs = {}
        for i, nm in enumerate(names):
            r = rest[i]
            wrefs[nm] = r[0] if nm in hoisted else r
        o_ref, acc_ref = rest[len(names):]
        impl(xq_ref, sx_ref, xs_ref, wrefs, o_ref, acc_ref)

    wbytes = sum(getattr(qt, n).nbytes for n in names)
    return pl.pallas_call(
        kern,
        grid=(n_n, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=wbytes + M * K,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def qmatmul(x: jax.Array, qt: QTensor, *, interpret: bool | None = None,
            out_dtype=None, act_quant: bool | None = None,
            force_fused: bool = False) -> jax.Array:
    """x (..., K) @ quantized (K, N) → (..., N).

    Three regimes (the mmvq / mmq / cuBLAS split in the reference):
     - M ≤ 16 with act_quant: int8-activation GEMV kernel (Q8 per-group
       activations, mmvq semantics) — ~bits-per-weight HBM traffic with
       integer MXU dots; the decode path.
     - M > 32: dequantize-then-GEMM via XLA — at prefill sizes the GEMM is
       compute-bound, XLA's dequant fusion runs at HBM speed and the matmul
       at full MXU throughput (measured ~3.7× the fused Pallas kernel at
       M=2048 on v5e); W materialization is amortized.
     - otherwise: the fused dequant+matmul Pallas kernel (codes stay packed
       in HBM, group dequant in VMEM feeding the MXU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if act_quant is None:
        act_quant = False  # exactness by default; the model fwd opts in
    if act_quant and K % qt.group == 0:
        pad = (-M) % 8
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        out = _qmatmul_mv(x2, qt, interpret=interpret,
                          out_dtype_name=jnp.dtype(out_dtype).name)
        if pad:
            out = out[:M]
        return out.reshape(*lead, qt.N)
    if M > 32 and not force_fused:
        # compute-bound regime: dequant once (XLA fuses it at HBM speed),
        # GEMM at full MXU throughput
        wd = dequant_qtensor(qt, x2.dtype if x2.dtype == jnp.bfloat16 else None)
        out = jnp.dot(x2, wd, preferred_element_type=jnp.float32)
        return out.astype(out_dtype).reshape(*lead, qt.N)
    pad = (-M) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = _qmatmul_2d(x2, qt, interpret=interpret,
                      out_dtype_name=jnp.dtype(out_dtype).name)
    if pad:
        out = out[:M]
    return out.reshape(*lead, qt.N)


def qmatmul_ref(x: jax.Array, qt: QTensor) -> jax.Array:
    """jnp reference: dequantize then matmul (the conformance baseline)."""
    w = dequant_qtensor(qt, jnp.float32)
    return (x.astype(jnp.float32) @ w).astype(x.dtype)
