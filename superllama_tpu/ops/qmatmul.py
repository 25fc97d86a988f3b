"""Fused dequant + matmul Pallas kernels.

The TPU analog of the reference's quantized GEMM/GEMV kernels
(ggml-cuda/mmq.cu*, mmvq.cu): quantized codes stay packed in HBM, get
dequantized group-wise in VMEM, and feed the MXU — HBM traffic is ~bits-per-
weight instead of 16, which is the whole ballgame for decode (bandwidth-bound).

One kernel covers every repacked format (see ops/qtensor.py): int8 or packed
4-bit codes × per-group scales (+ optional additive term).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qtensor import QTensor, dequant_qtensor


def _qmm_kernel(x_ref, c_ref, s_ref, a_ref, o_ref, acc_ref, *,
                nibble: bool, gs: int, offset: int, n_k: int, compute_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c = c_ref[:]
    bn = c.shape[-1]
    if nibble:
        # Mosaic has no 8-bit shifts and no u8→f32 cast; do bit ops in i32
        p = c.reshape(-1, 16, bn).astype(jnp.int32)      # (BK/32, 16, BN)
        q = jnp.concatenate([p & 0x0F, p >> 4], axis=1)  # (BK/32, 32, BN)
        bk = q.shape[0] * 32
    else:
        bk = c.shape[0]
        q = c.reshape(bk // gs, gs, bn).astype(jnp.int32)
    w = (q.astype(jnp.float32) - float(offset)) * s_ref[:].reshape(-1, 1, bn)
    if a_ref is not None:
        w = w + a_ref[:].reshape(-1, 1, bn)
    w = w.reshape(bk, bn).astype(compute_dtype)
    acc_ref[:] += jnp.dot(x_ref[:].astype(compute_dtype), w,
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick_blocks(M: int, K: int, N: int, gs: int):
    bm = min(max(8, M), 256)
    bn = min(N, 512)
    bk = min(K, 512)
    # keep VMEM under ~8MB: w tile f32 + acc + x
    while (bk * bn * 4 + bm * bn * 4 + bm * bk * 4) > 8 * 1024 * 1024 and bk > gs:
        bk //= 2
    return bm, bk, bn


@partial(jax.jit, static_argnames=("interpret", "out_dtype_name"))
def _qmatmul_2d(x, qt: QTensor, interpret=False, out_dtype_name="float32"):
    M, K = x.shape
    N = qt.N
    gs = qt.group
    out_dtype = jnp.dtype(out_dtype_name)
    bm, bk, bn = _pick_blocks(M, K, N, gs)
    n_m, n_n, n_k = pl.cdiv(M, bm), pl.cdiv(N, bn), pl.cdiv(K, bk)
    c_rows = bk // 2 if qt.nibble else bk
    compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32

    in_specs = [
        pl.BlockSpec((bm, bk), lambda m, n, k: (m, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((c_rows, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // gs, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM),
    ]
    args = [x, qt.codes, qt.scales]
    if qt.adds is not None:
        in_specs.append(
            pl.BlockSpec((bk // gs, bn), lambda m, n, k: (k, n), memory_space=pltpu.VMEM)
        )
        args.append(qt.adds)
        kern = partial(_qmm_kernel, nibble=qt.nibble, gs=gs, offset=qt.offset,
                       n_k=n_k, compute_dtype=compute_dtype)
    else:
        kern = lambda x_ref, c_ref, s_ref, o_ref, acc_ref: _qmm_kernel(
            x_ref, c_ref, s_ref, None, o_ref, acc_ref,
            nibble=qt.nibble, gs=gs, offset=qt.offset, n_k=n_k,
            compute_dtype=compute_dtype,
        )

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
            bytes_accessed=qt.codes.nbytes + qt.scales.nbytes + M * K * 4 + M * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)


def qmatmul(x: jax.Array, qt: QTensor, *, interpret: bool | None = None,
            out_dtype=None) -> jax.Array:
    """x (..., K) @ quantized (K, N) → (..., N)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
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
