"""GEMV kernel-variant probe — settle the decode-GEMV formulation on hardware.

The int8-activation GEMV (ops/qmatmul._qmv_kernel, the mmvq analog) measures
~530 GB/s of weight traffic on v5e vs the ~819 GB/s HBM peak, and it gates
decode tok/s. This probe times restructured variants of the same math on the
production Q4_K compact layout:

  v0  current kernel (Python loop over G groups -> G sequential small dots)
  v1  one batched lax.dot_general over the group axis (activations arrive
      pre-reshaped (G, bm, gs), so no in-kernel transpose)
  v2  lo/hi nibble-split batched dots: dot(x_lo, c & 0xF) + dot(x_hi, c >> 4)
      -- skips the (K, bn) concat materialization of the unpacked codes
  v3  v1 + k-split grid (finer DMA/compute overlap, acc scratch)
  v4  v1 with the nibble mask done in int8 (no i32 round-trip for `lo`)

Each variant is checked against qmatmul_ref before timing. Timing is the
axon-tunnel-safe scan differential from tools/ops_bench.

Run: python -m superllama_tpu.tools.qmv_probe [N K]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.qmatmul import _qmatmul_mv, _quantize_acts, qmatmul_ref
from .ops_bench import _q4k_device, _scan_time

GS, SB = 32, 8


def _scales(sc, mn, d, dmin, sb=SB):
    gd, bn = d.shape
    rep = lambda v: jnp.broadcast_to(v[:, None, :], (gd, sb, bn)).reshape(gd * sb, bn)
    s = rep(d) * sc.astype(jnp.int32).astype(jnp.float32)
    a = -(rep(dmin) * mn.astype(jnp.int32).astype(jnp.float32))
    return s, a


def _reduce(ig, sx, s, a, xs):
    # ig (G, bm, bn) i32; y[m,n] = sum_g sx[m,g]*s[g,n]*ig[g,m,n] + xs@a
    acc = (ig.astype(jnp.float32) * s[:, None, :] * sx.T[:, :, None]).sum(0)
    return acc + jax.lax.dot(xs, a)


def _kern_v1(xg_ref, sx_ref, xs_ref, c_ref, sc_ref, mn_ref, d_ref, dm_ref, o_ref):
    c = c_ref[:]
    bn = c.shape[-1]
    p = c.reshape(-1, 16, bn).astype(jnp.int32)
    q = jnp.concatenate([p & 0x0F, p >> 4], axis=1).astype(jnp.int8)  # (G,32,bn)
    s, a = _scales(sc_ref[:], mn_ref[:], d_ref[:], dm_ref[:])
    ig = jax.lax.dot_general(xg_ref[:], q, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    o_ref[:] = _reduce(ig, sx_ref[:], s, a, xs_ref[:]).astype(o_ref.dtype)


def _kern_v2(xl_ref, xh_ref, sx_ref, xs_ref, c_ref, sc_ref, mn_ref, d_ref,
             dm_ref, o_ref):
    c = c_ref[:]
    bn = c.shape[-1]
    p = c.reshape(-1, 16, bn).astype(jnp.int32)
    lo = (p & 0x0F).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    s, a = _scales(sc_ref[:], mn_ref[:], d_ref[:], dm_ref[:])
    dn = (((2,), (1,)), ((0,), (0,)))
    ig = (jax.lax.dot_general(xl_ref[:], lo, dn, preferred_element_type=jnp.int32)
          + jax.lax.dot_general(xh_ref[:], hi, dn, preferred_element_type=jnp.int32))
    o_ref[:] = _reduce(ig, sx_ref[:], s, a, xs_ref[:]).astype(o_ref.dtype)


def _kern_v4(xg_ref, sx_ref, xs_ref, c_ref, sc_ref, mn_ref, d_ref, dm_ref, o_ref):
    c = c_ref[:]
    bn = c.shape[-1]
    c8 = c.reshape(-1, 16, bn).astype(jnp.int8)
    lo = c8 & 0x0F                                           # int8 bitwise
    hi = (c.reshape(-1, 16, bn).astype(jnp.int32) >> 4).astype(jnp.int8)
    q = jnp.concatenate([lo, hi], axis=1)
    s, a = _scales(sc_ref[:], mn_ref[:], d_ref[:], dm_ref[:])
    ig = jax.lax.dot_general(xg_ref[:], q, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    o_ref[:] = _reduce(ig, sx_ref[:], s, a, xs_ref[:]).astype(o_ref.dtype)


def _kern_v3(xg_ref, sx_ref, xs_ref, c_ref, sc_ref, mn_ref, d_ref, dm_ref,
             o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    c = c_ref[:]
    bn = c.shape[-1]
    p = c.reshape(-1, 16, bn).astype(jnp.int32)
    q = jnp.concatenate([p & 0x0F, p >> 4], axis=1).astype(jnp.int8)
    s, a = _scales(sc_ref[:], mn_ref[:], d_ref[0], dm_ref[0])
    ig = jax.lax.dot_general(xg_ref[:], q, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.int32)
    acc_ref[:] += _reduce(ig, sx_ref[0], s, a, xs_ref[0])

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _prep(x, split_lohi: bool):
    M, K = x.shape
    xq, sx, xs = _quantize_acts(x, GS)
    G = K // GS
    xg = xq.reshape(M, G, GS).transpose(1, 0, 2)             # (G, bm, gs)
    if split_lohi:
        return (xg[:, :, :16], xg[:, :, 16:]), sx, xs
    return (xg,), sx, xs


@functools.partial(jax.jit, static_argnames=("variant",))
def qmv_variant(x, qt, variant: str):
    M, K = x.shape
    N = qt.N
    G = K // GS
    GD = K // (GS * SB)
    bn = 512
    n_n = pl.cdiv(N, bn)
    xgs, sx, xs = _prep(x, split_lohi=(variant == "v2"))
    kern = {"v1": _kern_v1, "v2": _kern_v2, "v4": _kern_v4}.get(variant)

    if variant == "v3":
        bk = 1024
        n_k = K // bk
        gk, gdk = bk // GS, bk // (GS * SB)
        # small planes ride a leading grid dim (full last dims keep Mosaic
        # tiling legal — same trick as _qmatmul_2d's hoisted planes)
        sx3 = sx.reshape(M, n_k, gk).transpose(1, 0, 2)
        xs3 = xs.reshape(M, n_k, gk).transpose(1, 0, 2)
        d3 = qt.d.reshape(n_k, gdk, N)
        dm3 = qt.dmin.reshape(n_k, gdk, N)
        in_specs = [
            pl.BlockSpec((gk, M, GS), lambda n, k: (k, 0, 0)),
            pl.BlockSpec((1, M, gk), lambda n, k: (k, 0, 0)),
            pl.BlockSpec((1, M, gk), lambda n, k: (k, 0, 0)),
            pl.BlockSpec((bk // 2, bn), lambda n, k: (k, n)),
            pl.BlockSpec((gk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((gk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, gdk, bn), lambda n, k: (k, 0, n)),
            pl.BlockSpec((1, gdk, bn), lambda n, k: (k, 0, n)),
        ]
        return pl.pallas_call(
            functools.partial(_kern_v3, n_k=n_k),
            grid=(n_n, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(xgs[0], sx3, xs3, qt.codes, qt.sc, qt.mn, d3, dm3)

    x_specs = [pl.BlockSpec(a.shape, lambda n: (0,) * a.ndim) for a in xgs]
    in_specs = x_specs + [
        pl.BlockSpec((M, G), lambda n: (0, 0)),
        pl.BlockSpec((M, G), lambda n: (0, 0)),
        pl.BlockSpec((K // 2, bn), lambda n: (0, n)),
        pl.BlockSpec((G, bn), lambda n: (0, n)),
        pl.BlockSpec((G, bn), lambda n: (0, n)),
        pl.BlockSpec((GD, bn), lambda n: (0, n)),
        pl.BlockSpec((GD, bn), lambda n: (0, n)),
    ]
    return pl.pallas_call(
        kern,
        grid=(n_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((M, bn), lambda n: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(*xgs, sx, xs, qt.codes, qt.sc, qt.mn, qt.d, qt.dmin)


def main():
    # Chain over R distinct weight tensors (>128 MB total): a single small
    # scan-invariant weight gets promoted into VMEM by XLA's memory-space
    # assignment and the "GB/s" reads far above HBM peak — real decode streams
    # GBs of distinct weights per token, so the probe must too.
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    R = 32      # 32 x 9.4 MB: no subset can hide in VMEM
    M = 8
    qts = [_q4k_device(N, K, seed=i) for i in range(R)]
    wbytes = sum(getattr(qts[0], f).nbytes
                 for f in ("codes", "sc", "mn", "d", "dmin"))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.float32)
    ref = np.asarray(qmatmul_ref(x0, qts[0]))

    def run(name):
        if name == "v0":
            fn = lambda x, qt: _qmatmul_mv(x, qt)
        else:
            fn = lambda x, qt: qmv_variant(x, qt, name)
        try:
            y = np.asarray(fn(x0, qts[0]))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
            return
        nmse = float(((y - ref) ** 2).mean() / (ref**2).mean())
        if nmse > 1e-4:
            print(f"{name}: WRONG nmse={nmse:.2e}")
            return

        def step(x, *qts_):
            for qt in qts_:
                y = fn(x, qt)
                x = y[:, :K] / (1.0 + jnp.abs(y[:, :K]))
            return x

        # distinct carries per attempt: an exact repeat would be memoized by
        # the tunnel and time as ~0
        dt = min(_scan_time(step, x0 + 0.03 * (i + 1), n_lo=16, n_hi=1040,
                            consts=tuple(qts))
                 for i in range(2)) / R
        print(f"{name}: {dt*1e6:8.2f} us  {wbytes/dt/1e9:7.1f} GB/s  nmse={nmse:.1e}")

    for name in (sys.argv[3].split(",") if len(sys.argv) > 3 else ("v0", "v1", "v3")):
        run(name)


if __name__ == "__main__":
    main()
