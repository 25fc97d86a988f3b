"""Per-kernel performance measurement on real TPU hardware — the `eval_perf`
mode of the backend-ops harness (test-backend-ops.cpp perf counterpart).

Measures achieved HBM GB/s for the bandwidth-bound kernels (quantized GEMV
decode, flash-decode attention) and achieved TFLOP/s for the compute-bound
ones (fused dequant matmul prefill, flash-attention prefill), then writes
docs/ops_perf.json which `tools.ops_doc` merges into the docs/ops.md
dashboard.

Axon-tunnel-safe methodology (see bench.py): every measurement is a single
jitted `lax.scan` whose carry is data-dependent (no call dedup), timed as a
two-length differential ending in a host fetch.

Run: python -m superllama_tpu.tools.ops_bench [--small]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np


def _fetch(x):
    return np.asarray(x)


def _scan_time(step, carry0, n_lo=8, n_hi=64, consts=()):
    """Per-iteration seconds of `step` via a jitted scan two-length
    differential; `step(carry, *consts) -> carry` must be data-dependent.

    Two tunnel rules baked in here:
    - the timed pass runs on a PERTURBED carry: the axon tunnel memoizes an
      exactly-repeated (program, input) dispatch and times it as ~one RTT
      (measured: impossible >HBM-peak "bandwidths", 0.00 µs differentials);
    - big invariants (weights, KV) ride as `consts` RUNTIME ARGS — closing
      over them bakes them into the compile payload (HTTP 413 past ~100 MB)
      and lets XLA constant-promote them out of HBM, faking the bandwidth."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(c, n: int, *cs):
        return jax.lax.scan(lambda c, _: (step(c, *cs), None), c, None,
                            length=n)[0]

    def perturb(c, eps):
        return jax.tree_util.tree_map(
            lambda x: x + jnp.asarray(
                eps if jnp.issubdtype(x.dtype, jnp.floating) else 1, x.dtype),
            c)

    # build + MATERIALIZE the perturbed carry before any timing: the eager
    # add is itself a tunnel compile (~0.4 s) the first time a carry shape
    # appears, which poisoned the short-length timing when done inline
    carry1 = perturb(carry0, 2 ** -6)
    _fetch(jax.tree_util.tree_leaves(carry1)[0].ravel()[0])
    times = {}
    for n in (n_lo, n_hi):
        out = run(carry0, n, *consts)                 # compile + warm
        _fetch(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        out = run(carry1, n, *consts)                 # fresh input: no memo
        _fetch(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times[n] = time.perf_counter() - t0
    return max(times[n_hi] - times[n_lo], 1e-9) / (n_hi - n_lo)


def _q4k_device(N, K, seed=0):
    """Random on-device Q4_K QTensor (production compact layout; no weight
    upload through the tunnel)."""
    import jax

    from ..gguf.constants import GGMLType
    from ..models.synthetic import _rand_q4k_parts
    from ..ops.qtensor import QTensor

    codes, sc, mn, d, dmin = jax.jit(
        _rand_q4k_parts, static_argnums=(1, 2))(
        jax.random.PRNGKey(seed), N, K)
    return QTensor(codes, None, None, 32, 0, True, K, N, GGMLType.Q4_K,
                   sc=sc, mn=mn, d=d, dmin=dmin, sb=8)


def bench_qmv(ttype_name="Q4_K", N=4096, K=4096):
    """Quantized GEMV decode (mmvq analog): bandwidth-bound; GB/s of weight
    traffic at M=1."""
    import jax.numpy as jnp

    from ..ops.qmatmul import qmatmul

    # R distinct weights as runtime args: one closed-over tensor gets
    # VMEM/const-promoted and the "bandwidth" reads far above HBM peak
    R = 16
    qts = [_q4k_device(N, K, seed=i) for i in range(R)]

    def step(x, *qts_):
        for qt in qts_:
            y = qmatmul(x, qt, act_quant=True)    # (1, N)
            x = jnp.tile(y, (1, (K + N - 1) // N))[:, :K]
            x = x / (1.0 + jnp.abs(x))            # data-dep feedback
        return x

    x0 = jnp.ones((1, K), jnp.float32)
    # a single GEMV is ~tens of µs: the two scan lengths must differ by
    # ≥0.5 s of real work to clear the ~30-100 ms tunnel jitter
    dt = _scan_time(step, x0, n_lo=8, n_hi=1608, consts=tuple(qts)) / R
    qt = qts[0]
    return {"GBps": round(qt.nbytes / dt / 1e9, 1),
            "us_per_call": round(dt * 1e6, 1),
            "shape": f"{ttype_name} {N}x{K} M=1"}


def bench_qmm(ttype_name="Q4_K", M=1024, N=4096, K=4096):
    """Fused dequant matmul prefill: compute-bound; achieved TFLOP/s."""
    import jax.numpy as jnp

    from ..ops.qmatmul import qmatmul

    qt = _q4k_device(N, K, seed=1)

    def step(x, qt_):
        y = qmatmul(x, qt_)                       # (M, N)
        fb = jnp.tile(y, (1, (K + N - 1) // N))[:, :K]
        return fb / (1.0 + jnp.abs(fb))

    x0 = jnp.ones((M, K), jnp.float32)
    dt = _scan_time(step, x0, n_lo=16, n_hi=1616,   # ~0.6 s differential
                    consts=(qt,))
    return {"TFLOPs": round(2 * M * N * K / dt / 1e12, 2),
            "us_per_call": round(dt * 1e6, 1),
            "shape": f"{ttype_name} {M}x{K}x{N}"}


def bench_fa_prefill(T=2048, S=2048, Hkv=8, G=4, D=128):
    """Flash attention prefill: achieved TFLOP/s (4·H·T·S·D flops)."""
    import jax
    import jax.numpy as jnp

    from ..ops.flash_attention import flash_attention

    H = Hkv * G
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (1, Hkv, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 1), (1, Hkv, S, D),
                          jnp.bfloat16)
    q_pos = jnp.arange(T, dtype=jnp.int32)[None] + (S - T)
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None]

    def step(q, k_, v_):
        o = flash_attention(q.astype(jnp.bfloat16), k_, v_, q_pos, kv_pos)
        return (o / (1.0 + jnp.abs(o))).astype(jnp.float32)

    q0 = jnp.ones((1, T, H, D), jnp.float32)
    dt = _scan_time(step, q0, n_lo=8, n_hi=264,     # ~0.5 s differential
                    consts=(k, v))
    return {"TFLOPs": round(4 * H * T * S * D / dt / 1e12, 2),
            "us_per_call": round(dt * 1e6, 1),
            "shape": f"T{T} S{S} H{H} D{D} bf16"}


def bench_fa_decode(S=8192, Hkv=8, G=4, D=128, kv="q8"):
    """Split-KV flash-decode attention (fattn-vec analog): bandwidth-bound;
    GB/s of K/V traffic at T=1 over a deep cache. kv ∈ {bf16, q8, q4}."""
    import jax
    import jax.numpy as jnp

    from ..ops.flash_attention import flash_decode_attention
    from ..runtime.kv_cache import q4_quantize_rows, q8_quantize_rows

    H = Hkv * G
    # R distinct KV sets totalling ≳400 MB: a single set fits the 128 MB
    # VMEM and gets promoted, faking the bandwidth
    per_set = Hkv * S * D * 2 * {"bf16": 2, "q8": 1, "q4": 0.5}[kv]
    R = max(2, min(32, int(-(-420e6 // per_set))))
    sets = []
    kv_bytes = 0
    for i in range(R):
        key = jax.random.fold_in(jax.random.PRNGKey(2), i)
        kf = jax.random.normal(key, (1, Hkv, S, D), jnp.float32)
        vf = jax.random.normal(jax.random.fold_in(key, 1), (1, Hkv, S, D),
                               jnp.float32)
        if kv == "q8":
            k, ks = q8_quantize_rows(kf)
            v, vs = q8_quantize_rows(vf)
            grp = (k, v, ks, vs)
        elif kv == "q4":
            k, ks = q4_quantize_rows(kf)
            v, vs = q4_quantize_rows(vf)
            grp = (k, v, ks, vs)
        else:
            grp = (kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16))
        kv_bytes += sum(a.nbytes for a in grp)
        sets.append(grp)
    kv_bytes //= R
    q_pos = jnp.full((1, 1), S - 1, jnp.int32)
    kv_pos = jnp.arange(S, dtype=jnp.int32)[None]
    width = len(sets[0])

    def step(q, *flat):
        for i in range(0, len(flat), width):
            k_, v_ = flat[i], flat[i + 1]
            kw = dict(zip(("k_scale", "v_scale"), flat[i + 2:i + width]))
            o = flash_decode_attention(q, k_, v_, q_pos, kv_pos, **kw)
            o = o.astype(jnp.float32)
            q = o / (1.0 + jnp.abs(o))
        return q

    q0 = jnp.ones((1, 1, H, D), jnp.float32)
    flat = tuple(a for grp in sets for a in grp)
    n_hi = 16 + max(64, int(0.5 / (R * 150e-6)))    # ~0.5 s differential
    dt = _scan_time(step, q0, n_lo=16, n_hi=n_hi, consts=flat) / R
    return {"GBps": round(kv_bytes / dt / 1e9, 1),
            "us_per_call": round(dt * 1e6, 1),
            "shape": f"T1 S{S} H{H} D{D} {kv} KV"}


def bench_paged_attention(S=8192, P=256, Hkv=8, G=4, D=128, B=1):
    """Paged flash attention over scalar-prefetch page tables at depth:
    bandwidth-bound like contiguous decode; the gap vs flash_attn_decode
    is the paging overhead (VERDICT r3 item 7)."""
    import jax
    import jax.numpy as jnp

    from ..ops.paged_attention import paged_flash_attention

    H = Hkv * G
    n_pages = B * S // P + 1                     # +1: the NULL page at slot 0
    # R distinct page pools (see bench_fa_decode: one pool fits VMEM)
    R = max(2, min(32, int(-(-420e6 // (n_pages * Hkv * P * D * 4)))))
    pools = []
    for i in range(R):
        key = jax.random.fold_in(jax.random.PRNGKey(3), i)
        pools.append((
            jax.random.normal(key, (n_pages, Hkv, P, D), jnp.bfloat16),
            jax.random.normal(jax.random.fold_in(key, 1),
                              (n_pages, Hkv, P, D), jnp.bfloat16)))
    # page i+1 holds positions [i*P, (i+1)*P); NULL page all -1
    page_pos = jnp.concatenate([
        jnp.full((1, P), -1, jnp.int32),
        jnp.arange(B * S, dtype=jnp.int32).reshape(-1, P)], axis=0)
    table = (jnp.arange(B * (S // P), dtype=jnp.int32).reshape(B, -1) + 1)
    q_pos = jnp.full((B, 1), S - 1, jnp.int32)
    kv_bytes = ((n_pages - 1) * Hkv * P * D * 2 * 2) // B * B

    def step(q, *flat):
        for i in range(0, len(flat), 2):
            o = paged_flash_attention(q, flat[i], flat[i + 1], q_pos,
                                      page_pos, table).astype(jnp.float32)
            q = o / (1.0 + jnp.abs(o))
        return q

    q0 = jnp.ones((B, 1, H, D), jnp.float32)
    flat = tuple(a for grp in pools for a in grp)
    n_hi = 16 + max(64, int(0.5 / (R * 150e-6)))
    dt = _scan_time(step, q0, n_lo=16, n_hi=n_hi, consts=flat) / R
    return {"GBps": round(kv_bytes / dt / 1e9, 1),
            "us_per_call": round(dt * 1e6, 1),
            "shape": f"T1 S{S} P{P} H{H} D{D} bf16 pages"}


def main():
    import jax

    small = "--small" in sys.argv
    tiny = "--tiny" in sys.argv    # CPU smoke: interpret-mode Pallas is slow
    dev = str(jax.devices()[0])
    out = {"device": dev}
    if tiny:
        global _scan_time
        base = _scan_time
        _scan_time = lambda step, c, n_lo=1, n_hi=3, consts=(): \
            base(step, c, 1, 3, consts)
        out["qmv_q4k_gemv"] = bench_qmv(N=256, K=512)
        out["qmm_q4k_prefill"] = bench_qmm(M=32, N=256, K=512)
        out["flash_attn_prefill"] = bench_fa_prefill(T=64, S=64, Hkv=2, G=2,
                                                     D=64)
        out["flash_attn_decode_q8"] = bench_fa_decode(S=256, Hkv=2, G=2,
                                                      D=64)
        out["paged_attn_decode"] = bench_paged_attention(S=512, P=128,
                                                         Hkv=2, G=2, D=64)
        print(json.dumps(out))
        return
    scale = 0.25 if small else 1.0
    cases = [
        ("qmv_q4k_gemv", lambda: bench_qmv(N=int(4096 * scale), K=4096)),
        ("qmm_q4k_prefill", lambda: bench_qmm(M=int(1024 * scale),
                                              N=int(4096 * scale), K=4096)),
        ("flash_attn_prefill", lambda: bench_fa_prefill(
            T=int(2048 * scale), S=int(2048 * scale))),
        ("flash_attn_decode_q8",
         lambda: bench_fa_decode(S=int(8192 * scale))),
        ("flash_attn_decode_q4",
         lambda: bench_fa_decode(S=int(8192 * scale), kv="q4")),
        ("flash_attn_decode_bf16",
         lambda: bench_fa_decode(S=int(8192 * scale), kv="bf16")),
        ("paged_attn_decode",
         lambda: bench_paged_attention(S=int(8192 * scale))),
    ]
    for name, fn in cases:
        for attempt in (1, 2):   # the tunnel occasionally drops a compile
            try:
                out[name] = fn()
                break
            except Exception as e:                       # noqa: BLE001
                if attempt == 2:
                    out[name] = {"error": str(e)[:160]}
        print(json.dumps({name: out[name]}), flush=True)
    path = Path(__file__).resolve().parents[2] / "docs" / "ops_perf.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
