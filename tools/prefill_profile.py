#!/usr/bin/env python
"""Prefill end-to-end MFU ablation (VERDICT r4 #8): find where the T=2048
8B prefill loses time vs its GEMM-only roofline.

Measures, all on-chip with the two-length scan differential from ops_bench:
  1. full llama_forward prefill at n_layer=32 and n_layer=16 → per-layer
     time + fixed overhead (embed + final norm + lm_head + argmax)
  2. qmm at every per-layer GEMM shape (M=2048) + the lm_head shape
  3. flash-attention prefill per layer
The residual (per-layer time − GEMMs − attention) is the unfused
elementwise/norm/rope/cache-write cost. Prints one JSON blob.
"""

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from superllama_tpu.models.llama import llama_forward
    from superllama_tpu.models.synthetic import (llama3_8b_hparams,
                                                 synthetic_qparams_device)
    from superllama_tpu.runtime.kv_cache import kv_cache_init
    from superllama_tpu.tools.ops_bench import _scan_time, bench_qmm
    import dataclasses

    hp = llama3_8b_hparams()
    p = synthetic_qparams_device(hp, seed=0)
    T = 2048
    S = T + 8
    B = 1
    out = {}

    def prefill_rate(n_layer):
        hpx = dataclasses.replace(hp, n_layer=n_layer)
        px = dict(p)
        px["layers"] = p["layers"][:n_layer]
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

        def step(tok, prm):
            c = kv_cache_init(hpx.n_layer, B, S, hpx.n_head_kv, hpx.head_dim,
                              hpx.head_dim_v, dtype=jnp.bfloat16)
            lg, _ = llama_forward(prm, hpx, tok, pos, c)
            return (jnp.argmax(lg, axis=-1).astype(jnp.int32) + 1) % hpx.n_vocab

        tok0 = jnp.ones((B, T), jnp.int32)
        sec = _scan_time(step, tok0, n_lo=1, n_hi=4, consts=(px,))
        return sec

    t32 = prefill_rate(32)
    t16 = prefill_rate(16)
    per_layer = (t32 - t16) / 16
    fixed = t32 - 32 * per_layer
    out["prefill_t32_ms"] = round(t32 * 1e3, 1)
    out["prefill_tok_per_s"] = round(T / t32, 1)
    out["per_layer_ms"] = round(per_layer * 1e3, 3)
    out["fixed_overhead_ms"] = round(fixed * 1e3, 2)
    print(json.dumps({k: out[k] for k in out}), flush=True)

    # GEMM-only at the real per-layer shapes (M=T)
    gemm_ms = {}
    for name, N, K in (("q", 4096, 4096), ("kv", 1024, 4096),
                       ("o", 4096, 4096), ("gate_up", 14336, 4096),
                       ("down", 4096, 14336)):
        r = bench_qmm(M=T, N=N, K=K)
        gemm_ms[name] = r["us_per_call"] / 1e3
        print(json.dumps({f"qmm_{name}_M{T}_N{N}_K{K}": r}), flush=True)
    layer_gemm = (gemm_ms["q"] + 2 * gemm_ms["kv"] + gemm_ms["o"]
                  + 2 * gemm_ms["gate_up"] + gemm_ms["down"])
    out["layer_gemm_ms"] = round(layer_gemm, 3)

    lm = bench_qmm(M=T, N=12288, K=4096)  # lm_head proxy tile (128256 ≈ 10.4×)
    out["lmhead_est_ms"] = round(lm["us_per_call"] / 1e3 * 128256 / 12288, 2)
    print(json.dumps({"lm_head_proxy": lm}), flush=True)

    from superllama_tpu.tools.ops_bench import bench_fa_prefill
    fa = bench_fa_prefill(T=T, S=T, Hkv=8, G=4, D=128)
    out["layer_attn_ms"] = round(fa["us_per_call"] / 1e3, 3)
    out["layer_residual_ms"] = round(
        out["per_layer_ms"] - layer_gemm - out["layer_attn_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
