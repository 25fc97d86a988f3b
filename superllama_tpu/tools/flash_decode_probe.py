"""Flash-decode dispatch experiment (VERDICT item: depth-8k decode within
15% of depth-0): time XLA-fused reference attention vs the Pallas flash
kernel at DECODE shapes (T ∈ {1, 8, 16}, S ∈ {1k..16k}) on the real chip,
using the tunnel-safe chained-differential methodology from bench.py
(block_until_ready does not wait through the tunnel; identical dispatches
dedup — every link is salted and timing is a two-length differential).

Emits one JSON line per cell:
  {"cell": "T1_S8192", "xla_ms": .., "flash_ms": .., "flash_vs_xla": ..}
and a final recommendation line. Run on TPU:
  python -m superllama_tpu.tools.flash_decode_probe
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _timed_chain(fn, q0, kv, reps: int) -> tuple[float, jax.Array]:
    """Run `reps` data-dependent links; a host fetch is the only barrier.
    K/V ride as explicit arguments — closing over them would bake hundreds
    of MB of constants into the compile payload (tunnel-fatal)."""
    t0 = time.perf_counter()
    q = q0
    for i in range(reps):
        q = fn(q, jnp.float32(1e-6 * (i + 1)), *kv)  # salt: no dedup
    _ = np.asarray(q[0, 0, 0, :1])                  # real completion barrier
    return time.perf_counter() - t0, q


def probe(B=8, H=32, Hkv=8, D=128, dtype=jnp.bfloat16):
    from ..ops.flash_attention import flash_attention
    from ..ops.jnp_ref import attention_ref

    results = []
    from ..runtime.kv_cache import causal_mask

    for T in (1, 8, 16):
        for S in (1024, 4096, 8192, 16384):
            rng = jax.random.PRNGKey(0)
            kq, kk, kv = jax.random.split(rng, 3)
            k = jax.random.normal(kk, (B, Hkv, S, D), dtype)
            v = jax.random.normal(kv, (B, Hkv, S, D), dtype)
            kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
            q_pos = jnp.tile(jnp.arange(S - T, S, dtype=jnp.int32), (B, 1))
            scale = 1.0 / (D ** 0.5)

            @jax.jit
            def xla_link(q, salt, k, v, kv_pos, q_pos):
                mask = causal_mask(kv_pos, q_pos)
                o = attention_ref(q, k, v, mask, scale=scale)
                return q + o.astype(q.dtype) * salt

            @jax.jit
            def flash_link(q, salt, k, v, kv_pos, q_pos):
                o = flash_attention(q, k, v, q_pos, kv_pos, scale=scale,
                                    interpret=False)
                return q + o.astype(q.dtype) * salt

            q0 = jax.random.normal(kq, (B, T, H, D), dtype)
            kv = (k, v, kv_pos, q_pos)
            cell = {}
            for name, link in (("xla", xla_link), ("flash", flash_link)):
                try:
                    _, qw = _timed_chain(link, q0, kv, 2)   # compile + warm
                    lo, qw = _timed_chain(link, qw, kv, 4)
                    hi, qw = _timed_chain(link, qw, kv, 24)
                    cell[name] = (hi - lo) / 20.0 * 1e3     # ms per step
                except Exception as e:                      # noqa: BLE001
                    cell[name] = float("nan")
                    cell[name + "_err"] = str(e)[:120]
            row = {"cell": f"T{T}_S{S}",
                   "xla_ms": round(cell["xla"], 3),
                   "flash_ms": round(cell["flash"], 3)}
            if cell["xla"] == cell["xla"] and cell["flash"] == cell["flash"]:
                row["flash_vs_xla"] = round(cell["flash"] / cell["xla"], 3)
            row.update({k: v for k, v in cell.items() if k.endswith("_err")})
            results.append(row)
            print(json.dumps(row), flush=True)

    ok = [r for r in results if "flash_vs_xla" in r]
    wins = sum(r["flash_vs_xla"] < 1.0 for r in ok)
    rec = ("flip llama.py decode gate to flash" if ok and wins > len(ok) / 2
           else "keep XLA attention for decode shapes")
    print(json.dumps({"recommendation": rec,
                      "cells_flash_faster": f"{wins}/{len(ok)}"}))
    return results


if __name__ == "__main__":
    assert jax.default_backend() != "cpu", "run this on the TPU"
    probe()
