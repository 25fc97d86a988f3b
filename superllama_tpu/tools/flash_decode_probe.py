"""Flash-decode dispatch probe (VERDICT r3 item 3: flip the T<32 gate with
data): time the XLA-fused decode path the model actually uses
(ops.attention_gqa at S≥1024), the q-tile flash kernel, and the split-KV
flash_decode_attention kernel (fattn-vec analog) at DECODE shapes on the
real chip — using the tunnel-safe chained-differential methodology from
bench.py (block_until_ready does not wait through the tunnel; identical
dispatches dedup — every link is salted and timing is a two-length
differential).

Emits one JSON line per cell:
  {"cell": "B8_T1_S8192", "xla_ms": .., "fdec_ms": .., ...}
and a final recommendation line. Run on TPU:
  python -m superllama_tpu.tools.flash_decode_probe
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _timed_chain(fn, q0, kv, reps: int) -> tuple[float, jax.Array]:
    """Run `reps` data-dependent links; a host fetch is the only barrier.
    K/V ride as explicit arguments — closing over them would bake hundreds
    of MB of constants into the compile payload (tunnel-fatal).

    The salt MUST be representable at q's precision: a 1e-6 salt underflows
    in bf16, q stops changing, every link becomes an identical dispatch and
    the tunnel memoizes the lot (measured: non-monotone 'timings' in S)."""
    t0 = time.perf_counter()
    q = q0
    for i in range(reps):
        q = fn(q, jnp.float32(0.25 + 0.125 * (i % 4)), *kv)
    _ = np.asarray(q[0, 0, 0, :1])                  # real completion barrier
    return time.perf_counter() - t0, q


def _rate_ms(fn, q0, args) -> float:
    """ms/step via an adaptive two-length differential: size the long chain
    so its extra compute is ~1.2 s (far above the ~100 ms tunnel windows),
    take the min of 3 trials (noise only ever inflates wall time)."""
    _, qw = _timed_chain(fn, q0, args, 2)          # compile + warm
    t8, qw = _timed_chain(fn, qw, args, 8)
    est = max(t8 / 8, 1e-4)
    reps = int(min(512, max(32, 1.2 / est)))
    best = float("inf")
    for _ in range(3):
        lo, qw = _timed_chain(fn, qw, args, 8)
        hi, qw = _timed_chain(fn, qw, args, 8 + reps)
        best = min(best, (hi - lo) / reps)
    return best * 1e3


def probe(Bs=(1, 8), Ts=(1,), Ss=(2048, 8192, 32768),
          H=32, Hkv=8, D=128, dtype=jnp.bfloat16, q8=True):
    from ..ops.flash_attention import flash_attention, flash_decode_attention
    from ..ops.jnp_ref import attention_gqa
    from ..runtime.kv_cache import causal_mask, q8_quantize_rows

    results = []
    for B in Bs:
        for T in Ts:
            for S in Ss:
                rng = jax.random.PRNGKey(0)
                kq, kk, kvr = jax.random.split(rng, 3)
                k = jax.random.normal(kk, (B, Hkv, S, D), dtype)
                v = jax.random.normal(kvr, (B, Hkv, S, D), dtype)
                kv_pos = jnp.tile(jnp.arange(S, dtype=jnp.int32), (B, 1))
                q_pos = jnp.tile(jnp.arange(S - T, S, dtype=jnp.int32),
                                 (B, 1))
                scale = 1.0 / (D ** 0.5)

                @jax.jit
                def xla_link(q, salt, k, v, kv_pos, q_pos):
                    mask = causal_mask(kv_pos, q_pos)
                    o = attention_gqa(q, k, v, mask, scale=scale)
                    return q + o.astype(q.dtype) * salt

                @jax.jit
                def flash_link(q, salt, k, v, kv_pos, q_pos):
                    o = flash_attention(q, k, v, q_pos, kv_pos, scale=scale,
                                        interpret=False)
                    return q + o.astype(q.dtype) * salt

                @jax.jit
                def fdec_link(q, salt, k, v, kv_pos, q_pos):
                    o = flash_decode_attention(q, k, v, q_pos, kv_pos,
                                               scale=scale, interpret=False)
                    return q + o.astype(q.dtype) * salt

                q0 = jax.random.normal(kq, (B, T, H, D), dtype)
                kv = (k, v, kv_pos, q_pos)
                impls = [("xla", xla_link, kv), ("flash", flash_link, kv),
                         ("fdec", fdec_link, kv)]
                if q8:
                    # int8 codes + f32 per-row scale, like the Q8_0 KV cache
                    kq8, ks = jax.jit(q8_quantize_rows)(k)
                    vq8, vs = jax.jit(q8_quantize_rows)(v)
                    kvq = (kq8, vq8, kv_pos, q_pos, ks, vs)

                    @jax.jit
                    def fdq8_link(q, salt, k, v, kv_pos, q_pos, ks, vs):
                        o = flash_decode_attention(
                            q, k, v, q_pos, kv_pos, scale=scale,
                            k_scale=ks, v_scale=vs, interpret=False)
                        return q + o.astype(q.dtype) * salt

                    impls.append(("fdq8", fdq8_link, kvq))

                cell = {}
                for name, link, args in impls:
                    try:
                        cell[name] = _rate_ms(link, q0, args)
                    except Exception as e:                       # noqa: BLE001
                        cell[name] = float("nan")
                        cell[name + "_err"] = str(e)[-160:]
                row = {"cell": f"B{B}_T{T}_S{S}"}
                for nm in ("xla", "flash", "fdec", "fdq8"):
                    if nm in cell:
                        row[nm + "_ms"] = round(cell[nm], 3)
                if cell.get("xla") == cell.get("xla") and \
                        cell.get("fdec") == cell.get("fdec"):
                    row["fdec_vs_xla"] = round(cell["fdec"] / cell["xla"], 3)
                row.update({kk_: v_ for kk_, v_ in cell.items()
                            if kk_.endswith("_err")})
                results.append(row)
                print(json.dumps(row), flush=True)

    ok = [r for r in results if "fdec_vs_xla" in r]
    wins = sum(r["fdec_vs_xla"] < 1.0 for r in ok)
    rec = ("flip llama.py decode gate to flash_decode_attention"
           if ok and wins > len(ok) / 2
           else "keep XLA attention for decode shapes")
    print(json.dumps({"recommendation": rec,
                      "cells_fdec_faster": f"{wins}/{len(ok)}"}))
    return results


if __name__ == "__main__":
    assert jax.default_backend() != "cpu", "run this on the TPU"
    probe()
