#!/usr/bin/env python
"""Engine-tax profiler: reproduce bench.py's engine_b1/engine_b8 cells with
phase-level timing so the residual vs the raw scan loop is attributable.

Splits the b8 wall into: admission+prefill wave, first-token fetch, steady
block decode (per-block launch/consume), and drain/rollback. Prints one JSON
blob; not part of the driver contract (bench.py is).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.models.synthetic import (llama3_8b_hparams,
                                                 synthetic_qparams_device)
    from superllama_tpu.runtime.engine import Engine, GenRequest

    hp8 = llama3_8b_hparams()
    p8 = synthetic_qparams_device(hp8, seed=0)
    S8 = 384
    m8 = LoadedModel(hparams=hp8, params=p8, tokenizer=None, metadata={})
    eng = Engine(m8, n_slots=8, n_ctx=S8, kv_dtype=jnp.bfloat16,
                 prefill_buckets=(32,), block_size=32, pipeline_depth=3)
    t0 = time.perf_counter()
    eng.warmup()
    warmup_s = time.perf_counter() - t0
    rng_e = np.random.default_rng(7)
    mk = lambda n_tok: [int(x) for x in rng_e.integers(1, 1000, n_tok)]
    eng.generate(mk(32), max_tokens=33, stop_eog=False)

    # ---- b1 ----
    for k in eng.metrics:
        eng.metrics[k] = 0 if isinstance(eng.metrics[k], int) else 0.0
    t0 = time.perf_counter()
    r1 = eng.generate(mk(32), max_tokens=257, stop_eog=False)
    b1_wall = time.perf_counter() - t0
    b1 = {"wall_s": round(b1_wall, 4),
          "rate": round((r1["n_generated"] - 1)
                        / max(r1["total_s"] - r1["ttft_s"], 1e-9), 2),
          "ttft_s": round(r1["ttft_s"], 4),
          "metrics": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in eng.metrics.items()}}

    # ---- b8 with phase instrumentation ----
    for k in eng.metrics:
        eng.metrics[k] = 0 if isinstance(eng.metrics[k], int) else 0.0
    reqs = [eng.submit(GenRequest(prompt_ids=mk(32), max_tokens=161,
                                  stop_eog=False)) for _ in range(8)]
    # drive the loop manually, timing each step() call bucketed by what ran
    t0 = time.perf_counter()
    step_times = []
    while True:
        ts = time.perf_counter()
        worked = eng.step()
        step_times.append(time.perf_counter() - ts)
        if not worked and all(r._done.is_set() for r in reqs):
            break
    wall = time.perf_counter() - t0
    n_gen = sum(r.result()["n_generated"] for r in reqs)
    ttfts = sorted(r.result()["ttft_s"] for r in reqs)
    st = np.asarray(step_times)
    b8 = {"wall_s": round(wall, 4), "rate": round(n_gen / wall, 1),
          "n_steps": len(step_times),
          "ttft_p50_ms": round(1e3 * ttfts[len(ttfts) // 2], 1),
          "step_p50_ms": round(1e3 * float(np.median(st)), 2),
          "step_max_ms": round(1e3 * float(st.max()), 1),
          "step_top5_ms": [round(1e3 * float(x), 1)
                           for x in np.sort(st)[-5:]],
          "metrics": {k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in eng.metrics.items()}}
    print(json.dumps({"warmup_s": round(warmup_s, 1), "b1": b1, "b8": b8}))


if __name__ == "__main__":
    main()
