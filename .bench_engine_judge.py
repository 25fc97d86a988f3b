import json, time, functools
import numpy as np, jax, jax.numpy as jnp
from superllama_tpu.models.synthetic import llama3_8b_hparams, synthetic_qparams_device
from superllama_tpu.models.loader import LoadedModel
from superllama_tpu.runtime.engine import Engine, GenRequest
hp8 = llama3_8b_hparams()
p8 = synthetic_qparams_device(hp8, seed=0)
S8 = 384
# bucket 128 avoids the M=32 fused-kernel Mosaic failure (judge diagnostic)
eng = Engine(LoadedModel(hparams=hp8, params=p8, tokenizer=None, metadata={}),
             n_slots=8, n_ctx=S8, kv_dtype=jnp.bfloat16,
             prefill_buckets=(128,), block_size=16)
rng_e = np.random.default_rng(7)
mk = lambda n: [int(x) for x in rng_e.integers(1, 1000, n)]
eng.generate(mk(32), max_tokens=33, stop_eog=False)
r1 = eng.generate(mk(32), max_tokens=257, stop_eog=False)
eng_b1 = (r1["n_generated"] - 1) / max(r1["total_s"] - r1["ttft_s"], 1e-9)
reqs = [eng.submit(GenRequest(prompt_ids=mk(32), max_tokens=161, stop_eog=False)) for _ in range(8)]
t0 = time.perf_counter(); eng.run_until_drained(); wall = time.perf_counter() - t0
n_gen = sum(r.result()["n_generated"] for r in reqs)
ttfts = sorted(r.result()["ttft_s"] for r in reqs)
print(json.dumps({"engine_b1_tok_per_s": round(eng_b1,2),
                  "engine_b8_tok_per_s": round(n_gen/wall,1),
                  "engine_ttft_p50_ms": round(1e3*ttfts[len(ttfts)//2],1)}))
