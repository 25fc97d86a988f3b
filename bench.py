#!/usr/bin/env python
"""Benchmark entry (driver contract: print ONE JSON line).

Measures steady-state greedy decode throughput on a TinyLlama-1.1B-dimension
model (BASELINE config 1 scale) with synthetic bf16 weights on the available
accelerator. vs_baseline anchors against the reference's only committed
single-stream decode number (gpt-oss-20B MXFP4 tg32 on DGX Spark = 86.58 t/s,
benches/dgx-spark/dgx-spark.md:61) — an imperfect cross-hardware anchor until
quantized-in-HBM 8B weights land (see BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from superllama_tpu.models.llama import llama_forward
    from superllama_tpu.models.synthetic import synthetic_params, tinyllama_hparams
    from superllama_tpu.runtime.kv_cache import kv_cache_init

    hp = tinyllama_hparams()
    params_np = synthetic_params(hp, dtype=np.float32, seed=0)
    to_dev = lambda x: jax.device_put(jnp.asarray(x, jnp.bfloat16))
    params = {
        "token_embd": to_dev(params_np["token_embd"]),
        "output": to_dev(params_np["output"]),
        "output_norm": to_dev(params_np["output_norm"]),
        "layers": [{k: to_dev(v) for k, v in l.items()} for l in params_np["layers"]],
    }
    del params_np

    B, T_PREFILL, N_DECODE, S = 1, 128, 64, 512
    cache = kv_cache_init(hp.n_layer, B, S, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.bfloat16)

    def step(params, tokens, pos, cache):
        return llama_forward(params, hp, tokens, pos, cache)

    step_j = jax.jit(step, donate_argnums=(3,))

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, hp.n_vocab, (B, T_PREFILL)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(T_PREFILL, dtype=jnp.int32)[None], (B, T_PREFILL))

    # prefill: warm up compile on a throwaway cache, then time with a prompt
    # DERIVED from the warmup output (the axon tunnel memoizes identical
    # dispatches, so the timed call must be data-dependent on the warmup)
    warm = kv_cache_init(hp.n_layer, B, S, hp.n_head_kv, hp.head_dim,
                         hp.head_dim_v, dtype=jnp.bfloat16)
    wlogits, _ = step_j(params, prompt, pos, warm)
    prompt2 = jnp.argmax(wlogits, axis=-1).astype(jnp.int32) % hp.n_vocab
    t0 = time.perf_counter()
    logits, cache = step_j(params, prompt2, pos, cache)
    logits.block_until_ready()
    prefill_s = time.perf_counter() - t0

    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    # decode warmup (compile T=1 shape)
    p = jnp.full((B, 1), T_PREFILL, jnp.int32)
    logits, cache = step_j(params, tok, p, cache)
    logits.block_until_ready()

    t0 = time.perf_counter()
    for i in range(1, N_DECODE):
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        logits, cache = step_j(params, tok, p + i, cache)
    logits.block_until_ready()
    decode_s = time.perf_counter() - t0
    stepwise_tps = (N_DECODE - 1) / decode_s

    # fully-jitted scan decode loop with on-device sampling (backend
    # sampling): one dispatch for the whole token stream — the serving path
    import functools

    from superllama_tpu.ops import device_sampling

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,))
    def scan_decode(params, tok0, cache, pos0, n_steps: int):
        def body(carry, _):
            tok, pp, cache = carry
            lg, cache = llama_forward(params, hp, tok, pp, cache)
            nxt = device_sampling.greedy(lg[:, -1])[:, None]
            return (nxt, pp + 1, cache), nxt
        (_, _, cache), toks = jax.lax.scan(
            body, (tok0, pos0, cache), None, length=n_steps)
        return toks, cache

    toks, cache = scan_decode(params, tok, cache, p + 1, n_steps=N_DECODE)
    toks.block_until_ready()  # compile
    # timed run: a DATA-DEPENDENT chain of scans (each consumes the previous
    # scan's last token and cache) — the axon tunnel memoizes repeated
    # identical dispatches, so only dependent chains measure real compute
    cache2 = kv_cache_init(hp.n_layer, B, S, hp.n_head_kv, hp.head_dim,
                           hp.head_dim_v, dtype=jnp.bfloat16)
    logits2, cache2 = step_j(params, prompt, pos, cache2)
    tok2 = jnp.argmax(logits2[:, -1:], axis=-1).astype(jnp.int32)
    N_CHAIN = 4
    t0 = time.perf_counter()
    pcur = p
    for _ in range(N_CHAIN):
        toks, cache2 = scan_decode(params, tok2, cache2, pcur, n_steps=N_DECODE)
        tok2 = toks[-1]
        pcur = pcur + N_DECODE
    toks.block_until_ready()
    scan_s = time.perf_counter() - t0
    scan_tps = N_CHAIN * N_DECODE / scan_s

    tok_per_s = max(stepwise_tps, scan_tps)
    prefill_tps = T_PREFILL / prefill_s
    baseline = 86.58  # gpt-oss-20B tg32 on DGX Spark (dgx-spark.md:61)
    print(json.dumps({
        "metric": "decode_tok_per_s_tinyllama1.1b_bf16_b1",
        "value": round(tok_per_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(tok_per_s / baseline, 3),
        "extra": {"prefill_tok_per_s": round(prefill_tps, 1),
                   "stepwise_tok_per_s": round(stepwise_tps, 2),
                   "scan_tok_per_s": round(scan_tps, 2),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    sys.exit(main())
