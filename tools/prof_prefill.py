#!/usr/bin/env python
"""Prefill regression breakdown: time 8B prefill variants on hardware."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import functools

from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.synthetic import llama3_8b_hparams, synthetic_qparams_device
from superllama_tpu.runtime.kv_cache import kv_cache_init


def fetch(x):
    return np.asarray(x)


def main():
    hp8 = llama3_8b_hparams()
    p8 = synthetic_qparams_device(hp8, seed=0)
    B = 1
    T8 = 2048
    S8p = T8 + 8
    rng = np.random.default_rng(0)
    pos8 = jnp.broadcast_to(jnp.arange(T8, dtype=jnp.int32)[None], (B, T8))
    pr8 = jnp.asarray(rng.integers(0, hp8.n_vocab, (B, T8)), jnp.int32)

    for name, flash in (("flash", None), ("noflash", False)):
        step8 = jax.jit(
            lambda prm, tok, pos, c, fl=flash: llama_forward(prm, hp8, tok, pos, c, flash=fl),
            donate_argnums=(3,))

        def chained(k, pr):
            t0 = time.perf_counter()
            for i in range(k):
                c = kv_cache_init(hp8.n_layer, B, S8p, hp8.n_head_kv, hp8.head_dim,
                                  hp8.head_dim_v, dtype=jnp.bfloat16)
                lg, c = step8(p8, pr, pos8, c)
                pr = (jnp.argmax(lg, axis=-1).astype(jnp.int32) + i) % hp8.n_vocab
            fetch(pr[:, -1])
            return time.perf_counter() - t0, pr

        _, pr = chained(1, pr8)
        t_lo, pr = chained(1, pr)
        t_hi, pr = chained(3, pr)
        dt = (t_hi - t_lo) / 2
        print(f"{name}: {dt*1e3:.1f} ms/prefill -> {T8/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
