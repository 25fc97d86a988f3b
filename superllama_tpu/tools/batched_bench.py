"""Batched decode benchmark — llama-batched-bench counterpart
(tools/batched-bench, the table format of benches/dgx-spark/dgx-spark.md:31):
for each (PP, TG, B) config, measure prompt-processing throughput, text-
generation throughput, and total speed with B parallel sequences.

Timing uses data-dependent scan chains (one dispatch per phase) so tunnel
memoization cannot fabricate numbers.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..models.registry import get_forward
from ..ops import device_sampling
from ..runtime.kv_cache import kv_cache_init


@dataclass
class BenchRow:
    pp: int
    tg: int
    batch: int
    t_pp_s: float
    t_tg_s: float

    @property
    def s_pp(self) -> float:  # prompt tokens/s across the batch
        return self.pp * self.batch / self.t_pp_s

    @property
    def s_tg(self) -> float:  # generated tokens/s across the batch
        return self.tg * self.batch / self.t_tg_s

    @property
    def s_total(self) -> float:
        return (self.pp + self.tg) * self.batch / (self.t_pp_s + self.t_tg_s)

    def as_dict(self) -> dict:
        return {"pp": self.pp, "tg": self.tg, "batch": self.batch,
                "s_pp_tok_s": round(self.s_pp, 2),
                "s_tg_tok_s": round(self.s_tg, 2),
                "s_total_tok_s": round(self.s_total, 2)}


def run_batched_bench(model: LoadedModel, configs: list[tuple[int, int, int]],
                      n_ctx: int | None = None, kv_dtype=jnp.bfloat16,
                      seed: int = 0) -> list[BenchRow]:
    hp = model.hparams
    fwd = get_forward(hp.arch)
    rng = np.random.default_rng(seed)
    rows = []

    @functools.partial(jax.jit, donate_argnums=(3,))
    def prefill(params, tokens, pos, cache):
        return fwd(params, hp, tokens, pos, cache)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(2,))
    def decode_scan(params, tok0, cache, pos0, n: int):
        def body(carry, _):
            tok, pp, cache = carry
            lg, cache = fwd(params, hp, tok, pp, cache)
            nxt = device_sampling.greedy(lg[:, -1])[:, None]
            return (nxt, pp + 1, cache), nxt
        (_, _, cache), toks = jax.lax.scan(body, (tok0, pos0, cache), None, length=n)
        return toks, cache

    for pp, tg, b in configs:
        S = n_ctx or (pp + tg + 8)
        prompt = jnp.asarray(rng.integers(1, hp.n_vocab, (b, pp)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(pp, dtype=jnp.int32)[None], (b, pp))

        # warm compile on a throwaway cache
        warm = kv_cache_init(hp.n_layer, b, S, hp.n_head_kv, hp.head_dim,
                             hp.head_dim_v, dtype=kv_dtype)
        wl, warm = prefill(model.params, prompt, pos, warm)
        # data-dependent prompt for the timed run
        prompt2 = (jnp.argmax(wl, axis=-1).astype(jnp.int32) % hp.n_vocab)
        cache = kv_cache_init(hp.n_layer, b, S, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        t0 = time.perf_counter()
        logits, cache = prefill(model.params, prompt2, pos, cache)
        logits.block_until_ready()
        t_pp = time.perf_counter() - t0

        tok0 = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        p0 = jnp.full((b, 1), pp, jnp.int32)
        # compile, then timed dependent chain
        toks, cache = decode_scan(model.params, tok0, cache, p0, n=min(tg, 4))
        toks.block_until_ready()
        remaining = tg - min(tg, 4)
        t0 = time.perf_counter()
        if remaining > 0:
            toks, cache = decode_scan(model.params, toks[-1], cache,
                                      p0 + min(tg, 4), n=remaining)
            toks.block_until_ready()
            t_tg = (time.perf_counter() - t0) * tg / remaining
        else:
            t_tg = 1e-9
        rows.append(BenchRow(pp, tg, b, t_pp, t_tg))
        del cache, warm
    return rows


def format_table(rows: list[BenchRow]) -> str:
    hdr = f"| {'PP':>6} | {'TG':>5} | {'B':>3} | {'S_PP t/s':>10} | {'S_TG t/s':>10} | {'S t/s':>10} |"
    sep = "|" + "-" * (len(hdr) - 2) + "|"
    lines = [hdr, sep]
    for r in rows:
        lines.append(f"| {r.pp:>6} | {r.tg:>5} | {r.batch:>3} "
                     f"| {r.s_pp:>10.2f} | {r.s_tg:>10.2f} | {r.s_total:>10.2f} |")
    return "\n".join(lines)
