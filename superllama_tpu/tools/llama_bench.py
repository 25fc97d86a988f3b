"""Perf-matrix benchmark: (pp, tg, depth) × repetitions with mean ± stddev
and markdown / json / jsonl / csv output.

Counterpart of tools/llama-bench/llama-bench.cpp: each test row measures
prompt-processing throughput (ppN — N tokens in one batch) or text-generation
throughput (tgN — N sequential decode steps), optionally at a prefilled
context depth (dN), repeated R times.

TPU measurement rules (axon): only data-dependent dispatch chains are timed —
each timed call consumes the previous call's output so the tunnel cannot
memoize; warmup compiles are excluded.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..runtime.context import Context


@dataclasses.dataclass
class BenchResult:
    model: str
    n_params: int
    test: str            # "pp512" | "tg128" | "pp512@d1024" …
    n_tokens: int
    avg_ts: float        # tokens/sec mean
    stddev_ts: float
    samples: list[float] = dataclasses.field(default_factory=list)


def _decode_chain(ctx: Context, n: int, seed_tok: int) -> float:
    """n sequential data-dependent decode steps; returns elapsed seconds."""
    tok = jnp.asarray([[seed_tok]], jnp.int32)
    t0 = time.perf_counter()
    for _ in range(n):
        logits = ctx.forward(np.asarray(tok))
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32) % ctx.hp.n_vocab
    tok.block_until_ready()
    return time.perf_counter() - t0


def run_bench(model: LoadedModel, pp: list[int] = (512,),
              tg: list[int] = (128,), depths: list[int] = (0,),
              reps: int = 3, n_ctx: int = 4096,
              kv_dtype=jnp.bfloat16) -> list[BenchResult]:
    rng = np.random.default_rng(0)
    hp = model.hparams
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(model.params)
                   if hasattr(l, "shape"))
    results = []
    for d in depths:
        for n in pp:
            ctx = Context(model, n_ctx=max(n_ctx, d + n + 1), kv_dtype=kv_dtype)
            samples = []
            for rep in range(reps + 1):  # first rep is compile warmup
                ctx.reset()
                if d:
                    ctx.forward(rng.integers(0, hp.n_vocab, (1, d)))
                prompt = rng.integers(0, hp.n_vocab, (1, n)).astype(np.int32)
                t0 = time.perf_counter()
                logits = ctx.forward(prompt)
                logits.block_until_ready()
                dt = time.perf_counter() - t0
                if rep > 0:
                    samples.append(n / dt)
            name = f"pp{n}" + (f"@d{d}" if d else "")
            results.append(BenchResult(
                model=model.name or hp.arch, n_params=n_params, test=name,
                n_tokens=n, avg_ts=statistics.mean(samples),
                stddev_ts=statistics.stdev(samples) if len(samples) > 1 else 0.0,
                samples=samples))
        for n in tg:
            ctx = Context(model, n_ctx=max(n_ctx, d + n + 2), kv_dtype=kv_dtype)
            samples = []
            for rep in range(reps + 1):
                ctx.reset()
                if d:
                    ctx.forward(rng.integers(0, hp.n_vocab, (1, d)))
                else:  # seed one token so decode has context
                    ctx.forward(np.asarray([[1]], np.int32))
                steps = n if rep > 0 else min(n, 3)  # short warmup
                dt = _decode_chain(ctx, steps, 2)
                if rep > 0:
                    samples.append(n / dt)
            name = f"tg{n}" + (f"@d{d}" if d else "")
            results.append(BenchResult(
                model=model.name or hp.arch, n_params=n_params, test=name,
                n_tokens=n, avg_ts=statistics.mean(samples),
                stddev_ts=statistics.stdev(samples) if len(samples) > 1 else 0.0,
                samples=samples))
    return results


def format_markdown(results: list[BenchResult]) -> str:
    dev = jax.devices()[0]
    rows = ["| model | params | backend | test | t/s |",
            "| ----- | ------ | ------- | ---- | --- |"]
    for r in results:
        rows.append(
            f"| {r.model} | {r.n_params/1e6:.1f}M | {dev.platform} "
            f"| {r.test} | {r.avg_ts:.2f} ± {r.stddev_ts:.2f} |")
    return "\n".join(rows)


def format_json(results: list[BenchResult]) -> str:
    return json.dumps([dataclasses.asdict(r) for r in results], indent=2)


def format_jsonl(results: list[BenchResult]) -> str:
    return "\n".join(json.dumps(dataclasses.asdict(r)) for r in results)


def format_csv(results: list[BenchResult]) -> str:
    hdr = "model,n_params,test,n_tokens,avg_ts,stddev_ts"
    rows = [hdr] + [f"{r.model},{r.n_params},{r.test},{r.n_tokens},"
                    f"{r.avg_ts:.4f},{r.stddev_ts:.4f}" for r in results]
    return "\n".join(rows)


FORMATTERS = {"md": format_markdown, "json": format_json,
              "jsonl": format_jsonl, "csv": format_csv}
