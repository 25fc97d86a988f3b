"""Pipeline parallelism over a 'pp' mesh axis: GPipe-style microbatch
rotation with lax.ppermute inside shard_map.

TPU-native counterpart of the reference's pipeline execution
(ggml_backend_sched_new(..., parallel=true) keeping ≤4 microbatch copies in
flight across layer-split devices — ggml-backend.cpp:670,1443): each device
holds one contiguous stage of layers; activations ride ICI to the next stage
via collective-permute while every stage computes a different microbatch.

The schedule runs n_micro + n_stages − 1 ticks; stage s processes microbatch
m at tick t = m + s. Bubble fraction = (n_stages−1)/(n_micro+n_stages−1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.6 exports shard_map at top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_pp_mesh(n_stages: int | None = None) -> Mesh:
    import numpy as np

    devs = jax.devices()
    n = n_stages or len(devs)
    return Mesh(np.array(devs[:n]), ("pp",))


def stack_stages(layers: list[dict], n_stages: int) -> dict:
    """Group per-layer param dicts into n_stages stacked pytrees: each leaf
    gains a leading (n_stages, layers_per_stage) axis, shardable over 'pp'.
    All layers must share one structure (true for homogeneous decoder stacks)."""
    assert len(layers) % n_stages == 0, (len(layers), n_stages)
    per = len(layers) // n_stages
    keys = sorted(layers[0].keys())
    out = {}
    for k in keys:
        out[k] = jnp.stack([
            jnp.stack([layers[s * per + i][k] for i in range(per)])
            for s in range(n_stages)
        ])  # (n_stages, per, ...)
    return out


def shard_stages(stages: dict, mesh: Mesh, axis: str = "pp") -> dict:
    """Place each stage's slice on its pipeline device."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in stages.items()}


def pipeline_apply(stage_fn, stages: dict, x: jax.Array, mesh: Mesh,
                   n_microbatch: int, axis: str = "pp") -> jax.Array:
    """Run x (B, ...) through all stages; stage_fn(stage_params, micro) maps
    one stage's stacked layer params over one microbatch, preserving shape.

    Returns the final-stage output, replicated (B, ...).
    """
    n_stages = mesh.shape[axis]
    B = x.shape[0]
    assert B % n_microbatch == 0, (B, n_microbatch)
    micro = x.reshape(n_microbatch, B // n_microbatch, *x.shape[1:])

    perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(stage_local, micro_all):
        # stage_local leaves: (1, per_stage, ...) → this device's stage
        p = jax.tree_util.tree_map(lambda a: a[0], stage_local)
        s = jax.lax.axis_index(axis)
        n_iter = n_microbatch + n_stages - 1
        last = n_stages - 1

        def tick(carry, t):
            x_in, outs = carry
            # stage 0 ingests a fresh microbatch (clamped index; masked later)
            inject = micro_all[jnp.clip(t, 0, n_microbatch - 1)]
            x_cur = jnp.where(s == 0, inject, x_in)
            y = stage_fn(p, x_cur)
            # collect on the last stage: its tick-t output is microbatch t-last
            m = t - last
            valid = (s == last) & (m >= 0) & (m < n_microbatch)
            outs = jax.lax.cond(
                valid,
                lambda o: o.at[jnp.clip(m, 0, n_microbatch - 1)].set(y),
                lambda o: o,
                outs,
            )
            # rotate activations to the next stage
            x_next = jax.lax.ppermute(y, axis, perm_fwd)
            return (x_next, outs), None

        x0 = jnp.zeros_like(micro_all[0])
        outs0 = jnp.zeros_like(micro_all)
        (_, outs), _ = jax.lax.scan(tick, (x0, outs0), jnp.arange(n_iter))
        # only the last stage holds real outputs → combine across stages
        return jax.lax.psum(outs, axis)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stages),
        P(),  # microbatches replicated across the pp axis
    )
    try:
        fn = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                       out_specs=P(), check_vma=False)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(per_device, mesh=mesh, in_specs=in_specs,
                       out_specs=P(), check_rep=False)
    outs = fn(stages, micro)
    return outs.reshape(B, *x.shape[1:])


def mlp_stage_fn(act=jax.nn.gelu):
    """Stage fn for stacked dense layers {'w': (per, E, E), 'b': (per, E)} —
    the minimal homogeneous stage used by tests and the driver dryrun."""

    def fn(p, x):
        def layer(h, wb):
            w, b = wb
            return act(h @ w + b), None

        h, _ = jax.lax.scan(layer, x, (p["w"], p["b"]))
        return h

    return fn
