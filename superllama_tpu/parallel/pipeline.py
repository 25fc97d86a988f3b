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


# --------------------- transformer (llama) pipeline stages -------------------
#
# The real-model counterpart of the MLP demo above: each pp device owns a
# contiguous slice of decoder layers WITH their KV-cache rows, microbatches
# rotate through via ppermute, and cache writes are gated off on bubble ticks.
# Embedding and the output head stay outside the pipeline (replicated — they
# are the first/last stage's neighbors and tiny next to the layer stack).
# Reference semantics: ggml_backend_sched pipeline-parallel graph splitting
# (ggml/src/ggml-backend.cpp:670,1443) with per-split KV residency.


def llama_cache_init(n_stages: int, per: int, B: int, S: int, hp) -> dict:
    """Stacked per-stage KV state: leaves lead with (n_stages, per_stage·…)."""
    return {
        "k": jnp.zeros((n_stages, per, B, hp.n_head_kv, S, hp.head_dim),
                       jnp.float32),
        "v": jnp.zeros((n_stages, per, B, hp.n_head_kv, S, hp.head_dim_v),
                       jnp.float32),
        "pos": jnp.full((n_stages, B, S), -1, jnp.int32),
    }


def llama_stage_fn(hp):
    """Stage fn over stacked plain-llama decoder layers.

    Layer dict per layer: attn_norm, wq, wk, wv, wo, ffn_norm, ffn_gate,
    ffn_up, ffn_down — each stacked to (per_stage, ...) by stack_stages.
    State: {"k": (per,B,Hkv,S,D), "v": (per,B,Hkv,S,Dv), "pos": (B,S)}.
    fn(p, state, h, pos, row0) → (h', state'): appends this microbatch's K/V
    at slots pos % S for rows [row0, row0+mb) and attends over the stage's
    cache rows. Math mirrors models/llama.llama_forward's plain-llama path
    (rms-norm → rope'd GQA attention → silu gate·up FFN) so pipeline output
    is bit-comparable to the sequential forward."""
    from ..ops import jnp_ref as ops

    inv_freq, mscale = ops.rope_frequencies(
        hp.head_dim, hp.n_rot, hp.rope_freq_base, 1.0)
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    scale = hp.f_attn_scale if hp.f_attn_scale > 0.0 else 1.0 / (D ** 0.5)

    def fn(p, state, h, pos, row0):
        mb, T, E = h.shape
        S = state["k"].shape[4]
        safe_pos = jnp.maximum(pos, 0)
        slots = safe_pos % S                                  # (mb, T)
        rows = row0 + jnp.arange(mb, dtype=jnp.int32)         # (mb,)
        # global cache-pos plane: update this microbatch's rows
        stored = jnp.where(pos >= 0, pos, -1)
        cpos = state["pos"].at[rows[:, None], slots].set(stored)
        cpos_mb = jax.lax.dynamic_slice(cpos, (row0, 0), (mb, S))
        # additive causal mask vs cache positions (llama.causal_mask)
        mask = jnp.where(
            (cpos_mb[:, None, None, :] >= 0)
            & (cpos_mb[:, None, None, :] <= safe_pos[:, None, :, None]),
            0.0, -jnp.inf).astype(jnp.float32)

        def layer(x, xs):
            lp, ck, cv = xs
            h1 = ops.rms_norm(x, lp["attn_norm"], hp.rms_eps)
            q = (h1 @ lp["wq"]).reshape(mb, T, H, D)
            k = (h1 @ lp["wk"]).reshape(mb, T, Hkv, D)
            v = (h1 @ lp["wv"]).reshape(mb, T, Hkv, Dv)
            q = ops.apply_rope(q, safe_pos, inv_freq, hp.rope_type, mscale)
            k = ops.apply_rope(k, safe_pos, inv_freq, hp.rope_type, mscale)
            # append to cache rows (B,Hkv,S,D layout): rows×slots scatter
            kt = k.transpose(0, 2, 1, 3)                       # (mb,Hkv,T,D)
            vt = v.transpose(0, 2, 1, 3)
            hidx = jnp.arange(Hkv, dtype=jnp.int32)[None, :, None]
            ck = ck.at[rows[:, None, None], hidx, slots[:, None, :]].set(kt)
            cv = cv.at[rows[:, None, None], hidx, slots[:, None, :]].set(vt)
            ck_mb = jax.lax.dynamic_slice(
                ck, (row0, 0, 0, 0), (mb, Hkv, S, D))
            cv_mb = jax.lax.dynamic_slice(
                cv, (row0, 0, 0, 0), (mb, Hkv, S, Dv))
            attn = ops.attention_ref(q, ck_mb, cv_mb, mask, scale=scale)
            x = x + attn.reshape(mb, T, H * Dv) @ lp["wo"]
            h2 = ops.rms_norm(x, lp["ffn_norm"], hp.rms_eps)
            ffn = (jax.nn.silu(h2 @ lp["ffn_gate"]) * (h2 @ lp["ffn_up"])) @ lp["ffn_down"]
            return x + ffn, (ck, cv)

        h, (k2, v2) = jax.lax.scan(layer, h, (p, state["k"], state["v"]))
        return h, {"k": k2, "v": v2, "pos": cpos}

    return fn


def pipeline_apply_kv(stage_fn, stages: dict, state: dict, x: jax.Array,
                      pos: jax.Array, mesh: Mesh, n_microbatch: int,
                      axis: str = "pp") -> tuple[jax.Array, dict]:
    """Stateful pipeline pass: like pipeline_apply, plus per-stage mutable
    state (KV caches, sharded over the pp axis) threaded through every tick
    and per-microbatch aux positions. State writes on bubble ticks are
    discarded, so the cache only ever holds real tokens.

    Returns (final-stage outputs (B, ...), updated state)."""
    n_stages = mesh.shape[axis]
    B = x.shape[0]
    assert B % n_microbatch == 0, (B, n_microbatch)
    mb = B // n_microbatch
    microh = x.reshape(n_microbatch, mb, *x.shape[1:])
    micropos = pos.reshape(n_microbatch, mb, *pos.shape[1:])
    perm_fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(stage_local, state_local, mh, mp):
        p = jax.tree_util.tree_map(lambda a: a[0], stage_local)
        st0 = jax.tree_util.tree_map(lambda a: a[0], state_local)
        s = jax.lax.axis_index(axis)
        last = n_stages - 1
        n_iter = n_microbatch + n_stages - 1

        def tick(carry, t):
            x_in, st, outs = carry
            m_raw = t - s
            m = jnp.clip(m_raw, 0, n_microbatch - 1)
            live = (m_raw >= 0) & (m_raw < n_microbatch)
            inject = mh[jnp.clip(t, 0, n_microbatch - 1)]
            x_cur = jnp.where(s == 0, inject, x_in)
            y, st2 = stage_fn(p, st, x_cur, mp[m], m * mb)
            st = jax.tree_util.tree_map(
                lambda a, b: jnp.where(live, b, a), st, st2)
            valid_out = (s == last) & live
            outs = jax.lax.cond(
                valid_out, lambda o: o.at[m].set(y), lambda o: o, outs)
            x_next = jax.lax.ppermute(y, axis, perm_fwd)
            return (x_next, st, outs), None

        x0 = jnp.zeros_like(mh[0])
        outs0 = jnp.zeros_like(mh)
        (_, st, outs), _ = jax.lax.scan(
            tick, (x0, st0, outs0), jnp.arange(n_iter))
        outs = jax.lax.psum(outs, axis)
        return outs, jax.tree_util.tree_map(lambda a: a[None], st)

    stage_specs = jax.tree_util.tree_map(lambda _: P(axis), stages)
    state_specs = jax.tree_util.tree_map(lambda _: P(axis), state)
    kw = dict(mesh=mesh, in_specs=(stage_specs, state_specs, P(), P()),
              out_specs=(P(), state_specs))
    try:
        fn = shard_map(per_device, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(per_device, check_rep=False, **kw)
    outs, state = fn(stages, state, microh, micropos)
    return outs.reshape(B, *x.shape[1:]), state
