"""Expert-parallel sparse MoE (shard_map over the ``ep`` mesh axis).

The reference runs indexed expert GEMMs (ggml_mul_mat_id, ggml/src/ggml.c;
CUDA mmq id variants) and distributes MoE across GPUs by layer or by row
splits. The TPU-native redesign: expert banks shard over the ``ep`` axis
(slab of E/ep experts per device) and over ``tp`` inside each expert (the
row-split analog); tokens stay replicated across ep/tp within their
(dp, sp) shard, every device compacts the rows routed to ITS expert slab
into a static capacity-bounded buffer, runs ONE grouped GEMM
(jax.lax.ragged_dot) over the local slab, and a single psum over (ep, tp)
combines expert outputs — the only collective, riding ICI.

Capacity semantics (the standard TPU MoE tradeoff — XLA needs static
shapes): each device processes at most ``cap = ceil(S·K/ep · C)`` rows,
``C = hp.extra["moe_capacity"]`` (default ``ep`` → cap = every row: the
reference's EXACT no-drop ggml_mul_mat_id semantics). Setting ``C < ep``
opts into capacity-factor MoE: rows routed to a device beyond its
capacity are dropped (contribute zero), like capacity-bounded training
systems, trading exactness for K/E-proportional FLOPs. Per-device
expert FLOPs are 3·cap·D·F/tp = (K/E)·C of the dense formulation's
3·S·(E/ep)·D·F — the K/E reduction that makes Mixtral-class serving
viable (BASELINE config 4), now preserved on sharded meshes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _axis(mesh: Mesh, name: str) -> int:
    return mesh.shape[name] if name in mesh.axis_names else 1


def sharded_experts_apply(x: jax.Array, top_w: jax.Array, top_i: jax.Array,
                          layer: dict, hp, mesh: Mesh,
                          bank: str = "exps") -> jax.Array:
    """Routed-expert application over an ep(/tp)-sharded expert bank.

    Drop-in replacement for models.llama._experts_apply when ``mesh`` has
    ep > 1 (or tp > 1) and the banks are plain arrays sharded by
    parallel.mesh policy (ffn_*_exps: P("ep", None, "tp") / ("ep","tp",None)).
    Routing (top_w, top_i) is computed OUTSIDE (replicated per dp/sp shard).
    """
    from jax.experimental.shard_map import shard_map

    from ..models.llama import _glu
    from ..ops import jnp_ref as ops

    B, T, Dm = x.shape
    E = hp.n_expert
    K = top_i.shape[-1]
    ep = _axis(mesh, "ep")
    dp, sp, tp = _axis(mesh, "dp"), _axis(mesh, "sp"), _axis(mesh, "tp")
    rows_g = (B // dp) * (T // sp) * K          # rows per (dp,sp) shard
    # default C = ep → cap = rows_g: EXACT no-drop inference semantics
    # (matches ggml_mul_mat_id). Users opt into capacity-bounded FLOPs by
    # setting hp.extra["moe_capacity"] < ep; dropped rows then contribute 0.
    capf = float(hp.extra.get("moe_capacity", ep))
    cap = min(rows_g, int(math.ceil(rows_g / ep * capf)))
    # sublane-align the row buffer (MXU tiles; also keeps ragged_dot happy)
    cap = min(rows_g, -(-cap // 8) * 8)
    before = bool(hp.extra.get("expert_weights_before_ffn"))
    act_name, has_gate = hp.act, f"ffn_gate_{bank}" in layer

    up_w = layer[f"ffn_up_{bank}"]
    gate_w = layer.get(f"ffn_gate_{bank}")
    down_w = layer[f"ffn_down_{bank}"]
    up_b = layer.get(f"ffn_up_{bank}_b")
    gate_b = layer.get(f"ffn_gate_{bank}_b")
    down_b = layer.get(f"ffn_down_{bank}_b")

    def pad0(w):
        """Append the all-zero dummy expert that absorbs non-local rows."""
        return jnp.concatenate(
            [w, jnp.zeros((1,) + w.shape[1:], w.dtype)], axis=0)

    # assemble (arg, spec) pairs dynamically — optional tensors (gate bank,
    # per-expert biases) appear per model family
    opt = [("gate", gate_w, P("ep", None, "tp")),
           ("ub", up_b, P("ep", "tp")),
           ("gb", gate_b, P("ep", "tp")),
           ("db", down_b, P("ep", None))]
    present = [(n, a, s) for n, a, s in opt if a is not None]

    def local(xl, wl, il, up, down, *rest):
        extras = dict(zip([n for n, _, _ in present], rest))
        gate, ub = extras.get("gate"), extras.get("ub")
        gb, db = extras.get("gb"), extras.get("db")
        Bl, Tl, _ = xl.shape
        E_loc = up.shape[0]
        ep_i = jax.lax.axis_index("ep")
        rows = Bl * Tl * K
        xf = xl.reshape(rows // K, Dm)          # (S_loc, Dm)
        ei = il.reshape(rows)
        lo = ep_i * E_loc
        is_local = (ei >= lo) & (ei < lo + E_loc)
        key = jnp.where(is_local, ei - lo, E_loc)   # non-local → dummy group
        order = jnp.argsort(key, stable=True)       # local rows first
        sel = order[:cap]
        keyc = key[sel]                              # (cap,)
        tok = sel // K
        xs = xf[tok]
        w_s = wl.reshape(rows)[sel].astype(jnp.float32)
        if before:                                   # llama4 input scaling
            xs = xs * w_s[:, None].astype(xs.dtype)
        counts = jnp.bincount(keyc, length=E_loc + 1)
        f32 = jnp.float32
        upv = jax.lax.ragged_dot(xs, pad0(up), counts,
                                 preferred_element_type=f32)
        if ub is not None:
            upv = upv + pad0(ub)[keyc]
        if gate is not None:
            gv = jax.lax.ragged_dot(xs, pad0(gate), counts,
                                    preferred_element_type=f32)
            if gb is not None:
                gv = gv + pad0(gb)[keyc]
            act = _glu(gv.astype(xl.dtype), upv.astype(xl.dtype), hp)
        else:
            act = ops.ACT_FNS[act_name](upv.astype(xl.dtype))
        dv = jax.lax.ragged_dot(act, pad0(down), counts,
                                preferred_element_type=f32)
        if db is not None:   # per-expert (E, Dm) bias: add on tp rank 0 only
            on0 = (jax.lax.axis_index("tp") == 0).astype(f32)
            dv = dv + pad0(db)[keyc] * on0
        contrib = dv if before else dv * w_s[:, None]
        # zero non-local (dummy-group) rows — covers bias leakage too
        contrib = jnp.where((keyc < E_loc)[:, None], contrib, 0.0)
        y = jnp.zeros((rows // K, dv.shape[-1]), f32).at[tok].add(contrib)
        y = jax.lax.psum(y, ("ep", "tp"))
        return y.astype(xl.dtype).reshape(Bl, Tl, -1)

    tw = P("dp", "sp", None)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(tw, tw, tw, P("ep", None, "tp"), P("ep", "tp", None),
                  *[s for _, _, s in present]),
        out_specs=tw, check_rep=False)
    return fn(x, top_w, top_i, up_w, down_w, *[a for _, a, _ in present])


def sharded_moe_ffn(x: jax.Array, layer: dict, hp, mesh: Mesh,
                    router_x: jax.Array | None = None) -> jax.Array:
    """build_moe_ffn counterpart on an expert-parallel mesh: replicated
    routing + sharded grouped-GEMM expert application + shared expert."""
    from ..models.llama import _moe_route, _moe_shared_expert

    _, top_w, top_i = _moe_route(x, layer, hp, router_x)
    out = sharded_experts_apply(x, top_w, top_i, layer, hp, mesh)
    return _moe_shared_expert(x, layer, hp, out)
