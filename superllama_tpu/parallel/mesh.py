"""Device mesh + sharding policy.

TPU-native replacement for the reference's multi-device machinery
(ggml_backend_sched split placement, LLAMA_SPLIT_MODE_LAYER/ROW —
include/llama.h:191-194 — and the fork's llama_multi_gpu_manager strategies,
src/llama-multi-gpu.h:93-100): instead of assigning layers/rows to devices and
inserting copies, we annotate every weight with a PartitionSpec over a Mesh
and let GSPMD insert/overlap the collectives over ICI.

Axes:
  dp — data parallel (batch)             [DCN or ICI]
  sp — sequence parallel (activations T) [ICI]
  tp — tensor parallel (heads / ffn)     [ICI]
  ep — expert parallel (MoE experts)     [ICI]
  pp — pipeline parallel (layer stages)  [ICI] — see parallel/pipeline.py
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int | None = None, ep: int = 1, sp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if tp is None:
        # default: all-TP within a host (ICI-friendly), DP across what's left
        tp = n if dp is None else n // (dp * sp * ep)
    if dp is None:
        dp = n // (sp * tp * ep)
    assert dp * sp * tp * ep == n, f"mesh {dp}x{sp}x{tp}x{ep} != {n} devices"
    grid = np.array(devs[:n]).reshape(dp, sp, tp, ep)
    return Mesh(grid, ("dp", "sp", "tp", "ep"))


# weight-name pattern → PartitionSpec (matmul weights are stored (in, out))
_RULES: list[tuple[str, P]] = [
    (r"token_embd$", P(None, "tp")),            # (V, E): shard embed dim
    (r"output$", P(None, "tp")),                # (E, V): column/vocab split
    (r"(wq|wk|wv)$", P(None, "tp")),            # (E, H*D): head split
    (r"wo$", P("tp", None)),                    # (H*D, E): row split → psum
    (r"(ffn_gate|ffn_up)(_shexp)?$", P(None, "tp")),
    (r"ffn_down(_shexp)?$", P("tp", None)),
    (r"ffn_gate_inp(_shexp)?$", P(None, None)),  # router: replicated
    (r"(ffn_gate_exps|ffn_up_exps)$", P("ep", None, "tp")),
    (r"ffn_down_exps$", P("ep", "tp", None)),
    (r"(bq|bk|bv)$", P("tp")),
    (r".*", P()),                                # norms, biases: replicated
]


def spec_for(name: str) -> P:
    for pat, spec in _RULES:
        if re.search(pat, name):
            return spec
    return P()


def _fit_spec(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Trim a PartitionSpec to an array: drop axes beyond its rank and named
    axes whose dimension isn't divisible by the mesh axis size. The latter
    makes the policy pack-aware — a QTensor's small superblock-scale planes
    (d/dmin: K/256 rows) stay replicated when K/256 < tp while the codes
    still shard; GSPMD keeps global semantics either way."""
    out = []
    for i, ax in enumerate(spec[: len(shape)]):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape[ax] if isinstance(ax, str) else int(
            np.prod([mesh.shape[a] for a in ax]))
        out.append(ax if shape[i] % size == 0 else None)
    return P(*out)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a params pytree onto the mesh per the policy rules."""

    def place(path: str, x):
        spec = _fit_spec(spec_for(path), x.shape, mesh)
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = [
                {lk: place(lk, lv) for lk, lv in layer.items()} for layer in v
            ]
        elif v is not None:
            out[k] = place(k, v)
        else:
            out[k] = None
    return out


def make_sharder(mesh: Mesh):
    """Loader hook: place each tensor straight onto the mesh as it streams in
    (models/loader.py ``sharder`` param) — the counterpart of per-layer device
    assignment at load (llama_model::load_tensors, src/llama-model.cpp:2471),
    but expressed as PartitionSpecs instead of device picks."""

    gguf2key = {"attn_q": "wq", "attn_k": "wk", "attn_v": "wv",
                "attn_output": "wo", "attn_q.bias": "bq", "attn_k.bias": "bk",
                "attn_v.bias": "bv"}

    def sharder(name: str, arr) -> jax.Array:
        parts = name.split(".")
        base = parts[-2] if parts[-1] in ("weight", "bias") else parts[-1]
        if parts[-1] == "bias" and base in ("attn_q", "attn_k", "attn_v"):
            key = gguf2key[base + ".bias"]
        else:
            key = gguf2key.get(base, base)
        spec = _fit_spec(spec_for(key), arr.shape, mesh)
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return sharder


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Token batches (B, T): batch over dp, sequence over sp — GSPMD inserts
    the attention all-gathers when sp > 1 (sequence/context parallelism)."""
    if "sp" in mesh.axis_names:
        return NamedSharding(mesh, P("dp", "sp"))
    return NamedSharding(mesh, P("dp"))


def kv_sharding(mesh: Mesh):
    """KV cache (L, B, H_kv, S, D): batch over dp, kv-heads over tp."""
    return {
        "k": NamedSharding(mesh, P(None, "dp", "tp", None, None)),
        "v": NamedSharding(mesh, P(None, "dp", "tp", None, None)),
        "pos": NamedSharding(mesh, P("dp", None)),
        "cursor": NamedSharding(mesh, P("dp")),
    }
