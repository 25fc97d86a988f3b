"""Multi-host topology: DCN data/replica parallelism over ICI-meshed hosts.

The reference's only distributed transport is the custom TCP RPC backend
(ggml/src/ggml-rpc/ggml-rpc.cpp — per-tensor SET/GET + serialized-graph
compute, no collectives). The TPU-native replacement is jax.distributed:
every host runs the same program, XLA collectives ride ICI inside a slice
and DCN across slices, and the serving layer replicates engines per host
behind the router (server/router.py) instead of streaming tensors.

Intended layout (BASELINE config 5 — Llama-70B class, N≥2 hosts):
  mesh axes ("dp" over DCN/hosts) × ("sp","tp","ep" over ICI within a host)
  — weights replicated per host (or sharded over the host-local axes),
  requests sharded over hosts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pods
    auto-detect all three). Returns True when running multi-process."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0") or 0)
    if coordinator is None and n == 0:
        return False  # single host
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n or None,
                               process_id=pid if n else None)
    return jax.process_count() > 1


def make_multihost_mesh(tp: int | None = None, sp: int = 1, ep: int = 1) -> Mesh:
    """Global mesh: dp spans hosts (DCN), sp/tp/ep span each host's local
    chips (ICI). Collectives for tensor/expert parallel therefore never
    cross DCN; only batch-parallel gradient/throughput aggregation does —
    the layout the scaling book prescribes for serving."""
    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    tp = tp or (n_local // (sp * ep))
    assert sp * tp * ep == n_local, (
        f"sp*tp*ep = {sp * tp * ep} must equal local chips {n_local}")
    devs = np.empty((n_hosts, sp, tp, ep), dtype=object)
    for d in jax.devices():
        # host-major ordering: process_index selects the dp row
        slot = d.process_index
        loc = [x for x in jax.devices() if x.process_index == slot].index(d)
        devs[slot, (loc // (tp * ep)) % sp, (loc // ep) % tp, loc % ep] = d
    return Mesh(devs, ("dp", "sp", "tp", "ep"))


def make_pod_mesh(dp: int = 1, sp: int = 1, tp: int | None = None,
                  ep: int = 1) -> Mesh:
    """Mesh over ALL chips of a multi-host pod slice. Inside a TPU slice ICI
    spans hosts, so tp/ep axes may legitimately cross process boundaries —
    the layout for serving one model larger than a single host's HBM
    (BASELINE config 5, Llama-70B class on N≥2 hosts). Contrast
    make_multihost_mesh, which pins dp to the host boundary (DCN)."""
    n = jax.device_count()
    tp = tp or n // (dp * sp * ep)
    assert dp * sp * tp * ep == n, (
        f"dp*sp*tp*ep = {dp * sp * tp * ep} must equal global chips {n}")
    devs = np.array(jax.devices()).reshape(dp, sp, tp, ep)
    return Mesh(devs, ("dp", "sp", "tp", "ep"))


def broadcast_from_primary(tree):
    """Lockstep request distribution: every process must feed the same
    jitted steps, so the serving host (process 0) broadcasts request data
    (token batches, sampling params) to all others before each step batch.
    The counterpart of the reference's RPC SET_TENSOR push
    (ggml-rpc.cpp RPC_CMD_SET_TENSOR) — but one collective, not per-tensor
    socket writes."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def replicate(tree, mesh: Mesh):
    """Place host-local arrays as mesh-replicated global arrays (needed for
    pytrees created outside the sharded load path, e.g. a fresh KV cache,
    when running multi-process)."""
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, tree)


def is_primary() -> bool:
    """True on the host that should bind the public server port / write
    checkpoints (process 0)."""
    return jax.process_index() == 0
