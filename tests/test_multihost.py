"""Multi-host helpers (single-process degenerate behavior; the mesh logic is
exercised with process_count()==1 over the virtual 8-CPU mesh)."""

import pytest

jax = pytest.importorskip("jax")

from superllama_tpu.parallel.multihost import (init_distributed, is_primary,
                                               make_multihost_mesh)


def test_single_host_no_distributed(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() is False
    assert is_primary()


def test_multihost_mesh_shape():
    mesh = make_multihost_mesh(tp=4, sp=1, ep=2)
    assert mesh.axis_names == ("dp", "sp", "tp", "ep")
    assert mesh.devices.shape == (1, 1, 4, 2)


def test_multihost_mesh_runs_psum():
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_multihost_mesh(tp=8)
    x = jax.device_put(jnp.arange(16.0).reshape(8, 2),
                       NamedSharding(mesh, P("tp", None)))
    total = jax.jit(lambda a: a.sum())(x)
    assert float(total) == sum(range(16))
