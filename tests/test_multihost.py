"""Multi-host: single-process degenerate behavior of the helpers, plus a
REAL 2-process jax.distributed CPU cluster (multihost_worker.py) serving one
model tp-sharded across both processes' devices — the BASELINE config-5
shape, exercised without N hosts the way the reference tests multi-device
logic on the CPU backend (SURVEY §4 'Distributed w/o cluster')."""

import json
import os
import socket
import subprocess
import sys

import pytest

jax = pytest.importorskip("jax")

from superllama_tpu.parallel.multihost import (init_distributed, is_primary,
                                               make_multihost_mesh,
                                               make_pod_mesh)


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


def test_pod_mesh_shape():
    mesh = make_pod_mesh(dp=2, tp=4)
    assert mesh.axis_names == ("dp", "sp", "tp", "ep")
    assert mesh.devices.shape == (2, 1, 4, 1)


# --------------------- real 2-process cluster (serves one sharded model)


@pytest.fixture(scope="module")
def llama_q4k_path(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.tools.convert_hf import convert_state_dict

    torch.manual_seed(41)
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path_factory.mktemp("mh") / "llama-q4k.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.Q4_K)
    return str(path)


def test_two_process_cluster_serves_sharded_model(llama_q4k_path, tmp_path):
    """Spawn 2 jax.distributed CPU processes (4 virtual devices each); the
    primary receives the request and broadcasts it; the model is tp-sharded
    over all 8 global devices; both processes generate lockstep and must
    reproduce the single-process (dequantized, unsharded) generation."""
    from superllama_tpu.models import load_model
    from superllama_tpu.runtime import Context

    ref_model = load_model(llama_q4k_path)      # dequant→f32, no mesh
    prompt = list(range(1, 13))
    ref = Context(ref_model, n_ctx=64,
                  kv_dtype=__import__("numpy").float32).greedy_generate(
        prompt, 8, stop_eog=False)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo            # repo import w/o the TPU plugin site
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "multihost_worker.py"),
         coord, "2", str(pid), llama_q4k_path, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"proc{pid}.json") as f:
            results.append(json.load(f))
    for r in results:
        assert r["n_processes"] == 2 and r["n_devices"] == 8
        assert r["tokens"] == ref, (r["tokens"], ref)
