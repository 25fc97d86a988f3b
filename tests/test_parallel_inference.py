"""Multi-chip inference: tensor/expert-parallel sharded load + forward on the
virtual 8-device mesh must reproduce single-device logits (the BASELINE
config-4 shape: MoE expert-sharded + head-sharded attention over a mesh)."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.parallel.mesh import make_mesh, make_sharder
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(88)


@pytest.fixture(scope="module")
def mixtral_path(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, architectures=["MixtralForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path_factory.mktemp("mx") / "mixtral.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return str(path)


def test_sharded_load_matches_single_device(mixtral_path):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    ref_model = load_model(mixtral_path)
    ids = np.random.default_rng(0).integers(1, 256, size=16).astype(np.int32)
    ref = np.asarray(Context(ref_model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])

    mesh = make_mesh(8, dp=1, tp=4, ep=2)
    with mesh:
        model = load_model(mixtral_path, sharder=make_sharder(mesh))
        # attention heads actually sharded over tp
        wq = model.params["layers"][0]["wq"]
        assert len(wq.sharding.spec) and wq.sharding.spec[1] == "tp"
        exps = model.params["layers"][0]["ffn_up_exps"]
        assert exps.sharding.spec[0] == "ep"   # experts sharded over ep
        # per-device bytes strictly less than the full tensor
        shard = wq.addressable_shards[0].data
        assert shard.size < wq.size

        got = np.asarray(Context(model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_sharded_generation_matches(mixtral_path):
    ref_model = load_model(mixtral_path)
    prompt = list(range(1, 13))
    ref = Context(ref_model, n_ctx=64, kv_dtype=np.float32).greedy_generate(
        prompt, 8, stop_eog=False)

    mesh = make_mesh(8, dp=1, tp=4, ep=2)
    with mesh:
        model = load_model(mixtral_path, sharder=make_sharder(mesh))
        got = Context(model, n_ctx=64, kv_dtype=np.float32).greedy_generate(
            prompt, 8, stop_eog=False)
    assert got == ref


# ---- quantized multi-chip inference (BASELINE config 4 for real: sharded
# QTensor — codes/scale planes split over tp with superblock alignment via
# the pack-aware _fit_spec policy; GSPMD dequant+dot path; VERDICT r1 item 5)


@pytest.fixture(scope="module")
def llama_q4k_path(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path_factory.mktemp("lq") / "llama-q4k.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.Q4_K)
    return str(path)


@pytest.fixture(scope="module")
def mixtral_q4k_path(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM

    cfg = MixtralConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, architectures=["MixtralForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path_factory.mktemp("mq") / "mixtral-q4k.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.Q4_K)
    return str(path)


def test_sharded_q4k_forward_matches(llama_q4k_path):
    """Sharded QTensor forward == single-device exact path (T>32 both sides
    take dequant+dot, so parity is numeric not approximate)."""
    from superllama_tpu.ops.qtensor import QTensor

    ref_model = load_model(llama_q4k_path, keep_quantized=True)
    ids = np.random.default_rng(3).integers(1, 256, size=33).astype(np.int32)
    ref = np.asarray(
        Context(ref_model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])

    mesh = make_mesh(8, dp=1, tp=8, ep=1)
    with mesh:
        model = load_model(llama_q4k_path, keep_quantized=True,
                           sharder=make_sharder(mesh))
        wq = model.params["layers"][0]["wq"]
        assert isinstance(wq, QTensor) and wq.sharded
        # codes sharded over tp on the out axis; per-device bytes < full
        assert wq.codes.sharding.spec[1] == "tp"
        assert wq.codes.addressable_shards[0].data.size < wq.codes.size
        # row-split wo: codes split on the packed-K axis; the tiny d plane
        # (K/256 rows < tp) stays replicated by the pack-aware policy
        wo = model.params["layers"][0]["wo"]
        assert wo.codes.sharding.spec[0] == "tp"
        got = np.asarray(
            Context(model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err


def test_sharded_q4k_generation_matches(llama_q4k_path):
    """Greedy generation through the sharded quantized model == generation
    from the dequantized-f32 single-device load (same weight values)."""
    ref_model = load_model(llama_q4k_path)       # dequant→f32 load
    prompt = list(range(1, 13))
    ref = Context(ref_model, n_ctx=64, kv_dtype=np.float32).greedy_generate(
        prompt, 8, stop_eog=False)

    mesh = make_mesh(8, dp=1, tp=8, ep=1)
    with mesh:
        model = load_model(llama_q4k_path, keep_quantized=True,
                           sharder=make_sharder(mesh))
        got = Context(model, n_ctx=64, kv_dtype=np.float32).greedy_generate(
            prompt, 8, stop_eog=False)
    assert got == ref


def test_sharded_q4k_moe_ep_tp(mixtral_q4k_path):
    """Mixtral Q4_K over an ep2×tp4 mesh: 2-D weights ride as sharded
    QTensors, 3-D expert banks as ep-sharded dense — logits match the
    single-device exact path."""
    ref_model = load_model(mixtral_q4k_path, keep_quantized=True)
    ids = np.random.default_rng(5).integers(1, 256, size=33).astype(np.int32)
    ref = np.asarray(
        Context(ref_model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])

    mesh = make_mesh(8, dp=1, tp=4, ep=2)
    with mesh:
        model = load_model(mixtral_q4k_path, keep_quantized=True,
                           sharder=make_sharder(mesh))
        exps = model.params["layers"][0]["ffn_up_exps"]
        assert exps.sharding.spec[0] == "ep"
        got = np.asarray(
            Context(model, n_ctx=64, kv_dtype=np.float32).forward(ids)[0])
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 1e-4, err
