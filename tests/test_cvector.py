"""Control vectors (llama_adapter_cvec + tools/cvector-generator counterparts)
and export-lora (tools/export-lora counterpart)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from superllama_tpu.cli import main as cli_main
from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.models.cvector import (
    generate_control_vector,
    load_control_vector,
    save_control_vector,
)
from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.lora import convert_lora_from_peft, load_lora, merge_lora
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.kv_cache import kv_cache_init
from superllama_tpu.tools.convert_hf import convert_state_dict


@pytest.fixture(scope="module")
def spm_model(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items()
                  if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("cv") / "m.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32,
                       tokenizer_fields=tok_fields)
    return str(path), sd, cfg


def test_cvec_apply_changes_logits():
    hp = tiny_test_hparams()
    params = synthetic_params(hp, dtype=np.float32, seed=1)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in params.items()}
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    mk = lambda: kv_cache_init(hp.n_layer, 1, 8, hp.n_head_kv, hp.head_dim,
                               hp.head_dim_v, jnp.float32)
    base, _ = llama_forward(params, hp, toks, pos, mk(), flash=False)
    params["cvec"] = jnp.zeros((hp.n_layer, hp.n_embd), jnp.float32)
    zero, _ = llama_forward(params, hp, toks, pos, mk(), flash=False)
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base))
    params["cvec"] = params["cvec"].at[:, 0].set(0.5)
    steered, _ = llama_forward(params, hp, toks, pos, mk(), flash=False)
    assert not np.allclose(np.asarray(steered), np.asarray(base))


def test_generate_save_load_roundtrip(spm_model, tmp_path):
    path, _, _ = spm_model
    model = load_model(path)
    dirs = generate_control_vector(
        model,
        positive=["I love this, it is wonderful", "happy joyful great day"],
        negative=["I hate this, it is terrible", "sad miserable awful day"],
    )
    assert dirs.shape == (2, 64)
    assert np.abs(dirs).max() > 0
    norms = np.linalg.norm(dirs, axis=1)
    np.testing.assert_allclose(norms[norms > 0], 1.0, rtol=1e-4)

    out = tmp_path / "cv.gguf"
    save_control_vector(str(out), dirs)
    cv = load_control_vector(str(out), 2, 64, scale=0.8)
    np.testing.assert_allclose(np.asarray(cv), dirs * 0.8, rtol=1e-6)


def test_cvector_generator_cli(spm_model, tmp_path, capsys):
    path, _, _ = spm_model
    pf, nf = tmp_path / "pos.txt", tmp_path / "neg.txt"
    pf.write_text("good great\nnice kind\n")
    nf.write_text("bad awful\nmean cruel\n")
    out = tmp_path / "cv.gguf"
    rc = cli_main(["cvector-generator", "-m", path, "--positive-file", str(pf),
                   "--negative-file", str(nf), "-o", str(out)])
    assert rc == 0 and out.exists()
    r = GGUFReader(str(out))
    assert "direction.1" in r.tensors and "direction.2" in r.tensors
    r.close()


def test_export_lora_cli(spm_model, tmp_path):
    path, sd, cfg = spm_model
    rng = np.random.default_rng(0)
    rank, alpha = 4, 8.0
    peft_sd = {}
    for il in range(cfg.num_hidden_layers):
        pre = f"base_model.model.model.layers.{il}.self_attn.q_proj"
        peft_sd[pre + ".lora_A.weight"] = rng.normal(
            0, 0.05, (rank, cfg.hidden_size)).astype(np.float32)
        peft_sd[pre + ".lora_B.weight"] = rng.normal(
            0, 0.05, (cfg.hidden_size, rank)).astype(np.float32)
    lora_path = tmp_path / "l.gguf"
    convert_lora_from_peft(str(lora_path), peft_sd, alpha, arch="llama",
                           n_head=cfg.num_attention_heads,
                           n_head_kv=cfg.num_key_value_heads)

    out = tmp_path / "merged.gguf"
    rc = cli_main(["export-lora", "-m", path, "--lora", f"{lora_path}:0.5",
                   "-o", str(out)])
    assert rc == 0

    merged = load_model(str(out))
    ref = load_model(path)
    ref_params = merge_lora(ref.params, load_lora(str(lora_path)), 0.5)
    np.testing.assert_allclose(
        np.asarray(merged.params["layers"][0]["wq"], np.float32),
        np.asarray(ref_params["layers"][0]["wq"], np.float32),
        rtol=1e-5, atol=1e-6)
