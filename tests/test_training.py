"""Training-subsystem tests: param-filter freezing, checkpoint/resume
determinism, and finetune → save-to-GGUF → reload round trip
(llama_opt_* + llama-model-saver counterparts)."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.models.saver import save_model_gguf
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.training.train import Trainer

torch.manual_seed(131)


def _tiny():
    hp = tiny_test_hparams(n_vocab=128, n_embd=32, n_head=4, n_head_kv=2,
                           head_dim=8, head_dim_v=8, n_rot=8, n_ff=64)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{lk: jnp.asarray(lv) for lk, lv in l.items()} for l in v])
              for k, v in synthetic_params(hp, dtype=np.float32, seed=0).items()}
    return hp, params


def _batch(hp, seed=0, B=2, T=12):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, hp.n_vocab, (B, T + 1)).astype(np.int32)
    return jnp.asarray(toks[:, :-1]), jnp.asarray(toks[:, 1:])


def test_param_filter_freezes_tensors():
    hp, params = _tiny()
    # train only FFN weights; attention must stay frozen
    tr = Trainer(hp, params, lr=1e-2,
                 param_filter=lambda path: "ffn_" in path)
    wq0 = np.asarray(tr.params["layers"][0]["wq"]).copy()
    up0 = np.asarray(tr.params["layers"][0]["ffn_up"]).copy()
    x, y = _batch(hp)
    for _ in range(3):
        tr.train_step(x, y)
    np.testing.assert_array_equal(np.asarray(tr.params["layers"][0]["wq"]), wq0)
    assert np.abs(np.asarray(tr.params["layers"][0]["ffn_up"]) - up0).max() > 1e-6


def test_checkpoint_resume_deterministic(tmp_path):
    hp, params = _tiny()
    tr = Trainer(hp, params, lr=1e-3)
    x, y = _batch(hp, seed=1)
    for _ in range(2):
        tr.train_step(x, y)
    ck = tmp_path / "ck.npz"
    tr.save_checkpoint(str(ck))
    # continue run A
    la = [tr.train_step(x, y) for _ in range(3)]

    # resume run B from the checkpoint: losses must match exactly
    hp2, params2 = _tiny()
    tr2 = Trainer(hp2, params2, lr=1e-3)
    tr2.load_checkpoint(str(ck))
    assert tr2.n_steps == 2
    lb = [tr2.train_step(x, y) for _ in range(3)]
    np.testing.assert_allclose(la, lb, rtol=1e-6)


def test_finetune_save_reload_gguf(tmp_path):
    """Finetune a converted model, save via the model saver, reload, and
    verify logits match the in-memory finetuned params."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      architectures=["LlamaForCausalLM"], tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    src = tmp_path / "base.gguf"
    convert_state_dict(str(src), cfg, sd, GGMLType.F32)
    model = load_model(str(src))

    tr = Trainer(model.hparams, model.params, lr=5e-3)
    rng = np.random.default_rng(3)
    toks = rng.integers(1, 256, (2, 17)).astype(np.int32)
    l0 = tr.train_step(jnp.asarray(toks[:, :-1]), jnp.asarray(toks[:, 1:]))
    for _ in range(4):
        l1 = tr.train_step(jnp.asarray(toks[:, :-1]), jnp.asarray(toks[:, 1:]))
    assert l1 < l0  # it actually learns

    model.params = tr.params
    out = tmp_path / "tuned.gguf"
    save_model_gguf(model, str(out))
    reloaded = load_model(str(out))

    ids = np.arange(1, 13, dtype=np.int32)
    a = np.asarray(Context(model, n_ctx=32, kv_dtype=np.float32).forward(ids)[0])
    b = np.asarray(Context(reloaded, n_ctx=32, kv_dtype=np.float32).forward(ids)[0])
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)
