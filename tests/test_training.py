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


def test_grad_accumulation_matches_big_batch():
    """accum_steps=2 over half-batches == one step over the full batch
    (ggml_opt_fit nbatch_logical semantics): identical params after the
    logical update, no update after only the first micro-batch."""
    import jax

    hp, params = _tiny()
    rng = np.random.default_rng(0)
    toks = rng.integers(0, hp.n_vocab, (4, 8)).astype(np.int32)
    tgts = np.roll(toks, -1, axis=1)

    t_full = Trainer(hp, jax.tree.map(jnp.copy, params), optimizer="sgd",
                     lr=0.1)
    t_full.train_step(jnp.asarray(toks), jnp.asarray(tgts))

    t_acc = Trainer(hp, jax.tree.map(jnp.copy, params), optimizer="sgd",
                    lr=0.1, accum_steps=2)
    before = jax.tree.map(jnp.copy, t_acc.params)
    t_acc.train_step(jnp.asarray(toks[:2]), jnp.asarray(tgts[:2]))
    # mid-accumulation: no parameter movement yet
    mid = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     before, t_acc.params))
    assert max(mid) == 0.0
    t_acc.train_step(jnp.asarray(toks[2:]), jnp.asarray(tgts[2:]))
    diffs = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     t_full.params, t_acc.params))
    assert max(diffs) < 1e-6


def test_lr_schedule_decays():
    """A cosine schedule with warmup drives the step size: early steps are
    tiny (warmup from 0), mid steps large, late steps small again."""
    import jax

    from superllama_tpu.training.train import make_schedule

    sched = make_schedule("cosine", lr=0.5, warmup_steps=2, total_steps=10)
    assert float(sched(0)) == 0.0
    assert float(sched(2)) == pytest.approx(0.5, rel=1e-6)
    assert float(sched(9)) < float(sched(3))

    hp, params = _tiny()
    rng = np.random.default_rng(1)
    toks = rng.integers(0, hp.n_vocab, (2, 8)).astype(np.int32)
    tgts = np.roll(toks, -1, axis=1)
    tr = Trainer(hp, params, optimizer="sgd", lr=sched)
    p0 = jax.tree.map(jnp.copy, tr.params)
    tr.train_step(jnp.asarray(toks), jnp.asarray(tgts))   # lr 0 → no move
    d0 = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, tr.params)))
    assert d0 == 0.0
    tr.train_step(jnp.asarray(toks), jnp.asarray(tgts))
    p2 = jax.tree.map(jnp.copy, tr.params)
    tr.train_step(jnp.asarray(toks), jnp.asarray(tgts))
    d2 = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p2, tr.params)))
    assert d2 > 0.0


def test_fit_val_split_and_accuracy():
    """fit() trains on the front, evaluates on the back (idata_split), and
    reports decreasing train loss + a sane accuracy metric on a learnable
    constant-sequence dataset."""
    hp, params = _tiny()
    rng = np.random.default_rng(2)
    # learnable task: every sequence cycles tokens mod 7
    base = np.arange(12 * 16).reshape(12, 16) % 7
    toks = base.astype(np.int32)
    tgts = np.roll(toks, -1, axis=1)
    tr = Trainer(hp, params, optimizer="adamw", lr=5e-3)
    hist = tr.fit(toks, tgts, batch_size=4, epochs=6, val_split=0.34,
                  seed=3)
    assert len(hist["train_loss"]) == 6
    assert len(hist["val_loss"]) == 6
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["val_loss"][-1] < hist["val_loss"][0]
    assert 0.0 <= hist["val_accuracy"][-1] <= 1.0
    assert hist["val_accuracy"][-1] > hist["val_accuracy"][0]
