"""Engine serving for non-dense memory types (VERDICT r4 item 3).

The reference serves every architecture through one slot loop —
create_memory returns kv/iswa/recurrent/hybrid (src/llama-model.cpp:
7505-7570) and update_slots (tools/server/server-context.cpp:1947) is
memory-agnostic. These tests pin the same capability here: mamba
(RecurrentCache), rwkv7 (RWKVCache) and jamba (HybridCache) models served
through the continuous-batching Engine with n_slots>1 must reproduce their
solo Context generations exactly, survive slot reuse (state reset), and
roundtrip per-slot state save/restore."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.models.loader import LoadedModel
from superllama_tpu.runtime import Context
from superllama_tpu.runtime.engine import Engine, GenRequest
from superllama_tpu.tools.convert_hf import convert_state_dict


def _mamba_model(tmp_path):
    from transformers import MambaConfig, MambaForCausalLM

    cfg = MambaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, time_step_rank=4,
        use_cache=False, architectures=["MambaForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(3)
    hf = MambaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "mamba.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return load_model(str(path))


def _jamba_model(tmp_path):
    cfg = transformers.JambaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        mamba_expand=2, mamba_d_state=8, mamba_d_conv=4, mamba_dt_rank=2,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0,
        num_experts=2, num_experts_per_tok=2,
        use_mamba_kernels=False, tie_word_embeddings=False,
        rms_norm_eps=1e-6, pad_token_id=0,
        architectures=["JambaForCausalLM"])
    torch.manual_seed(4)
    hf = transformers.JambaForCausalLM(cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "jamba.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return load_model(str(path))


def _rwkv7_model():
    import test_rwkv as tr

    rng = np.random.default_rng(9)
    return LoadedModel(hparams=tr._hp("rwkv7"),
                       params=tr._rwkv7_params(rng),
                       tokenizer=None, metadata={})


MODELS = {
    "mamba": _mamba_model,
    "rwkv7": lambda tmp_path=None: _rwkv7_model(),
    "jamba": _jamba_model,
}


def _make(name, tmp_path):
    fn = MODELS[name]
    return fn(tmp_path) if name != "rwkv7" else fn()


@pytest.mark.parametrize("name", ["mamba", "rwkv7", "jamba"])
def test_engine_kind_detected(name, tmp_path):
    model = _make(name, tmp_path)
    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    assert eng.kind == ("hybrid" if name == "jamba" else "recurrent")


@pytest.mark.parametrize("name", ["mamba", "rwkv7", "jamba"])
def test_concurrent_slots_match_solo(name, tmp_path):
    """Two concurrent streams through the batched engine == their solo
    Context runs, token for token — including a prompt long enough to need
    several fully-valid pow2 prefill chunks."""
    model = _make(name, tmp_path)
    V = model.hparams.n_vocab
    rng = np.random.default_rng(0)
    p1 = [int(t) for t in rng.integers(1, V, 21)]   # 21 = 16+4+1 chunks
    p2 = [int(t) for t in rng.integers(1, V, 5)]

    eng = Engine(model, n_slots=2, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    r1 = eng.submit(GenRequest(prompt_ids=p1, max_tokens=8, stop_eog=False))
    r2 = eng.submit(GenRequest(prompt_ids=p2, max_tokens=8, stop_eog=False))
    eng.run_until_drained()

    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    ref1 = ctx.greedy_generate(p1, 8, stop_eog=False)[len(p1):]
    ctx.reset()
    ref2 = ctx.greedy_generate(p2, 8, stop_eog=False)[len(p2):]
    assert r1.result(1)["tokens"] == ref1
    assert r2.result(1)["tokens"] == ref2


@pytest.mark.parametrize("name", ["mamba", "rwkv7"])
def test_slot_reuse_resets_state(name, tmp_path):
    """A second request on a reused slot must be unaffected by the previous
    request's recurrent state (reset-on-admit; no prefix reuse)."""
    model = _make(name, tmp_path)
    V = model.hparams.n_vocab
    rng = np.random.default_rng(1)
    prompts = [[int(t) for t in rng.integers(1, V, n)] for n in (7, 9, 5)]

    eng = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    outs = [eng.generate(p, max_tokens=6, stop_eog=False)["tokens"]
            for p in prompts]
    for p, got in zip(prompts, outs):
        ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
        assert got == ctx.greedy_generate(p, 6, stop_eog=False)[len(p):]


@pytest.mark.parametrize("name", ["mamba", "jamba"])
def test_slot_save_restore_roundtrip(name, tmp_path):
    """Recurrent/hybrid per-slot state save → erase → restore reproduces the
    continuation (llama_state_seq semantics for non-dense memory)."""
    model = _make(name, tmp_path)
    V = model.hparams.n_vocab
    rng = np.random.default_rng(2)
    prompt = [int(t) for t in rng.integers(1, V, 10)]

    eng = Engine(model, n_slots=1, n_ctx=128, kv_dtype=np.float32,
                 prefill_buckets=(16,))
    first = eng.generate(prompt, max_tokens=4, stop_eog=False)
    snap = eng.slot_save(0)
    # the last generated token is emitted but not yet fed back
    assert snap["n_past"] == len(prompt) + 3

    # a garbage request trashes the slot state
    eng.generate([int(t) for t in rng.integers(1, V, 6)], max_tokens=3,
                 stop_eog=False)
    eng.slot_erase(0)
    eng.slot_restore(0, snap)
    assert eng.slots[0].n_past == snap["n_past"]

    # restored state must continue exactly like an uninterrupted solo run
    ctx = Context(model, n_batch=1, n_ctx=128, kv_dtype=np.float32)
    full = ctx.greedy_generate(prompt, 10, stop_eog=False)[len(prompt):]
    assert first["tokens"] == full[:4]
    # drive 6 more tokens manually through the restored engine row
    import jax.numpy as jnp
    cont = []
    tok = first["tokens"][-1]
    n_past = snap["n_past"]
    for _ in range(6):
        t = np.full((1, 1), tok, np.int32)
        pos = np.full((1, 1), n_past, np.int32)
        lg, eng.cache = eng._decode(eng.model.params, jnp.asarray(t),
                                    jnp.asarray(pos), eng.cache)
        tok = int(np.argmax(np.asarray(lg[0, 0])))
        cont.append(tok)
        n_past += 1
    assert cont == full[4:]


def test_unsupported_modes_raise(tmp_path):
    model = _mamba_model(tmp_path)
    with pytest.raises(ValueError, match="not supported"):
        Engine(model, n_slots=1, n_ctx=64, kv_dtype=np.float32,
               ctx_shift=True)
    with pytest.raises(ValueError, match="dense"):
        Engine(model, n_slots=1, n_ctx=64, kv_dtype="q8_0")
