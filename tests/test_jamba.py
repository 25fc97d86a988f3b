"""Jamba hybrid (attention+SSM interleave, MoE FFN) vs HF transformers.

Validates src/models/jamba.cpp counterpart semantics: layer routing by
per-layer head count, jamba's dt/B/C RMS norms in the mamba mixer, rope-less
attention, MoE without weight renormalization, HybridCache state carry."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from superllama_tpu.models.hparams import HParams
from superllama_tpu.models.jamba import hybrid_cache_init, jamba_forward

V, E, DI, DS, DC, RANK, NL, NH, NKV, FF, NE = 64, 32, 64, 8, 4, 2, 4, 4, 2, 48, 2


@pytest.fixture(scope="module")
def jamba_pair():
    cfg = transformers.JambaConfig(
        vocab_size=V, hidden_size=E, intermediate_size=FF,
        num_hidden_layers=NL, num_attention_heads=NH, num_key_value_heads=NKV,
        mamba_expand=2, mamba_d_state=DS, mamba_d_conv=DC, mamba_dt_rank=RANK,
        attn_layer_period=2, attn_layer_offset=1,
        expert_layer_period=2, expert_layer_offset=0,
        num_experts=NE, num_experts_per_tok=2,
        use_mamba_kernels=False, tie_word_embeddings=False,
        rms_norm_eps=1e-6, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = transformers.JambaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    t = lambda k: jnp.asarray(sd[k].T)
    a = lambda k: jnp.asarray(sd[k])

    layers = []
    hkv_arr = []
    for i in range(NL):
        p = f"model.layers.{i}."
        layer = {"attn_norm": a(p + "input_layernorm.weight"),
                 "ffn_norm": a(p + "pre_ff_layernorm.weight")}
        if p + "self_attn.q_proj.weight" in sd:
            hkv_arr.append(NKV)
            layer.update({
                "wq": t(p + "self_attn.q_proj.weight"),
                "wk": t(p + "self_attn.k_proj.weight"),
                "wv": t(p + "self_attn.v_proj.weight"),
                "wo": t(p + "self_attn.o_proj.weight"),
            })
        else:
            hkv_arr.append(0)
            layer.update({
                "ssm_in": t(p + "mamba.in_proj.weight"),
                "ssm_conv1d": jnp.asarray(sd[p + "mamba.conv1d.weight"][:, 0, :].T),
                "ssm_conv1d_b": a(p + "mamba.conv1d.bias"),
                "ssm_x": t(p + "mamba.x_proj.weight"),
                "ssm_dt": t(p + "mamba.dt_proj.weight"),
                "ssm_dt_b": a(p + "mamba.dt_proj.bias"),
                "ssm_a": -np.exp(a(p + "mamba.A_log")),  # GGUF convention: A
                "ssm_d": a(p + "mamba.D"),
                "ssm_out": t(p + "mamba.out_proj.weight"),
                "ssm_dt_norm": a(p + "mamba.dt_layernorm.weight"),
                "ssm_b_norm": a(p + "mamba.b_layernorm.weight"),
                "ssm_c_norm": a(p + "mamba.c_layernorm.weight"),
            })
        if p + "feed_forward.router.weight" in sd:
            layer.update({
                "ffn_gate_inp": t(p + "feed_forward.router.weight"),
                "ffn_gate_exps": jnp.stack(
                    [sd[p + f"feed_forward.experts.{e}.gate_proj.weight"].T
                     for e in range(NE)]),
                "ffn_up_exps": jnp.stack(
                    [sd[p + f"feed_forward.experts.{e}.up_proj.weight"].T
                     for e in range(NE)]),
                "ffn_down_exps": jnp.stack(
                    [sd[p + f"feed_forward.experts.{e}.down_proj.weight"].T
                     for e in range(NE)]),
            })
        else:
            layer.update({
                "ffn_gate": t(p + "feed_forward.gate_proj.weight"),
                "ffn_up": t(p + "feed_forward.up_proj.weight"),
                "ffn_down": t(p + "feed_forward.down_proj.weight"),
            })
        layers.append(layer)

    params = {
        "token_embd": a("model.embed_tokens.weight"),
        "output_norm": a("model.final_layernorm.weight"),
        "output": t("lm_head.weight"),
        "layers": layers,
    }
    hp = HParams(arch="jamba", n_vocab=V, n_ctx_train=256, n_embd=E,
                 n_layer=NL, n_head=NH, n_head_kv=NKV, n_ff=FF, n_rot=0,
                 head_dim=E // NH, head_dim_v=E // NH, rms_eps=1e-6,
                 ssm_d_conv=DC, ssm_d_inner=DI, ssm_d_state=DS,
                 ssm_dt_rank=RANK, n_expert=NE, n_expert_used=2,
                 expert_weights_norm=False, n_head_kv_arr=hkv_arr)
    return hf, hp, params


def test_hybrid_routing(jamba_pair):
    _, hp, _ = jamba_pair
    assert hp.is_hybrid and not hp.is_recurrent
    from superllama_tpu.models.jamba import hybrid_layer_split
    attn, rec = hybrid_layer_split(hp)
    assert attn == [1, 3] and rec == [0, 2]


def test_teacher_forced_parity(jamba_pair):
    hf, hp, params = jamba_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(1, V, (2, 10))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    cache = hybrid_cache_init(hp, 2, 32)
    pos = jnp.broadcast_to(jnp.arange(10, dtype=jnp.int32)[None], (2, 10))
    got, _ = jamba_forward(params, hp, jnp.asarray(ids, jnp.int32), pos, cache)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_chunked_decode_consistency(jamba_pair):
    _, hp, params = jamba_pair
    rng = np.random.default_rng(1)
    toks = rng.integers(1, V, 12)

    cache = hybrid_cache_init(hp, 1, 32)
    pos = jnp.arange(12, dtype=jnp.int32)[None]
    one, _ = jamba_forward(params, hp, jnp.asarray(toks[None]), pos, cache)

    cache = hybrid_cache_init(hp, 1, 32)
    outs = []
    for lo, hi in ((0, 7), (7, 8), (8, 12)):
        p = jnp.arange(lo, hi, dtype=jnp.int32)[None]
        lg, cache = jamba_forward(params, hp, jnp.asarray(toks[None, lo:hi]),
                                  p, cache)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), np.asarray(one),
                               rtol=2e-4, atol=2e-4)


def test_context_generate(jamba_pair):
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.runtime.context import Context
    from superllama_tpu.runtime.recurrent import HybridCache

    hf, hp, params = jamba_pair
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})
    ctx = Context(model, n_ctx=64)
    assert isinstance(ctx.cache, HybridCache)
    out = ctx.greedy_generate([1, 2, 3], 8, stop_eog=False)
    with torch.no_grad():
        ref = hf.generate(torch.tensor([[1, 2, 3]]), max_new_tokens=8,
                          do_sample=False)
    assert out == list(ref[0].numpy())
