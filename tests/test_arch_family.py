"""Forward-pass parity vs HF transformers for the expanded architecture
family: gemma2 (iSWA + softcaps + post-norms), gemma3 (q/k norms + dual rope
base), gpt-oss (MoE + attention sinks + clamped swiglu + alternating SWA),
phi3 (fused qkv/gate_up). Mirrors the reference's per-arch graph builders
(src/models/*.cpp) being validated against upstream implementations."""

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType
from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(3)


def _convert_and_load(hf_model, cfg, path):
    sd = {k: v.detach().float().numpy() for k, v in hf_model.state_dict().items()}
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    return load_model(str(path))


def _parity(hf_model, model, n_tokens=24, rtol=2e-4, atol=2e-4):
    V = model.hparams.n_vocab
    ids = np.random.default_rng(0).integers(1, V, size=(1, n_tokens))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits[0].float().numpy()
    ctx = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    got = np.asarray(ctx.forward(ids[0].astype(np.int32))[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, f"relative max err {err}"
    # greedy next-token must agree on every position
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.95


def test_gemma2_parity(tmp_path):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, attn_implementation="eager",
        architectures=["Gemma2ForCausalLM"],
    )
    hf = Gemma2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "g2.gguf")
    assert model.hparams.swa_pattern == 2
    assert model.hparams.attn_logit_softcap == 50.0
    _parity(hf, model)


def test_gemma3_parity(tmp_path):
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    cfg = Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, query_pre_attn_scalar=16,
        sliding_window=8, rope_theta=1000000.0, rope_local_base_freq=10000.0,
        attn_implementation="eager", architectures=["Gemma3ForCausalLM"],
    )
    hf = Gemma3ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "g3.gguf")
    assert model.hparams.swa_pattern == 6
    assert model.hparams.rope_freq_base_swa == 10000.0
    _parity(hf, model)


def test_gptoss_parity(tmp_path):
    from transformers import GptOssConfig, GptOssForCausalLM

    cfg = GptOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8, max_position_embeddings=128,
        rope_scaling=None, attn_implementation="eager",
        architectures=["GptOssForCausalLM"], tie_word_embeddings=False,
    )
    hf = GptOssForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "oss.gguf")
    hp = model.hparams
    assert hp.act == "swiglu_oai" and hp.n_expert == 4
    assert "attn_sinks" in model.params["layers"][0]
    assert "ffn_gate_inp_b" in model.params["layers"][0]
    _parity(hf, model)


def test_phi3_parity(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Phi3ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hf = Phi3ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "phi3.gguf")
    assert "ffn_gate" in model.params["layers"][0]  # fused gate_up was split
    _parity(hf, model)


def test_gptoss_sinks_affect_output(tmp_path):
    """Sanity: zeroing the sink tensor changes logits (the sink really joins
    the softmax denominator)."""
    import jax.numpy as jnp

    from transformers import GptOssConfig, GptOssForCausalLM

    cfg = GptOssConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_local_experts=2, num_experts_per_tok=1,
        sliding_window=4, max_position_embeddings=64, rope_scaling=None,
        architectures=["GptOssForCausalLM"], tie_word_embeddings=False,
    )
    hf = GptOssForCausalLM(cfg).eval()
    with torch.no_grad():  # make sinks clearly non-neutral
        for l in hf.model.layers:
            l.self_attn.sinks += 3.0
    model = _convert_and_load(hf, cfg, tmp_path / "oss2.gguf")
    ids = np.arange(1, 9, dtype=np.int32)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    base = np.asarray(ctx.forward(ids)[0])
    for layer in model.params["layers"]:
        layer["attn_sinks"] = jnp.zeros_like(layer["attn_sinks"]) - 1e9
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    nosink = np.asarray(ctx2.forward(ids)[0])
    assert np.abs(base - nosink).max() > 1e-3


def test_deepseek2_mla_parity(tmp_path):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=24, kv_lora_rank=32,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=1.0,
        topk_method="greedy", norm_topk_prob=False, n_group=1, topk_group=1,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["DeepseekV2ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = DeepseekV2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "ds2.gguf")
    hp = model.hparams
    assert hp.kv_lora_rank == 32 and hp.q_lora_rank == 24
    assert hp.n_layer_dense_lead == 1
    assert hp.head_dim == 24 and hp.head_dim_v == 16 and hp.n_rot == 8
    assert "wq_a" in model.params["layers"][0]
    assert "ffn_gate_exps" in model.params["layers"][1]
    assert "ffn_up_shexp" in model.params["layers"][1]
    _parity(hf, model)


def test_deepseek2_no_q_lora(tmp_path):
    """V2-Lite style: direct q projection (q_lora_rank None)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=48, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=8, qk_rope_head_dim=8, v_head_dim=8,
        q_lora_rank=None, kv_lora_rank=16,
        n_routed_experts=2, num_experts_per_tok=1, n_shared_experts=1,
        first_k_dense_replace=1, routed_scaling_factor=2.0,
        topk_method="greedy", norm_topk_prob=False, n_group=1, topk_group=1,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["DeepseekV2ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = DeepseekV2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "ds2l.gguf")
    assert "wq" in model.params["layers"][0]
    assert model.hparams.expert_weights_scale == 2.0
    _parity(hf, model, n_tokens=12)


def test_deepseek3_routing_parity(tmp_path):
    """DeepSeek-V3: sigmoid gating + e_score_correction_bias (selection-only)
    + grouped expert selection (top-2-sum group scores, -inf masking), per
    build_moe_ffn src/llama-graph.cpp:1090-1185."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        q_lora_rank=24, kv_lora_rank=32,
        n_routed_experts=8, n_group=4, topk_group=2, num_experts_per_tok=3,
        n_shared_experts=1, first_k_dense_replace=1,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        scoring_func="sigmoid",
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["DeepseekV3ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = DeepseekV3ForCausalLM(cfg).eval()
    with torch.no_grad():  # make the selection bias load-bearing
        for l in hf.model.layers[cfg.first_k_dense_replace:]:
            l.mlp.gate.e_score_correction_bias.uniform_(-0.4, 0.4)
    model = _convert_and_load(hf, cfg, tmp_path / "ds3.gguf")
    hp = model.hparams
    assert not hp.expert_gating_softmax
    assert hp.n_expert_groups == 4 and hp.n_group_used == 2
    assert hp.expert_weights_norm and hp.expert_weights_scale == 2.5
    assert "exp_probs_b" in model.params["layers"][1]
    _parity(hf, model)


def test_mamba_parity(tmp_path):
    """Selective-scan recurrence parity vs HF Mamba, and stepwise decode
    (recurrent state) must equal full-sequence prefill."""
    import jax.numpy as jnp

    from transformers import MambaConfig, MambaForCausalLM

    cfg = MambaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, time_step_rank=4,
        use_cache=False, architectures=["MambaForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = MambaForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "mamba.gguf")
    hp = model.hparams
    assert hp.is_recurrent and hp.ssm_d_inner == 128 and hp.ssm_d_conv == 4

    ids = np.random.default_rng(2).integers(1, 256, size=(1, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits[0].float().numpy()
    ctx = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    got = np.asarray(ctx.forward(ids[0].astype(np.int32))[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err

    # stepwise decode through the recurrent state == prefill logits
    ctx2 = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    step_logits = []
    for t in ids[0]:
        step_logits.append(np.asarray(ctx2.forward(np.asarray([t], np.int32))[0, -1]))
    np.testing.assert_allclose(np.stack(step_logits), got, rtol=1e-3, atol=1e-4)


def test_mamba2_parity(tmp_path):
    """Mamba-2 (SSD) parity vs HF: fused zxBCdt projection, conv over
    [x,B,C], per-head scalar decay, gated norm; plus stepwise == prefill.
    n_groups=1 so HF's ungrouped gated norm matches the reference's grouped
    norm exactly (graph-context-mamba.cpp:146 build_mamba2_layer)."""
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        state_size=8, conv_kernel=4, expand=2, head_dim=8, n_groups=1,
        num_heads=8, chunk_size=16,
        use_cache=False, architectures=["Mamba2ForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = Mamba2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "mamba2.gguf")
    hp = model.hparams
    assert hp.is_recurrent and hp.ssm_n_group == 1 and hp.ssm_dt_rank == 8
    assert hp.ssm_conv_dim == 64 + 2 * 8
    assert "ssm_norm" in model.params["layers"][0]

    ids = np.random.default_rng(2).integers(1, 128, size=(1, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits[0].float().numpy()
    ctx = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    got = np.asarray(ctx.forward(ids[0].astype(np.int32))[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-4, err

    ctx2 = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    step_logits = []
    for t in ids[0]:
        step_logits.append(np.asarray(ctx2.forward(np.asarray([t], np.int32))[0, -1]))
    np.testing.assert_allclose(np.stack(step_logits), got, rtol=1e-3, atol=1e-4)


def test_mamba2_grouped_state_consistency(tmp_path):
    """n_groups=2: grouped B/C (repeat_interleave head->group mapping) and
    grouped RMS norm — stepwise decode must equal prefill through the
    recurrent state."""
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        vocab_size=64, hidden_size=24, num_hidden_layers=2,
        state_size=4, conv_kernel=4, expand=2, head_dim=8, n_groups=2,
        num_heads=6, chunk_size=8,
        use_cache=False, architectures=["Mamba2ForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = Mamba2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "mamba2g.gguf")
    assert model.hparams.ssm_n_group == 2

    ids = np.random.default_rng(5).integers(1, 64, size=12)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    full = np.asarray(ctx.forward(ids.astype(np.int32))[0], np.float32)
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    steps = [np.asarray(ctx2.forward(np.asarray([t], np.int32))[0, -1])
             for t in ids]
    np.testing.assert_allclose(np.stack(steps), full, rtol=1e-3, atol=1e-4)


def test_granite_hybrid_parity(tmp_path):
    """granitehybrid (granite-4-style): mamba2 + attention layers by
    layer_types, granite multipliers, fused GraniteMoe expert FFN + shared
    expert (src/models/granite-hybrid.cpp)."""
    from transformers import GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM

    cfg = GraniteMoeHybridConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        mamba_n_heads=4, mamba_d_head=16, mamba_n_groups=1, mamba_d_state=8,
        mamba_d_conv=4, mamba_expand=2,
        layer_types=["mamba", "attention", "mamba"],
        num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=48,
        embedding_multiplier=4.0, residual_multiplier=0.5,
        attention_multiplier=0.2, logits_scaling=2.0,
        attn_implementation="eager", use_cache=False,
        architectures=["GraniteMoeHybridForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = GraniteMoeHybridForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "gh.gguf")
    hp = model.hparams
    assert hp.is_hybrid and hp.n_head_kv_arr == [0, 2, 0]
    assert hp.ssm_n_group == 1 and hp.ssm_dt_rank == 4 and hp.ssm_d_inner == 64
    assert hp.f_embedding_scale == 4.0 and hp.logit_scale == 0.5
    assert hp.expert_weights_norm
    assert "ffn_gate_exps" in model.params["layers"][0]
    assert "ffn_up_shexp" in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_falcon_h1_parity(tmp_path):
    """falcon-h1: attention + mamba2 run in PARALLEL in every layer; the mup
    channel multipliers are baked into converted weights exactly as the
    reference converter does (src/models/falcon-h1.cpp)."""
    from transformers import FalconH1Config, FalconH1ForCausalLM

    cfg = FalconH1Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, mamba_d_ssm=32, mamba_n_heads=4, mamba_d_head=8,
        mamba_n_groups=1, mamba_d_state=8, mamba_d_conv=4,
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        attention_in_multiplier=1.5, attention_out_multiplier=0.7,
        key_multiplier=0.6, ssm_in_multiplier=1.2, ssm_out_multiplier=0.9,
        mlp_multipliers=[1.1, 0.8], ssm_multipliers=[1.0, 1.3, 0.9, 1.1, 0.7],
        attn_implementation="eager", use_cache=False,
        architectures=["FalconH1ForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = FalconH1ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "fh1.gguf")
    hp = model.hparams
    assert hp.is_hybrid and hp.arch == "falcon-h1"
    assert hp.ssm_d_inner == 32 and hp.ssm_dt_rank == 4
    _parity(hf, model, n_tokens=16)

    # stepwise decode (KV + SSM state) == prefill
    ids = np.random.default_rng(3).integers(1, 128, size=12)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    full = np.asarray(ctx.forward(ids.astype(np.int32))[0], np.float32)
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    steps = [np.asarray(ctx2.forward(np.asarray([t], np.int32))[0, -1])
             for t in ids]
    np.testing.assert_allclose(np.stack(steps), full, rtol=1e-3, atol=1e-4)


def test_granitemoe_parity(tmp_path):
    """granitemoe: granite multipliers + fused input_linear expert FFN +
    softmax-over-top-k router (expert_weights_norm)."""
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    cfg = GraniteMoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=3.0, residual_multiplier=0.7,
        attention_multiplier=0.15, logits_scaling=2.0,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["GraniteMoeForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = GraniteMoeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "gmoe.gguf")
    hp = model.hparams
    assert hp.expert_weights_norm and abs(hp.f_residual_scale - 0.7) < 1e-6
    assert "ffn_gate_exps" in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_nemotron_h_consistency(tmp_path):
    """nemotron_h: per layer exactly one of {mamba2, attention, relu²-FFN}
    (hybrid_override_pattern M/*/-, src/models/nemotron-h.cpp). No HF class
    in this transformers build, so the check is structural: stepwise decode
    through the hybrid state must equal prefill, and every layer kind must
    contribute."""
    import jax.numpy as jnp

    from superllama_tpu.gguf import GGUFWriter

    rng = np.random.default_rng(7)
    E, V, H, HKV, D = 32, 96, 4, 2, 8
    di, ds, dc, nh, G = 64, 8, 4, 4, 1
    ff = 48
    pattern = ["M", "*", "-", "M"]
    w = GGUFWriter(str(tmp_path / "nh.gguf"), arch="nemotron_h")
    a = "nemotron_h"
    w.add(f"{a}.context_length", 64)
    w.add(f"{a}.embedding_length", E)
    w.add(f"{a}.block_count", len(pattern))
    w.add(f"{a}.feed_forward_length",
          [ff if t == "-" else 0 for t in pattern])
    w.add(f"{a}.attention.head_count", H)
    w.add(f"{a}.attention.head_count_kv",
          [HKV if t == "*" else 0 for t in pattern])
    w.add(f"{a}.attention.key_length", D)
    w.add(f"{a}.attention.value_length", D)
    w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{a}.vocab_size", V)
    w.add(f"{a}.ssm.conv_kernel", dc)
    w.add(f"{a}.ssm.inner_size", di)
    w.add(f"{a}.ssm.state_size", ds)
    w.add(f"{a}.ssm.time_step_rank", nh)
    w.add(f"{a}.ssm.group_count", G)

    def t(name, *shape):
        w.add_tensor(name, rng.standard_normal(shape).astype(np.float32) * 0.05)

    t("token_embd.weight", V, E)
    t("output_norm.weight", E)
    t("output.weight", V, E)
    conv_dim = di + 2 * G * ds
    for il, kind in enumerate(pattern):
        p = f"blk.{il}."
        t(p + "attn_norm.weight", E)
        if kind == "M":
            t(p + "ssm_in.weight", 2 * di + 2 * G * ds + nh, E)
            t(p + "ssm_conv1d.weight", conv_dim, dc)
            t(p + "ssm_conv1d.bias", conv_dim)
            t(p + "ssm_dt.bias", nh)
            t(p + "ssm_a.weight", nh)
            t(p + "ssm_d.weight", nh)
            t(p + "ssm_norm.weight", di)
            t(p + "ssm_out.weight", E, di)
        elif kind == "*":
            t(p + "attn_q.weight", H * D, E)
            t(p + "attn_k.weight", HKV * D, E)
            t(p + "attn_v.weight", HKV * D, E)
            t(p + "attn_output.weight", E, H * D)
        else:
            t(p + "ffn_up.weight", ff, E)
            t(p + "ffn_down.weight", E, ff)
    w.write()

    model = load_model(str(tmp_path / "nh.gguf"))
    hp = model.hparams
    assert hp.is_hybrid and hp.act == "relu2"
    assert [hp.is_recurrent_layer(i) for i in range(4)] == [True, False,
                                                            False, True]
    ids = rng.integers(1, V, size=10).astype(np.int32)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    full = np.asarray(ctx.forward(ids)[0], np.float32)
    assert np.isfinite(full).all()
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    steps = [np.asarray(ctx2.forward(np.asarray([x], np.int32))[0, -1])
             for x in ids]
    np.testing.assert_allclose(np.stack(steps), full, rtol=1e-3, atol=1e-4)


def test_arcee_parity(tmp_path):
    """arcee (AFM): llama attention + gateless relu² FFN
    (src/models/arcee.cpp:95)."""
    from transformers import ArceeConfig, ArceeForCausalLM

    cfg = ArceeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        hidden_act="relu2", max_position_embeddings=64,
        attn_implementation="eager", architectures=["ArceeForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = ArceeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "arcee.gguf")
    assert model.hparams.act == "relu2"
    assert "ffn_gate" not in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_glm4moe_parity(tmp_path):
    """glm4moe (GLM-4.5): partial NEOX rope, sigmoid DeepSeek-V3-style
    routing with selection bias, leading dense layer, shared expert
    (src/models/glm4-moe.cpp)."""
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    cfg = Glm4MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, n_routed_experts=8, num_experts_per_tok=2,
        n_shared_experts=1, moe_intermediate_size=16,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=1.5, norm_topk_prob=True, use_qk_norm=True,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["Glm4MoeForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = Glm4MoeForCausalLM(cfg).eval()
    with torch.no_grad():
        for l in hf.model.layers[1:]:
            l.mlp.gate.e_score_correction_bias.uniform_(-0.3, 0.3)
    model = _convert_and_load(hf, cfg, tmp_path / "glm4moe.gguf")
    hp = model.hparams
    assert not hp.expert_gating_softmax and hp.n_layer_dense_lead == 1
    assert hp.n_expert_groups == 2 and hp.n_rot == 4
    assert "exp_probs_b" in model.params["layers"][1]
    _parity(hf, model, n_tokens=16)


def test_dots1_parity(tmp_path):
    """dots1: q/k head norms + sigmoid grouped routing + shared expert
    (src/models/dots1.cpp)."""
    from transformers import Dots1Config, Dots1ForCausalLM

    cfg = Dots1Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        moe_intermediate_size=16, first_k_dense_replace=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.0,
        norm_topk_prob=True, max_position_embeddings=64,
        attn_implementation="eager", architectures=["Dots1ForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = Dots1ForCausalLM(cfg).eval()
    with torch.no_grad():
        for l in hf.model.layers[1:]:
            l.mlp.gate.e_score_correction_bias.uniform_(-0.3, 0.3)
    model = _convert_and_load(hf, cfg, tmp_path / "dots1.gguf")
    hp = model.hparams
    assert not hp.expert_gating_softmax
    assert "attn_q_norm" in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_ernie45_moe_parity(tmp_path):
    """ernie4_5-moe: softmax routing with the moe_statics selection bias,
    renormalized top-k, wide fused shared expert, interleaved (NORM) rope
    (src/models/ernie4-5-moe.cpp)."""
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    cfg = Ernie4_5_MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        moe_num_experts=4, moe_k=2, moe_intermediate_size=16,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["Ernie4_5_MoeForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0, use_bias=False,
    )
    hf = Ernie4_5_MoeForCausalLM(cfg).eval()
    with torch.no_grad():
        hf.model.layers[1].mlp.moe_statics.e_score_correction_bias.uniform_(
            -0.3, 0.3)
    model = _convert_and_load(hf, cfg, tmp_path / "ernie_moe.gguf")
    hp = model.hparams
    assert hp.expert_gating_softmax and hp.expert_weights_norm
    assert hp.n_layer_dense_lead == 1
    assert "exp_probs_b" in model.params["layers"][1]
    _parity(hf, model, n_tokens=16)


def test_hunyuan_moe_parity(tmp_path):
    """hunyuan-moe: q/k layernorms, softmax top-k (renormalized), shared
    expert via shared_mlp (src/models/hunyuan-moe.cpp)."""
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    cfg = HunYuanMoEV1Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_experts=4, moe_topk=2, num_shared_expert=1,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["HunYuanMoEV1ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = HunYuanMoEV1ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "hy_moe.gguf")
    hp = model.hparams
    assert hp.expert_weights_norm and hp.n_expert == 4
    assert "ffn_up_shexp" in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_apertus_parity(tmp_path):
    """apertus: qk norms + gateless xIELU FFN with per-layer raw (log-space)
    activation params carried as KV arrays (src/models/apertus.cpp,
    ggml_xielu softplus-at-build semantics)."""
    from transformers import ApertusConfig, ApertusForCausalLM

    torch.manual_seed(11)  # local seed: immune to cross-module import order
    cfg = ApertusConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["ApertusForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = ApertusForCausalLM(cfg).eval()
    with torch.no_grad():  # make per-layer params distinct + load-bearing
        for i, l in enumerate(hf.model.layers):
            l.mlp.act_fn.alpha_p += 0.3 * (i + 1)
            l.mlp.act_fn.alpha_n -= 0.2 * (i + 1)
    model = _convert_and_load(hf, cfg, tmp_path / "apertus.gguf")
    assert "xielu" in model.params["layers"][0]
    assert "attn_q_norm" in model.params["layers"][0]
    _parity(hf, model, n_tokens=16)


def test_olmo3_parity(tmp_path):
    """olmo3 rides the olmo2 graph (post-norms, qk norms) + an explicit
    per-layer sliding-window boolean pattern (every 4th layer full)."""
    from transformers import Olmo3Config, Olmo3ForCausalLM

    torch.manual_seed(12)
    cfg = Olmo3Config(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=8,
        layer_types=["sliding_attention", "sliding_attention",
                     "sliding_attention", "full_attention"],
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["Olmo3ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = Olmo3ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "olmo3.gguf")
    hp = model.hparams
    assert hp.arch == "olmo2" and hp.swa_window == 8
    assert [hp.is_swa_layer(i) for i in range(4)] == [True, True, True, False]
    _parity(hf, model, n_tokens=24)


def test_bitnet_parity(tmp_path):
    """bitnet-b1.58: RMS sub-norms before the attention out-projection and
    the FFN down-projection (src/models/bitnet.cpp:55,82); tied embeddings;
    the bf16 HF checkpoint carries plain linear weights (the ternary .scale
    tensors are folded at load when present)."""
    from transformers import BitNetConfig, BitNetForCausalLM

    torch.manual_seed(13)
    cfg = BitNetConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, attn_implementation="eager",
        architectures=["BitNetForCausalLM"], tie_word_embeddings=True,
        pad_token_id=0,
    )
    hf = BitNetForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "bitnet.gguf")
    layer = model.params["layers"][0]
    assert "attn_sub_norm" in layer and "ffn_sub_norm" in layer
    assert model.params.get("output") is None  # tied head
    _parity(hf, model, n_tokens=16)


def test_llama31_rope_freqs_parity(tmp_path):
    """Llama-3.1 rope scaling ("llama3" wavelength-banded freq factors →
    rope_freqs.weight tensor, applied as ggml_rope_ext freq_factors)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=50000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64},
        attn_implementation="eager", architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "l31.gguf")
    assert model.params.get("rope_freqs") is not None
    assert (np.asarray(model.params["rope_freqs"]) > 1.0).any()  # low-freq band scaled
    _parity(hf, model, n_tokens=48)


def test_gemma3n_shared_kv_tail(tmp_path):
    """gemma3n layers >= n_layer_kv_from_start (20) compute Q only and
    attend the KV cache of layer 18 (swa) / 19 (full)
    (llama-model.cpp layer_reuse_cb). Structural check on a 22-layer tiny
    model: stepwise decode through the iSWA cache must equal prefill."""
    import jax.numpy as jnp

    from superllama_tpu.gguf import GGUFWriter

    rng = np.random.default_rng(23)
    E, V, H, HKV, D, F, L = 32, 96, 2, 1, 16, 48, 22
    EA, A, RANK = 16, 4, 8
    a = "gemma3n"
    w = GGUFWriter(str(tmp_path / "g3n.gguf"), arch=a)
    w.add(f"{a}.context_length", 64)
    w.add(f"{a}.embedding_length", E)
    w.add(f"{a}.block_count", L)
    w.add(f"{a}.feed_forward_length", F)
    w.add(f"{a}.attention.head_count", H)
    w.add(f"{a}.attention.head_count_kv", HKV)
    w.add(f"{a}.attention.key_length", D)
    w.add(f"{a}.attention.value_length", D)
    w.add(f"{a}.attention.layer_norm_rms_epsilon", 1e-5)
    w.add(f"{a}.attention.sliding_window", 8)
    w.add(f"{a}.rope.freq_base", 10000.0)
    w.add(f"{a}.vocab_size", V)
    w.add(f"{a}.altup.num_inputs", A)
    w.add(f"{a}.altup.active_idx", 0)
    w.add(f"{a}.embedding_length_per_layer_input", EA)

    def t(name, *shape, s=0.05):
        w.add_tensor(name, rng.standard_normal(shape).astype(np.float32) * s)

    t("token_embd.weight", V, E, s=0.02)
    t("output_norm.weight", E)
    t("per_layer_token_embd.weight", V, EA * L)
    t("per_layer_model_proj.weight", EA * L, E)
    t("per_layer_proj_norm.weight", EA)
    t("altup_proj.weight", A - 1, E, E)
    t("altup_unembd_proj.weight", A - 1, E, E)
    for i in range(L):
        b = f"blk.{i}."
        for nm in ("attn_norm", "post_attention_norm", "ffn_norm",
                   "post_ffw_norm", "post_norm", "altup_router_norm",
                   "laurel_post_norm"):
            t(b + nm + ".weight", E)
        t(b + "attn_q.weight", H * D, E)
        t(b + "attn_k.weight", HKV * D, E)
        t(b + "attn_v.weight", HKV * D, E)
        t(b + "attn_output.weight", E, H * D)
        t(b + "attn_q_norm.weight", D)
        t(b + "attn_k_norm.weight", D)
        t(b + "ffn_gate.weight", F, E)
        t(b + "ffn_up.weight", F, E)
        t(b + "ffn_down.weight", E, F)
        t(b + "inp_gate.weight", EA, E)
        t(b + "proj.weight", E, EA)
        t(b + "altup_correct_coef.weight", A, A, s=0.2)
        t(b + "altup_correct_scale.weight", E, s=0.3)
        t(b + "altup_predict_coef.weight", A * A, A, s=0.1)
        t(b + "altup_router.weight", A, E)
        t(b + "laurel_l.weight", RANK, E)
        t(b + "laurel_r.weight", E, RANK)
    w.write()

    model = load_model(str(tmp_path / "g3n.gguf"))
    hp = model.hparams
    assert hp.extra["gemma3n"]["n_layer_kv_from_start"] == 20 and hp.n_layer == 22
    ids = rng.integers(1, V, size=12).astype(np.int32)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    full = np.asarray(ctx.forward(ids)[0], np.float32)
    assert np.isfinite(full).all()
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    steps = [np.asarray(ctx2.forward(np.asarray([x], np.int32))[0, -1])
             for x in ids]
    np.testing.assert_allclose(np.stack(steps), full, rtol=2e-3, atol=1e-4)


def test_qwen3next_parity(tmp_path):
    """Qwen3-Next: gated delta net (3/4 layers) + gated full attention, MoE
    with sigmoid-gated shared expert; HF parity (src/models/qwen3next.cpp;
    transformers torch_recurrent_gated_delta_rule)."""
    from transformers import Qwen3NextConfig
    from transformers.models.qwen3_next import Qwen3NextForCausalLM

    torch.manual_seed(31)
    cfg = Qwen3NextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, linear_conv_kernel_dim=4, linear_key_head_dim=16,
        linear_value_head_dim=16, linear_num_key_heads=2,
        linear_num_value_heads=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=48, shared_expert_intermediate_size=48,
        decoder_sparse_step=1, max_position_embeddings=128,
        attn_implementation="eager", architectures=["Qwen3NextForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = Qwen3NextForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "q3n.gguf")
    hp = model.hparams
    assert hp.is_hybrid
    assert [hp.is_recurrent_layer(i) for i in range(4)] == [True, True,
                                                            True, False]
    # HF's prefill path runs torch_chunk_gated_delta_rule (padded 64-chunk
    # parallel scan); our lax.scan recurrence matches HF's OWN recurrent
    # kernel to 4e-8 (same operator, different reduction order), so logits
    # differ from the chunked path by ~1e-4/layer of f32 reassociation —
    # gate at 5e-3 relative instead of the usual 5e-4
    V = hp.n_vocab
    ids = np.random.default_rng(0).integers(1, V, size=(1, 16))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits[0].float().numpy()
    got = np.asarray(Context(model, n_batch=1, n_ctx=64,
                             kv_dtype=np.float32).forward(
        ids[0].astype(np.int32))[0], np.float32)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 5e-3, f"relative max err {err}"
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.95

    # stepwise decode through the hybrid state must match prefill
    ids = np.random.default_rng(4).integers(1, 256, size=10).astype(np.int32)
    ctx = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    full = np.asarray(ctx.forward(ids)[0], np.float32)
    ctx2 = Context(model, n_batch=1, n_ctx=32, kv_dtype=np.float32)
    steps = [np.asarray(ctx2.forward(np.asarray([x], np.int32))[0, -1])
             for x in ids]
    np.testing.assert_allclose(np.stack(steps), full, rtol=2e-3, atol=1e-4)


def test_gemma3n_hf_parity(tmp_path):
    """Gemma3n vs HF transformers: AltUp index order, LAUREL, per-layer
    inputs, per-layer activation sparsity, shared-KV tail from the
    converter's shared_kv_layers KV."""
    from transformers import Gemma3nTextConfig
    from transformers.models.gemma3n import Gemma3nForCausalLM

    torch.manual_seed(77)
    cfg = Gemma3nTextConfig(
        vocab_size=256, vocab_size_per_layer_input=256, hidden_size=64,
        hidden_size_per_layer_input=16, intermediate_size=128,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, altup_num_inputs=4, altup_active_idx=0, laurel_rank=8,
        num_kv_shared_layers=2, sliding_window=8,
        layer_types=["sliding_attention"] * 4 + ["full_attention"]
        + ["sliding_attention"] * 2,
        activation_sparsity_pattern=[0.95] * 2 + [0.0] * 5,
        max_position_embeddings=128, attn_implementation="eager",
        rope_theta=10000.0, rope_local_base_freq=10000.0,
        architectures=["Gemma3nForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = Gemma3nForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "g3n.gguf")
    hp = model.hparams
    assert hp.extra["gemma3n"]["n_layer_kv_from_start"] == 5
    assert hp.extra["gemma3n"]["sparsity"][0] > 1.6
    assert hp.extra["gemma3n"]["sparsity"][2] == 0.0
    assert [hp.is_swa_layer(i) for i in range(7)] == [True] * 4 + [False,
                                                                   True, True]
    _parity(hf, model, n_tokens=12)


def test_gptbigcode_parity(tmp_path):
    """GPTBigCode/StarCoder: fused MQA c_attn, learned positions, biased
    LayerNorms (models/starcoder.cpp counterpart)."""
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(31)
    cfg = GPTBigCodeConfig(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_inner=128,
        n_positions=128, multi_query=True, attn_implementation="eager",
        architectures=["GPTBigCodeForCausalLM"], tie_word_embeddings=True,
    )
    hf = GPTBigCodeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "sc.gguf")
    assert model.hparams.n_head_kv == 1
    _parity(hf, model, n_tokens=16)


def test_lfm2_hf_parity(tmp_path):
    """LFM2 hybrid shortconv/attention stack via the HF converter (lfm2.cpp
    counterpart; per-layer head_count_kv 0 = conv layer)."""
    from transformers import Lfm2Config, Lfm2ForCausalLM

    torch.manual_seed(32)
    cfg = Lfm2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, max_position_embeddings=128,
        layer_types=["conv", "conv", "full_attention", "conv"],
        architectures=["Lfm2ForCausalLM"], tie_word_embeddings=False,
    )
    hf = Lfm2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "lfm2.gguf")
    assert model.hparams.n_head_kv_arr[:2] == [0, 0]
    _parity(hf, model, n_tokens=16)


def test_jamba_hf_parity(tmp_path):
    """Jamba hybrid mamba/attention + periodic MoE via the HF converter
    (models/jamba.cpp counterpart; ssm_a stored as -exp(A_log))."""
    from transformers import JambaConfig, JambaForCausalLM

    torch.manual_seed(33)
    cfg = JambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2,
        expert_layer_period=2, expert_layer_offset=1,
        attn_layer_period=4, attn_layer_offset=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2, mamba_dt_rank=8,
        max_position_embeddings=128, use_mamba_kernels=False,
        architectures=["JambaForCausalLM"], tie_word_embeddings=False,
    )
    hf = JambaForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "jamba.gguf")
    _parity(hf, model, n_tokens=16)


def test_phimoe_convert_smoke(tmp_path):
    """Phimoe converter: tensors load and the forward runs. NOT a logits
    parity test — ggml builds phimoe with RMS norms (models/phi3.cpp:39)
    while HF uses true LayerNorm; we follow ggml (the golden oracle test
    pins those semantics), so HF logits differ by the mean-subtraction."""
    from transformers import PhimoeConfig, PhimoeForCausalLM

    torch.manual_seed(34)
    cfg = PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["PhimoeForCausalLM"], tie_word_embeddings=False,
    )
    hf = PhimoeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "phimoe.gguf")
    ctx = Context(model, n_batch=1, n_ctx=64, kv_dtype=np.float32)
    ids = np.random.default_rng(0).integers(1, 256, size=12).astype(np.int32)
    logits = np.asarray(ctx.forward(ids)[0], np.float32)
    assert np.isfinite(logits).all() and logits.shape[-1] == 256


def test_qwen3vl_text_convert_parity(tmp_path):
    """Qwen3VL conditional-generation checkpoint: the converter strips the
    language_model prefix / drops the vision tower and converts the text
    stack (IMROPE text path rides the zero stream)."""
    from transformers import Qwen3VLConfig
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    torch.manual_seed(35)
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=256,
            rope_scaling={"rope_type": "default", "mrope_section": [3, 3, 2],
                          "mrope_interleaved": True},
            tie_word_embeddings=False),
        vision_config=dict(depth=2, hidden_size=32, num_heads=4,
                           in_channels=3, patch_size=4, temporal_patch_size=1,
                           spatial_merge_size=1, intermediate_size=64,
                           out_hidden_size=64, deepstack_visual_indexes=[0]),
        image_token_id=250, video_token_id=251, vision_start_token_id=249,
        vision_end_token_id=248, attn_implementation="eager",
        architectures=["Qwen3VLForConditionalGeneration"],
    )
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "q3vl.gguf")
    assert model.hparams.extra.get("mrope_sections") == (3, 3, 2)
    _parity(hf, model, n_tokens=12)


def test_falcon_mamba_hf_parity(tmp_path):
    """FalconMamba rides the mamba graph with NON-parametric RMS on the
    dt/B/C selection streams (ssm.dt_b_c_rms KV, llama-model.cpp:1438;
    graph-context-mamba.cpp:94)."""
    from transformers import FalconMambaConfig, FalconMambaForCausalLM

    torch.manual_seed(36)
    cfg = FalconMambaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, state_size=8, conv_kernel=4, time_step_rank=8,
        use_cache=False, architectures=["FalconMambaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = FalconMambaForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "fm.gguf")
    assert model.hparams.extra.get("ssm_dt_b_c_rms") is True
    _parity(hf, model, n_tokens=16)
