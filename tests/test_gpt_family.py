"""Forward-pass parity vs HF transformers for the classic GPT family:
LayerNorm (+biases), learned positions, fused QKV layouts, parallel
residual, partial rotary. Counterparts of src/models/{gpt2,gptneox,falcon,
starcoder2,phi2,command-r,olmo2,stablelm}.cpp validated against upstream."""

import numpy as np
import pytest
import torch

from test_arch_family import _convert_and_load, _parity

torch.manual_seed(7)


def test_gpt2_parity(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        vocab_size=256, n_embd=64, n_layer=3, n_head=4, n_positions=128,
        attn_implementation="eager", architectures=["GPT2LMHeadModel"],
    )
    hf = GPT2LMHeadModel(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "gpt2.gguf")
    hp = model.hparams
    assert hp.norm_type == "ln" and hp.rope_type == -1
    assert model.params.get("position_embd") is not None
    _parity(hf, model)


def test_gptneox_parity(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=128, use_parallel_residual=True,
        attn_implementation="eager", architectures=["GPTNeoXForCausalLM"],
    )
    hf = GPTNeoXForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "neox.gguf")
    hp = model.hparams
    assert hp.parallel_residual and hp.norm_type == "ln" and hp.n_rot == 8
    _parity(hf, model)


def test_gptneox_sequential_residual(tmp_path):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=1.0,
        max_position_embeddings=64, use_parallel_residual=False,
        attn_implementation="eager", architectures=["GPTNeoXForCausalLM"],
    )
    hf = GPTNeoXForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "neox2.gguf")
    assert not model.hparams.parallel_residual
    _parity(hf, model, n_tokens=12)


def test_falcon_mqa_parity(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["FalconForCausalLM"],
    )
    hf = FalconForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "falcon.gguf")
    hp = model.hparams
    assert hp.n_head_kv == 1 and hp.parallel_residual
    assert "ffn_norm" not in model.params["layers"][0]   # shared norm
    _parity(hf, model)


def test_falcon_new_arch_parity(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, multi_query=False,
        parallel_attn=True, new_decoder_architecture=True, bias=False,
        alibi=False, max_position_embeddings=64,
        attn_implementation="eager", architectures=["FalconForCausalLM"],
    )
    hf = FalconForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "falcon40.gguf")
    assert model.hparams.n_head_kv == 2
    assert "ffn_norm" in model.params["layers"][0]       # ln_attn + ln_mlp
    _parity(hf, model, n_tokens=12)


def test_starcoder2_parity(tmp_path):
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    cfg = Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, max_position_embeddings=128, sliding_window=None,
        attn_implementation="eager", architectures=["Starcoder2ForCausalLM"],
        tie_word_embeddings=True,
    )
    hf = Starcoder2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "sc2.gguf")
    assert model.hparams.norm_type == "ln"
    assert "bq" in model.params["layers"][0]
    _parity(hf, model)


def test_phi2_parity(tmp_path):
    from transformers import PhiConfig, PhiForCausalLM

    cfg = PhiConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        attn_implementation="eager", architectures=["PhiForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = PhiForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "phi2.gguf")
    hp = model.hparams
    assert hp.parallel_residual and hp.n_rot == 8
    assert model.params.get("output_b") is not None      # lm-head bias
    _parity(hf, model)


def test_cohere_parity(tmp_path):
    from transformers import CohereConfig, CohereForCausalLM

    cfg = CohereConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        logit_scale=0.25, use_qk_norm=False, max_position_embeddings=128,
        attn_implementation="eager", architectures=["CohereForCausalLM"],
        tie_word_embeddings=True,
    )
    hf = CohereForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "cohere.gguf")
    hp = model.hparams
    assert hp.logit_scale == 0.25 and hp.parallel_residual
    _parity(hf, model)


def test_olmo2_parity(tmp_path):
    from transformers import Olmo2Config, Olmo2ForCausalLM

    cfg = Olmo2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Olmo2ForCausalLM"], tie_word_embeddings=False,
    )
    hf = Olmo2ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "olmo2.gguf")
    layer0 = model.params["layers"][0]
    assert "attn_norm" not in layer0 and "attn_post_norm" in layer0
    _parity(hf, model)


def test_bloom_parity(tmp_path):
    from transformers import BloomConfig, BloomForCausalLM

    cfg = BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=3, n_head=4,
        attn_implementation="eager", architectures=["BloomForCausalLM"],
    )
    hf = BloomForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "bloom.gguf")
    hp = model.hparams
    assert hp.alibi and hp.norm_type == "ln" and hp.rope_type == -1
    assert model.params.get("token_embd_norm") is not None
    _parity(hf, model)


def test_mpt_parity(tmp_path):
    from transformers import MptConfig, MptForCausalLM

    cfg = MptConfig(
        vocab_size=256, d_model=64, n_layers=3, n_heads=4,
        attn_implementation="eager", architectures=["MptForCausalLM"],
    )
    hf = MptForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "mpt.gguf")
    hp = model.hparams
    assert hp.alibi and hp.max_alibi_bias == 8.0
    _parity(hf, model)


def test_stablelm_parity(tmp_path):
    from transformers import StableLmConfig, StableLmForCausalLM

    cfg = StableLmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.25, max_position_embeddings=128,
        attn_implementation="eager", architectures=["StableLmForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = StableLmForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "stablelm.gguf")
    hp = model.hparams
    assert hp.norm_type == "ln" and hp.n_rot == 4
    _parity(hf, model)


def test_qwen2moe_parity(tmp_path):
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg = Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=False, max_position_embeddings=128,
        attn_implementation="eager", architectures=["Qwen2MoeForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = Qwen2MoeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "q2moe.gguf")
    l0 = model.params["layers"][0]
    assert "ffn_gate_exps" in l0 and "ffn_gate_inp_shexp" in l0
    assert not model.hparams.expert_weights_norm
    _parity(hf, model)


def test_qwen3moe_parity(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Qwen3MoeForCausalLM"], tie_word_embeddings=False,
    )
    hf = Qwen3MoeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "q3moe.gguf")
    assert "attn_q_norm" in model.params["layers"][0]
    assert model.hparams.expert_weights_norm
    _parity(hf, model)


def test_glm4_parity(tmp_path):
    from transformers import Glm4Config, Glm4ForCausalLM

    cfg = Glm4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, head_dim=16, attention_bias=True,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Glm4ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0, eos_token_id=2, bos_token_id=1,
    )
    hf = Glm4ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "glm4.gguf")
    l0 = model.params["layers"][0]
    assert "attn_post_norm" in l0 and "ffn_post_norm" in l0  # sandwich norms
    _parity(hf, model)


def test_nemotron_parity(tmp_path):
    from transformers import NemotronConfig, NemotronForCausalLM

    cfg = NemotronConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=128,
        attn_implementation="eager", architectures=["NemotronForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = NemotronForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "nemo.gguf")
    hp = model.hparams
    assert hp.norm_type == "ln" and hp.act == "relu2"
    assert "ffn_gate" not in model.params["layers"][0]
    _parity(hf, model)


def test_dbrx_parity(tmp_path):
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=128, vocab_size=256,
        attn_config={"kv_n_heads": 2, "clip_qkv": 8.0, "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2},
        attn_implementation="eager", architectures=["DbrxForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = DbrxForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "dbrx.gguf")
    hp = model.hparams
    assert hp.f_clamp_kqv == 8.0 and hp.n_expert == 4
    assert "ffn_gate_exps" in model.params["layers"][0]
    _parity(hf, model)


def test_granite_parity(tmp_path):
    """Granite: llama + four scalar multipliers (embedding/residual/
    attention/logits) threaded through hparams."""
    from transformers import GraniteConfig, GraniteForCausalLM

    cfg = GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["GraniteForCausalLM"], tie_word_embeddings=False,
    )
    hf = GraniteForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "granite.gguf")
    hp = model.hparams
    assert hp.f_embedding_scale == 6.0 and hp.f_residual_scale == 0.5
    assert abs(hp.f_attn_scale - 0.1) < 1e-6 and hp.logit_scale == 0.25
    _parity(hf, model)


def test_olmoe_parity(tmp_path):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    cfg = OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["OlmoeForCausalLM"], tie_word_embeddings=False,
    )
    hf = OlmoeForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "olmoe.gguf")
    l0 = model.params["layers"][0]
    assert "ffn_gate_exps" in l0 and "attn_q_norm" in l0
    _parity(hf, model)


def test_seed_oss_parity(tmp_path):
    from transformers import SeedOssConfig, SeedOssForCausalLM

    cfg = SeedOssConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        attn_implementation="eager", architectures=["SeedOssForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = SeedOssForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "seed.gguf")
    _parity(hf, model)


def test_ernie45_parity(tmp_path):
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    cfg = Ernie4_5Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Ernie4_5ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = Ernie4_5ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "ernie.gguf")
    assert model.hparams.rope_type == 0
    _parity(hf, model)


def test_smollm3_parity(tmp_path):
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    cfg = SmolLM3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, no_rope_layers=None,
        attn_implementation="eager", architectures=["SmolLM3ForCausalLM"],
        tie_word_embeddings=False, pad_token_id=0,
    )
    hf = SmolLM3ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "smol.gguf")
    _parity(hf, model)
def test_hunyuan_dense(tmp_path):
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM
    torch.manual_seed(101)
    cfg = HunYuanDenseV1Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, attn_implementation="eager",
        architectures=["HunYuanDenseV1ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0)
    hf = HunYuanDenseV1ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "hy.gguf")
    _parity(hf, model, n_tokens=12)

def test_exaone4(tmp_path):
    from transformers import Exaone4Config, Exaone4ForCausalLM
    torch.manual_seed(102)
    cfg = Exaone4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
        architectures=["Exaone4ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0, sliding_window=None,
        layer_types=["full_attention"] * 2)
    hf = Exaone4ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "ex4.gguf")
    _parity(hf, model, n_tokens=12)


def test_llama4_parity(tmp_path):
    """Llama4 text: sigmoid top-1 router with input scaling + shared expert,
    L2 qk-norm after rope, NoPE every 4th layer with temperature tuning,
    chunked attention mask."""
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    torch.manual_seed(111)
    cfg = Llama4TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=1, use_qk_norm=True,
        attention_chunk_size=8, attn_temperature_tuning=True,
        floor_scale=8, attn_scale=0.1, max_position_embeddings=256,
        rope_scaling=None, attn_implementation="eager",
        architectures=["Llama4ForCausalLM"], tie_word_embeddings=False,
        pad_token_id=0,
    )
    hf = Llama4ForCausalLM(cfg).eval()
    model = _convert_and_load(hf, cfg, tmp_path / "l4.gguf")
    hp = model.hparams
    assert not hp.expert_gating_softmax
    assert hp.extra["llama4"]["chunk"] == 8
    assert hp.n_no_rope_layer_step == 4
    l0 = model.params["layers"][0]
    assert "ffn_gate_exps" in l0 and "ffn_up_shexp" in l0
    _parity(hf, model, n_tokens=24)
