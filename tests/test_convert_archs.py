"""Converter ↔ reference-spec parity for HF classes with no installed
transformers implementation.

Each case builds an HF-named state dict that is the exact INVERSE of the
tiny-model spec in tests/ref_arch_specs.py (those spec GGUFs are themselves
pinned token-level to the compiled reference by tests/test_arch_golden.py).
Running tools/convert_hf.convert_state_dict on the HF dict must reproduce
the spec GGUF: identical tensor sets with bit-equal F32 payloads, every
spec metadata key present and equal, and identical runtime HParams after
load_model. This checks the same mapping the reference's
convert_hf_to_gguf.py classes implement (class list convert_hf_to_gguf.py;
name tables gguf-py/gguf/tensor_mapping.py) without needing
trust_remote_code checkpoints."""

import dataclasses
from types import SimpleNamespace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.tools.convert_hf import convert_state_dict

from ref_arch_specs import ENC_SPECS, SPECS, build_gguf, tokenizer_fields


def unpermute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Inverse of convert_hf.permute_qk: GGUF adjacent-pair → HF interleaved."""
    out_dim = w.shape[0]
    return (w.reshape(n_head, out_dim // n_head // 2, 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def _llama_style_hf(t: dict, L: int, H: int, HKV: int, permute: bool,
                    ln_bias: bool = False) -> dict:
    """Inverse of the converter's generic model.layers.* loop."""
    sd = {"model.embed_tokens.weight": t["token_embd.weight"]}
    if "output_norm.weight" in t:
        sd["model.norm.weight"] = t["output_norm.weight"]
    if "output_norm.bias" in t:
        sd["model.norm.bias"] = t["output_norm.bias"]
    if "output.weight" in t:
        sd["lm_head.weight"] = t["output.weight"]
    for i in range(L):
        b, hf = f"blk.{i}.", f"model.layers.{i}."
        q, k = t[b + "attn_q.weight"], t[b + "attn_k.weight"]
        if permute:
            q, k = unpermute(q, H), unpermute(k, HKV)
        sd[hf + "self_attn.q_proj.weight"] = q
        sd[hf + "self_attn.k_proj.weight"] = k
        sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
        sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
        for gg, name in (("attn_norm", "input_layernorm"),
                         ("ffn_norm", "post_attention_layernorm")):
            if b + gg + ".weight" in t:
                sd[hf + name + ".weight"] = t[b + gg + ".weight"]
            if ln_bias and b + gg + ".bias" in t:
                sd[hf + name + ".bias"] = t[b + gg + ".bias"]
        for gg, name in (("ffn_gate", "mlp.gate_proj"),
                         ("ffn_up", "mlp.up_proj"),
                         ("ffn_down", "mlp.down_proj")):
            if b + gg + ".weight" in t:
                sd[hf + name + ".weight"] = t[b + gg + ".weight"]
        for part in ("q", "k", "v"):
            if b + f"attn_{part}.bias" in t:
                sd[hf + f"self_attn.{part}_proj.bias"] = t[b + f"attn_{part}.bias"]
    return sd


def _cfg(cls_name: str, **kw) -> SimpleNamespace:
    base = dict(architectures=[cls_name], max_position_embeddings=512,
                rope_theta=10000.0, vocab_size=32000,
                tie_word_embeddings=False, name_or_path="tiny")
    base.update(kw)
    return SimpleNamespace(**base)


# Each case: spec name -> (HF class name, config builder, hf state-dict
# builder taking the spec tensors).

def case_orion():
    cfg = _cfg("OrionForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=4, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5)
    return cfg, lambda t: _llama_style_hf(t, 2, 4, 4, permute=False,
                                          ln_bias=True)


def case_xverse():
    cfg = _cfg("XverseForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=4, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5)
    return cfg, lambda t: _llama_style_hf(t, 2, 4, 4, permute=True)


def case_baichuan():
    cfg = _cfg("BaichuanForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=4, intermediate_size=128,
               num_hidden_layers=32, rms_norm_eps=1e-5)

    def build(t):
        sd = _llama_style_hf(t, 32, 4, 4, permute=True)
        for i in range(32):
            hf = f"model.layers.{i}."
            sd[hf + "self_attn.W_pack.weight"] = np.concatenate([
                sd.pop(hf + "self_attn.q_proj.weight"),
                sd.pop(hf + "self_attn.k_proj.weight"),
                sd.pop(hf + "self_attn.v_proj.weight")])
        return sd
    return cfg, build


def case_internlm2():
    E, H, HKV, D = 64, 4, 2, 16
    cfg = _cfg("InternLM2ForCausalLM", hidden_size=E, num_attention_heads=H,
               num_key_value_heads=HKV, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = {"model.tok_embeddings.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "output.weight": t["output.weight"]}
        qpk = H // HKV
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            q = unpermute(t[b + "attn_q.weight"], H).reshape(HKV, qpk, D, E)
            k = unpermute(t[b + "attn_k.weight"], HKV).reshape(HKV, 1, D, E)
            v = t[b + "attn_v.weight"].reshape(HKV, 1, D, E)
            sd[hf + "attention.wqkv.weight"] = np.concatenate(
                [q, k, v], axis=1).reshape(-1, E)
            sd[hf + "attention.wo.weight"] = t[b + "attn_output.weight"]
            sd[hf + "attention_norm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "ffn_norm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "feed_forward.w1.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "feed_forward.w3.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "feed_forward.w2.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_exaone():
    cfg = _cfg("ExaoneForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_layers=2, rms_norm_eps=1e-5)  # exaone: num_layers

    def build(t):
        sd = {"transformer.wte.weight": t["token_embd.weight"],
              "transformer.ln_f.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.h.{i}."
            sd[hf + "ln_1.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "attn.attention.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "attn.attention.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "attn.attention.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "attn.attention.out_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "ln_2.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.c_fc_0.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.c_fc_1.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.c_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_minicpm():
    # defaults: embedding_scale 12, residual 1.4/sqrt(L), logit 256/E
    cfg = _cfg("MiniCPMForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5, scale_emb=12,
               scale_depth=1.4, dim_model_base=16, tie_word_embeddings=True)
    return cfg, lambda t: _llama_style_hf(t, 2, 4, 2, permute=True)


def case_olmo():
    cfg = _cfg("OLMoForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=4, intermediate_size=128,
               num_hidden_layers=2, clip_qkv=8.0)
    return cfg, lambda t: _llama_style_hf(t, 2, 4, 4, permute=True)


def case_deepseek():
    NE = 4
    cfg = _cfg("DeepseekForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=3, rms_norm_eps=1e-5, n_routed_experts=NE,
               num_experts_per_tok=2, moe_intermediate_size=48,
               n_shared_experts=2, first_k_dense_replace=1)

    def build(t):
        sd = _llama_style_hf(t, 3, 4, 2, permute=True)
        for i in range(1, 3):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            for kind in ("gate", "up", "down"):
                stack = t[b + f"ffn_{kind}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"mlp.experts.{e}.{kind}_proj.weight"] = stack[e]
                sd[hf + f"mlp.shared_experts.{kind}_proj.weight"] = \
                    t[b + f"ffn_{kind}_shexp.weight"]
        return sd
    return cfg, build


def case_qwen():
    cfg = _cfg("QWenLMHeadModel", hidden_size=64, num_attention_heads=4,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = {"transformer.wte.weight": t["token_embd.weight"],
              "transformer.ln_f.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.h.{i}."
            sd[hf + "ln_1.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "attn.c_attn.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "attn.c_attn.bias"] = t[b + "attn_qkv.bias"]
            sd[hf + "attn.c_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "ln_2.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.w2.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.w1.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.c_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_jais():
    cfg = _cfg("JAISLMHeadModel", n_embd=64, n_head=4, n_layer=2,
               n_positions=512, n_inner=128, layer_norm_epsilon=1e-5,
               mup_embeddings_scale=1.0, mup_output_alpha=1.0,
               mup_width_scale=1.0, activation_function="swiglu",
               position_embedding_type="alibi")

    def build(t):
        sd = {"transformer.wte.weight": t["token_embd.weight"],
              "transformer.ln_f.weight": t["output_norm.weight"],
              "transformer.ln_f.bias": t["output_norm.bias"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.h.{i}."
            sd[hf + "ln_1.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "ln_1.bias"] = t[b + "attn_norm.bias"]
            sd[hf + "attn.c_attn.weight"] = t[b + "attn_qkv.weight"].T
            sd[hf + "attn.c_attn.bias"] = t[b + "attn_qkv.bias"]
            sd[hf + "attn.c_proj.weight"] = t[b + "attn_output.weight"].T
            sd[hf + "attn.c_proj.bias"] = t[b + "attn_output.bias"]
            sd[hf + "ln_2.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "ln_2.bias"] = t[b + "ffn_norm.bias"]
            sd[hf + "mlp.c_fc2.weight"] = t[b + "ffn_gate.weight"].T
            sd[hf + "mlp.c_fc2.bias"] = t[b + "ffn_gate.bias"]
            sd[hf + "mlp.c_fc.weight"] = t[b + "ffn_up.weight"].T
            sd[hf + "mlp.c_fc.bias"] = t[b + "ffn_up.bias"]
            sd[hf + "mlp.c_proj.weight"] = t[b + "ffn_down.weight"].T
            sd[hf + "mlp.c_proj.bias"] = t[b + "ffn_down.bias"]
        return sd
    return cfg, build


def case_chatglm():
    cfg = _cfg("ChatGLMModel", hidden_size=64, num_attention_heads=4,
               multi_query_group_num=2, num_hidden_layers=2,
               ffn_hidden_size=128, seq_length=512, layernorm_epsilon=1e-5)

    def build(t):
        sd = {"transformer.embedding.word_embeddings.weight":
                  t["token_embd.weight"],
              "transformer.encoder.final_layernorm.weight":
                  t["output_norm.weight"],
              "transformer.output_layer.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.encoder.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attention.query_key_value.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "self_attention.query_key_value.bias"] = t[b + "attn_qkv.bias"]
            sd[hf + "self_attention.dense.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.dense_h_to_4h.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.dense_4h_to_h.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_codeshell():
    cfg = _cfg("CodeShellForCausalLM", n_embd=64, n_head=4, n_layer=2,
               num_query_groups=2, n_positions=512, n_inner=128,
               layer_norm_epsilon=1e-5)

    def build(t):
        sd = {"transformer.wte.weight": t["token_embd.weight"],
              "transformer.ln_f.weight": t["output_norm.weight"],
              "transformer.ln_f.bias": t["output_norm.bias"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.h.{i}."
            sd[hf + "ln_1.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "ln_1.bias"] = t[b + "attn_norm.bias"]
            sd[hf + "attn.c_attn.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "attn.c_attn.bias"] = t[b + "attn_qkv.bias"]
            sd[hf + "attn.c_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "attn.c_proj.bias"] = t[b + "attn_output.bias"]
            sd[hf + "ln_2.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "ln_2.bias"] = t[b + "ffn_norm.bias"]
            sd[hf + "mlp.c_fc.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.c_fc.bias"] = t[b + "ffn_up.bias"]
            sd[hf + "mlp.c_proj.weight"] = t[b + "ffn_down.weight"]
            sd[hf + "mlp.c_proj.bias"] = t[b + "ffn_down.bias"]
        return sd
    return cfg, build


def case_dream():
    cfg = _cfg("DreamModel", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5)
    return cfg, lambda t: _llama_style_hf(t, 2, 4, 2, permute=False)


def _unstack_experts(sd, t, b, hf, NE, kinds=("gate", "up", "down"),
                     suffix="_proj"):
    for kind in kinds:
        stack = t[b + f"ffn_{kind}_exps.weight"]
        for e in range(NE):
            sd[hf + f"mlp.experts.{e}.{kind}{suffix}.weight"] = stack[e]


def case_arctic():
    NE = 4
    cfg = _cfg("ArcticForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=96,
               num_hidden_layers=2, rms_norm_eps=1e-5, num_local_experts=NE,
               num_experts_per_tok=2)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = unpermute(t[b + "attn_q.weight"], 4)
            sd[hf + "self_attn.k_proj.weight"] = unpermute(t[b + "attn_k.weight"], 2)
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "residual_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "residual_mlp.w1.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "residual_mlp.w3.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "residual_mlp.w2.weight"] = t[b + "ffn_down.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm_exps.weight"]
            sd[hf + "block_sparse_moe.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            for hw, gw in (("w1", "gate"), ("w2", "down"), ("w3", "up")):
                stack = t[b + f"ffn_{gw}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"block_sparse_moe.experts.{e}.{hw}.weight"] = stack[e]
        return sd
    return cfg, build


def case_grok():
    NE = 4
    cfg = _cfg("Grok1ForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=96,
               num_hidden_layers=2, rms_norm_eps=1e-5, num_local_experts=NE,
               num_experts_per_tok=2,
               embedding_multiplier_scale=78.38367176906169,
               output_multiplier_scale=0.5773502691896257,
               attn_output_multiplier=0.08838834764831845)

    def build(t):
        sd = {"transformer.in_out_embed.weight": t["token_embd.weight"],
              "transformer.rms_norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.decoder_layer.{i}."
            sd[hf + "rms_norm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "multi_head_attention.query.weight"] = t[b + "attn_q.weight"]
            sd[hf + "multi_head_attention.key.weight"] = t[b + "attn_k.weight"]
            sd[hf + "multi_head_attention.value.weight"] = t[b + "attn_v.weight"]
            sd[hf + "multi_head_attention.linear.weight"] = t[b + "attn_output.weight"]
            sd[hf + "rms_norm_1.weight"] = t[b + "attn_output_norm.weight"]
            sd[hf + "rms_norm_2.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "rms_norm_3.weight"] = t[b + "post_ffw_norm.weight"]
            sd[hf + "router.weight"] = t[b + "ffn_gate_inp.weight"]
            for hw, gw in (("linear", "gate"), ("linear_1", "down"),
                           ("linear_v", "up")):
                stack = t[b + f"ffn_{gw}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"moe.{e}.{hw}.weight"] = stack[e]
        return sd
    return cfg, build


def case_chameleon():
    cfg = _cfg("ChameleonForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5, swin_norm=False)

    def shuffle_row(row):
        # inverse of ChameleonModel._reverse_hf_permute row transform
        d = row.shape[0]
        return row.reshape(d // 2, 2).T.reshape(-1)

    def build(t):
        sd = _llama_style_hf(t, 2, 4, 2, permute=True)
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            for part, n in (("q", 4), ("k", 2)):
                for suf in ("weight", "bias"):
                    arr = t[b + f"attn_{part}_norm.{suf}"]
                    sd[hf + f"self_attn.{part}_norm.{suf}"] = \
                        np.tile(shuffle_row(arr[0]), (n, 1))
        return sd

    def expected(t):
        # the HF checkpoint can only carry ONE norm row; the converter
        # broadcasts it across heads (ChameleonModel._reverse_hf_permute
        # takes data[0]); the spec's per-head-distinct norms are a stricter
        # graph test and are not converter-reachable
        out = dict(t)
        for i in range(2):
            b = f"blk.{i}."
            for part, n in (("q", 4), ("k", 2)):
                for suf in ("weight", "bias"):
                    arr = t[b + f"attn_{part}_norm.{suf}"]
                    out[b + f"attn_{part}_norm.{suf}"] = np.tile(arr[0], (n, 1))
        return out
    return cfg, build, expected


def case_bailingmoe():
    NE = 4
    cfg = _cfg("BailingMoeForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               num_experts=NE, num_experts_per_tok=2,
               moe_intermediate_size=48, num_shared_experts=1,
               norm_topk_prob=True, first_k_dense_replace=0)

    def build(t):
        sd = {"model.word_embeddings.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "attention.query_key_value.weight"] = np.concatenate([
                unpermute(t[b + "attn_q.weight"], 4),
                unpermute(t[b + "attn_k.weight"], 2),
                t[b + "attn_v.weight"]])
            sd[hf + "attention.dense.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            _unstack_experts(sd, t, b, hf, NE)
            for kind in ("gate", "up", "down"):
                sd[hf + f"mlp.shared_experts.{kind}_proj.weight"] = \
                    t[b + f"ffn_{kind}_shexp.weight"]
        return sd
    return cfg, build


def case_bailingmoe2():
    NE = 4
    cfg = _cfg("BailingMoeV2ForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               num_experts=NE, num_experts_per_tok=2,
               moe_intermediate_size=48, num_shared_experts=1,
               norm_topk_prob=True, first_k_dense_replace=1,
               routed_scaling_factor=1.5, scoring_func="sigmoid",
               num_nextn_predict_layers=0)

    def build(t):
        sd = {"model.word_embeddings.weight": t["token_embd.weight"],
              "model.final_layernorm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "attention.query_key_value.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "attention.dense.weight"] = t[b + "attn_output.weight"]
            sd[hf + "attention.query_layernorm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "attention.key_layernorm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            if b + "ffn_gate.weight" in t:      # dense lead
                sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
            else:
                sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
                sd[hf + "mlp.gate.expert_bias"] = t[b + "exp_probs_b.bias"]
                _unstack_experts(sd, t, b, hf, NE)
                for kind in ("gate", "up", "down"):
                    sd[hf + f"mlp.shared_experts.{kind}_proj.weight"] = \
                        t[b + f"ffn_{kind}_shexp.weight"]
        return sd
    return cfg, build


def case_smallthinker():
    NE = 4
    cfg = _cfg("SmallThinkerForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               num_experts=NE, num_experts_per_tok=2,
               moe_ffn_hidden_size=48,
               moe_primary_router_apply_softmax=False)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "block_sparse_moe.primary_router.weight"] = \
                t[b + "ffn_gate_inp.weight"]
            for kind in ("gate", "up", "down"):
                stack = t[b + f"ffn_{kind}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"block_sparse_moe.experts.{e}.{kind}.weight"] = stack[e]
        return sd
    return cfg, build


def case_grovemoe():
    NE = 8
    cfg = _cfg("GroveMoeForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               num_experts=NE, num_experts_per_tok=2,
               moe_intermediate_size=48, moe_chunk_intermediate_size=32,
               experts_per_group=4, expert_group_scale=0.05)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            _unstack_experts(sd, t, b, hf, NE)
            for kind in ("gate", "up", "down"):
                stack = t[b + f"ffn_{kind}_chexps.weight"]
                for e in range(stack.shape[0]):
                    sd[hf + f"mlp.chunk_experts.{e}.{kind}_proj.weight"] = stack[e]
        return sd
    return cfg, build


def case_deci():
    F = 128
    blocks = [
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 1.0, "intermediate_size": F}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0, "intermediate_size": F}},
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": None}},
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0, "intermediate_size": F}},
    ]
    cfg = _cfg("DeciLMForCausalLM", hidden_size=64, num_attention_heads=4,
               intermediate_size=F, num_hidden_layers=4, rms_norm_eps=1e-5,
               block_configs=blocks)
    H_arr, HKV_arr = [4, 0, 4, 4], [0, 0, 2, 2]

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(4):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            if b + "attn_norm.weight" in t:
                sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            if b + "attn_q.weight" in t:
                sd[hf + "self_attn.q_proj.weight"] = \
                    unpermute(t[b + "attn_q.weight"], H_arr[i])
                sd[hf + "self_attn.k_proj.weight"] = \
                    unpermute(t[b + "attn_k.weight"], HKV_arr[i])
                sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            if b + "attn_output.weight" in t:
                sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            if b + "ffn_norm.weight" in t:
                sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
                sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_openelm():
    cfg = _cfg("OpenELMForCausalLM", model_dim=64, head_dim=16,
               num_query_heads=[3, 4], num_kv_heads=[1, 2],
               ffn_multipliers=[1.5, 2.0], ffn_dim_divisor=32,
               max_context_length=512, rms_norm_eps=1e-5,
               rope_freq_constant=10000.0, num_hidden_layers=2)

    def build(t):
        sd = {"transformer.token_embeddings.weight": t["token_embd.weight"],
              "transformer.norm.weight": t["output_norm.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer.layers.{i}."
            sd[hf + "attn_norm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "attn.qkv_proj.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "attn.out_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "ffn_norm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "ffn.proj_1.weight"] = np.concatenate(
                [t[b + "ffn_gate.weight"], t[b + "ffn_up.weight"]])
            sd[hf + "ffn.proj_2.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_plamo():
    cfg = _cfg("PlamoForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=4, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.layers.{i}."
            sd[hf + "norm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_plm():
    cfg = _cfg("PLMForCausalLM", hidden_size=64, num_attention_heads=4,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               kv_lora_rank=32, qk_nope_head_dim=16, qk_rope_head_dim=16,
               v_head_dim=16, tie_word_embeddings=True)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.kv_a_proj_with_mqa.weight"] = t[b + "attn_kv_a_mqa.weight"]
            sd[hf + "self_attn.kv_a_layernorm.weight"] = t[b + "attn_kv_a_norm.weight"]
            sd[hf + "self_attn.kv_b_proj.weight"] = t[b + "attn_kv_b.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_minicpm3():
    cfg = _cfg("MiniCPM3ForCausalLM", hidden_size=64, num_attention_heads=4,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               kv_lora_rank=32, q_lora_rank=32, qk_nope_head_dim=16,
               qk_rope_head_dim=16, v_head_dim=16)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_a_proj.weight"] = t[b + "attn_q_a.weight"]
            sd[hf + "self_attn.q_a_layernorm.weight"] = t[b + "attn_q_a_norm.weight"]
            sd[hf + "self_attn.q_b_proj.weight"] = t[b + "attn_q_b.weight"]
            sd[hf + "self_attn.kv_a_proj_with_mqa.weight"] = t[b + "attn_kv_a_mqa.weight"]
            sd[hf + "self_attn.kv_a_layernorm.weight"] = t[b + "attn_kv_a_norm.weight"]
            sd[hf + "self_attn.kv_b_proj.weight"] = t[b + "attn_kv_b.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_minimax_m2():
    NE = 4
    cfg = _cfg("MiniMaxM2ForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=48, num_hidden_layers=2, rms_norm_eps=1e-5,
               num_local_experts=NE, num_experts_per_tok=2, rotary_dim=8,
               scoring_func="softmax")

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "block_sparse_moe.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            sd[hf + "block_sparse_moe.e_score_correction_bias"] = t[b + "exp_probs_b.bias"]
            for hw, gw in (("w1", "gate"), ("w2", "down"), ("w3", "up")):
                stack = t[b + f"ffn_{gw}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"block_sparse_moe.experts.{e}.{hw}.weight"] = stack[e]
        return sd
    return cfg, build


def case_pangu():
    cfg = _cfg("PanguEmbeddedForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = _llama_style_hf(t, 2, 4, 2, permute=False)
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "self_attn.o_proj.bias"] = t[b + "attn_output.bias"]
        return sd
    return cfg, build


def case_maincoder():
    cfg = _cfg("MaincoderForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = _llama_style_hf(t, 2, 4, 2, permute=False)
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
        return sd
    return cfg, build


def case_llada_moe():
    NE = 4
    cfg = _cfg("LLaDAMoEModelLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5, num_experts=NE,
               num_experts_per_tok=2, expert_intermediate_size=48)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            _unstack_experts(sd, t, b, hf, NE)
        return sd
    return cfg, build


_RWKV6_PERM = [3, 1, 2, 0, 4]  # rkvwg ↔ wkvrg (involution)


def case_rwkv6qwen2():
    E, ED, DD = 64, 16, 16
    cfg = _cfg("RWKV6Qwen2ForCausalLM", hidden_size=E,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5,
               lora_rank_tokenshift=ED, lora_rank_decay=DD)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}.self_attn."
            sd[f"model.layers.{i}.input_layernorm.weight"] = t[b + "attn_norm.weight"]
            w1 = t[b + "time_mix_w1.weight"]            # (5·ED, E) wkvrg
            sd[hf + "time_maa_w1"] = \
                w1.reshape(5, ED, E)[_RWKV6_PERM].reshape(5 * ED, E).T
            w2 = t[b + "time_mix_w2.weight"]            # (5, E, ED) wkvrg
            sd[hf + "time_maa_w2"] = w2[_RWKV6_PERM].transpose(0, 2, 1)
            sd[hf + "time_maa_x"] = t[b + "time_mix_lerp_x.weight"]
            fused = t[b + "time_mix_lerp_fused.weight"]  # (5,1,1,E) w,k,v,r,g
            for j, nm in enumerate("wkvrg"):
                sd[hf + f"time_maa_{nm}"] = fused[j]
            sd[hf + "time_decay"] = t[b + "time_mix_decay.weight"].reshape(1, 1, E)
            sd[hf + "time_decay_w1"] = t[b + "time_mix_decay_w1.weight"].T
            sd[hf + "time_decay_w2"] = t[b + "time_mix_decay_w2.weight"].T
            for hn, gn in (("k_proj", "time_mix_key"),
                           ("v_proj", "time_mix_value"),
                           ("q_proj", "time_mix_receptance")):
                sd[hf + hn + ".weight"] = t[b + gn + ".weight"]
                sd[hf + hn + ".bias"] = t[b + gn + ".bias"]
            sd[hf + "gate.weight"] = t[b + "time_mix_gate.weight"]
            sd[hf + "o_proj.weight"] = t[b + "time_mix_output.weight"]
            mlp = f"model.layers.{i}."
            sd[mlp + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[mlp + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[mlp + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[mlp + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_arwkv7():
    E = 128
    cfg = _cfg("RwkvHybridForCausalLM", hidden_size=E,
               num_attention_heads=2, intermediate_size=128,
               num_hidden_layers=2, rms_norm_eps=1e-5, head_size=64,
               wkv_has_gate=False, wkv_version=7, lora_rank_decay=16,
               lora_rank_iclr=16, lora_rank_value_residual_mix=16)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b = f"blk.{i}."
            hf = f"model.layers.{i}.self_attn.time_mixer."
            sd[f"model.layers.{i}.input_layernorm.weight"] = t[b + "attn_norm.weight"]
            for k in ("w", "a", "v"):
                sd[hf + f"{k}0"] = t[b + f"time_mix_{k}0.weight"].reshape(1, 1, E)
                sd[hf + f"{k}1"] = t[b + f"time_mix_{k}1.weight"].T
                sd[hf + f"{k}2"] = t[b + f"time_mix_{k}2.weight"].T
            sd[hf + "x_x"] = t[b + "time_mix_lerp_fused.weight"].reshape(5, E)
            sd[hf + "k_k"] = t[b + "time_mix_k_k.weight"]
            sd[hf + "k_a"] = t[b + "time_mix_k_a.weight"]
            sd[hf + "r_k"] = t[b + "time_mix_r_k.weight"].reshape(2, 64)
            for nm in ("key", "value", "receptance", "output"):
                sd[hf + nm + ".weight"] = t[b + f"time_mix_{nm}.weight"]
            mlp = f"model.layers.{i}."
            sd[mlp + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[mlp + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[mlp + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[mlp + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_rwkv6():
    E, L = 64, 2
    cfg = _cfg("Rwkv6ForCausalLM", hidden_size=E, num_hidden_layers=L,
               head_size=16, rescale_every=2, intermediate_size=128,
               layer_norm_epsilon=1e-5)

    def build(t):
        sd = {"rwkv.embeddings.weight": t["token_embd.weight"],
              "rwkv.blocks.0.pre_ln.weight": t["token_embd_norm.weight"],
              "rwkv.blocks.0.pre_ln.bias": t["token_embd_norm.bias"],
              "rwkv.ln_out.weight": t["output_norm.weight"],
              "rwkv.ln_out.bias": t["output_norm.bias"],
              "head.weight": t["output.weight"]}
        for i in range(L):
            b, hf = f"blk.{i}.", f"rwkv.blocks.{i}."
            at, fw = hf + "attention.", hf + "feed_forward."
            for gg, name in (("attn_norm", "ln1"), ("attn_norm_2", "ln2")):
                sd[hf + name + ".weight"] = t[b + gg + ".weight"]
                sd[hf + name + ".bias"] = t[b + gg + ".bias"]
            sd[at + "time_maa_x"] = t[b + "time_mix_lerp_x.weight"].reshape(1, 1, E)
            fused = t[b + "time_mix_lerp_fused.weight"]     # (5,1,1,E) wkvrg
            for j, n in enumerate("wkvrg"):
                sd[at + f"time_maa_{n}"] = fused[j].reshape(1, 1, E)
            sd[at + "time_maa_w1"] = t[b + "time_mix_w1.weight"].T
            sd[at + "time_maa_w2"] = t[b + "time_mix_w2.weight"].transpose(0, 2, 1)
            sd[at + "time_faaaa"] = t[b + "time_mix_first.weight"]
            sd[at + "time_decay"] = t[b + "time_mix_decay.weight"].reshape(1, 1, E)
            sd[at + "time_decay_w1"] = t[b + "time_mix_decay_w1.weight"].T
            sd[at + "time_decay_w2"] = t[b + "time_mix_decay_w2.weight"].T
            scale = 2.0 ** (i // 2)
            for nm in ("key", "value", "receptance", "gate"):
                sd[at + nm + ".weight"] = t[b + f"time_mix_{nm}.weight"]
            sd[at + "output.weight"] = t[b + "time_mix_output.weight"] * scale
            sd[at + "ln_x.weight"] = t[b + "time_mix_ln.weight"]
            sd[at + "ln_x.bias"] = t[b + "time_mix_ln.bias"]
            sd[fw + "time_maa_k"] = t[b + "channel_mix_lerp_k.weight"].reshape(1, 1, E)
            sd[fw + "time_maa_r"] = t[b + "channel_mix_lerp_r.weight"].reshape(1, 1, E)
            sd[fw + "key.weight"] = t[b + "channel_mix_key.weight"]
            sd[fw + "value.weight"] = t[b + "channel_mix_value.weight"] * scale
            sd[fw + "receptance.weight"] = t[b + "channel_mix_receptance.weight"]
        return sd
    return cfg, build


def case_rwkv7():
    E, L = 128, 2
    cfg = _cfg("Rwkv7ForCausalLM", hidden_size=E, num_hidden_layers=L,
               head_size=64, intermediate_size=128, norm_eps=1e-5,
               lora_rank_decay=16, lora_rank_iclr=16,
               lora_rank_value_residual_mix=32, lora_rank_gate=16,
               wkv_has_gate=True)

    def build(t):
        sd = {"model.embeddings.weight": t["token_embd.weight"],
              "model.pre_ln.weight": t["token_embd_norm.weight"],
              "model.pre_ln.bias": t["token_embd_norm.bias"],
              "model.ln_out.weight": t["output_norm.weight"],
              "model.ln_out.bias": t["output_norm.bias"],
              "head.weight": t["output.weight"]}
        for i in range(L):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            at, fw = hf + "attention.", hf + "feed_forward."
            for gg, name in (("attn_norm", "ln1"), ("attn_norm_2", "ln2")):
                sd[hf + name + ".weight"] = t[b + gg + ".weight"]
                sd[hf + name + ".bias"] = t[b + gg + ".bias"]
            fused = t[b + "time_mix_lerp_fused.weight"]     # (6,1,1,E) rwkvag
            for j, n in enumerate(("r", "w", "k", "v", "a", "g")):
                sd[at + f"x_{n}"] = fused[j].reshape(1, 1, E)
            stacks = ["w", "a", "g"] if i == 0 else ["w", "a", "v", "g"]
            for k in stacks:
                if k != "g":
                    sd[at + f"{k}0"] = t[b + f"time_mix_{k}0.weight"].reshape(1, 1, E)
                sd[at + f"{k}1"] = t[b + f"time_mix_{k}1.weight"].T
                sd[at + f"{k}2"] = t[b + f"time_mix_{k}2.weight"].T
            for nm in ("k_k", "k_a", "r_k"):
                sd[at + nm] = t[b + f"time_mix_{nm}.weight"]
            for nm in ("key", "value", "receptance", "output"):
                sd[at + nm + ".weight"] = t[b + f"time_mix_{nm}.weight"]
            sd[at + "ln_x.weight"] = t[b + "time_mix_ln.weight"]
            sd[at + "ln_x.bias"] = t[b + "time_mix_ln.bias"]
            sd[fw + "x_k"] = t[b + "channel_mix_lerp_k.weight"].reshape(1, 1, E)
            sd[fw + "key.weight"] = t[b + "channel_mix_key.weight"]
            sd[fw + "value.weight"] = t[b + "channel_mix_value.weight"]
        return sd
    return cfg, build


def case_lfm2():
    cfg = _cfg("Lfm2ForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=4, rms_norm_eps=1e-5, conv_L_cache=3,
               layer_types=["conv", "full_attention", "conv",
                            "full_attention"],
               tie_word_embeddings=True)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.embedding_norm.weight": t["token_embd_norm.weight"]}
        for i in range(4):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "operator_norm.weight"] = t[b + "attn_norm.weight"]
            if b + "shortconv.conv.weight" in t:
                sd[hf + "conv.conv.weight"] = t[b + "shortconv.conv.weight"][:, None, :]
                sd[hf + "conv.in_proj.weight"] = t[b + "shortconv.in_proj.weight"]
                sd[hf + "conv.out_proj.weight"] = t[b + "shortconv.out_proj.weight"]
            else:
                sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
                sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
                sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
                sd[hf + "self_attn.out_proj.weight"] = t[b + "attn_output.weight"]
                sd[hf + "self_attn.q_layernorm.weight"] = t[b + "attn_q_norm.weight"]
                sd[hf + "self_attn.k_layernorm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "ffn_norm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "feed_forward.w1.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "feed_forward.w3.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "feed_forward.w2.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_lfm2moe():
    NE = 4
    cfg = _cfg("Lfm2MoeForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               num_hidden_layers=3, rms_norm_eps=1e-5, conv_L_cache=3,
               layer_types=["conv", "full_attention", "conv"],
               num_experts=NE, num_experts_per_tok=2,
               moe_intermediate_size=48, num_dense_layers=1,
               tie_word_embeddings=True)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.embedding_norm.weight": t["token_embd_norm.weight"]}
        for i in range(3):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "operator_norm.weight"] = t[b + "attn_norm.weight"]
            if b + "shortconv.conv.weight" in t:
                sd[hf + "conv.conv.weight"] = t[b + "shortconv.conv.weight"][:, None, :]
                sd[hf + "conv.in_proj.weight"] = t[b + "shortconv.in_proj.weight"]
                sd[hf + "conv.out_proj.weight"] = t[b + "shortconv.out_proj.weight"]
            else:
                sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
                sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
                sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
                sd[hf + "self_attn.out_proj.weight"] = t[b + "attn_output.weight"]
                sd[hf + "self_attn.q_layernorm.weight"] = t[b + "attn_q_norm.weight"]
                sd[hf + "self_attn.k_layernorm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "ffn_norm.weight"] = t[b + "ffn_norm.weight"]
            if b + "ffn_gate.weight" in t:     # dense lead
                sd[hf + "feed_forward.w1.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "feed_forward.w3.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "feed_forward.w2.weight"] = t[b + "ffn_down.weight"]
            else:
                sd[hf + "feed_forward.gate.weight"] = t[b + "ffn_gate_inp.weight"]
                sd[hf + "feed_forward.expert_bias"] = t[b + "exp_probs_b.bias"]
                for hw, gw in (("w1", "gate"), ("w2", "down"), ("w3", "up")):
                    stack = t[b + f"ffn_{gw}_exps.weight"]
                    for e in range(NE):
                        sd[hf + f"feed_forward.experts.{e}.{hw}.weight"] = stack[e]
        return sd
    return cfg, build


def case_cogvlm():
    cfg = _cfg("CogVLMForCausalLM", hidden_size=64, num_attention_heads=4,
               intermediate_size=128, num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.language_expert_query_key_value.weight"] = \
                t[b + "attn_qkv.weight"]
            sd[hf + "self_attn.language_expert_dense.weight"] = \
                t[b + "attn_output.weight"]
            sd[hf + "self_attn.vision_expert_query_key_value.weight"] = \
                t[b + "vis_attn_qkv.weight"]
            sd[hf + "self_attn.vision_expert_dense.weight"] = \
                t[b + "vis_attn_output.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "mlp.language_mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.language_mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.language_mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
            sd[hf + "mlp.vision_mlp.gate_proj.weight"] = t[b + "vis_gate.weight"]
            sd[hf + "mlp.vision_mlp.up_proj.weight"] = t[b + "vis_up.weight"]
            sd[hf + "mlp.vision_mlp.down_proj.weight"] = t[b + "vis_down.weight"]
        return sd
    return cfg, build


def case_afmoe():
    NE = 4
    cfg = _cfg("AfmoeForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=128,
               num_hidden_layers=4, rms_norm_eps=1e-5, num_experts=NE,
               num_experts_per_tok=2, moe_intermediate_size=48,
               num_shared_experts=1, num_dense_layers=1, route_norm=True,
               route_scale=2.0, sliding_window=64)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(4):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = \
                t[b + "post_attention_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = unpermute(t[b + "attn_q.weight"], 4)
            sd[hf + "self_attn.k_proj.weight"] = unpermute(t[b + "attn_k.weight"], 2)
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.gate_proj.weight"] = t[b + "attn_gate.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "pre_mlp_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "post_mlp_layernorm.weight"] = t[b + "post_ffw_norm.weight"]
            if b + "ffn_gate.weight" in t:     # dense lead
                sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
            else:
                sd[hf + "mlp.router.gate.weight"] = t[b + "ffn_gate_inp.weight"]
                sd[hf + "mlp.expert_bias"] = t[b + "exp_probs_b.bias"]
                _unstack_experts(sd, t, b, hf, NE)
                for kind in ("gate", "up", "down"):
                    sd[hf + f"mlp.shared_expert.{kind}_proj.weight"] = \
                        t[b + f"ffn_{kind}_shexp.weight"]
        return sd
    return cfg, build


def case_exaone_moe():
    NE = 4
    cfg = _cfg("ExaoneMoEForCausalLM", hidden_size=64,
               num_attention_heads=4, num_key_value_heads=2, head_dim=16,
               intermediate_size=128, num_hidden_layers=4, rms_norm_eps=1e-5,
               num_experts=NE, num_experts_per_tok=2,
               moe_intermediate_size=48, num_shared_experts=1,
               moe_shared_expert_intermediate_size=96,
               routed_scaling_factor=1.0, norm_topk_prob=True,
               first_k_dense_replace=1, num_nextn_predict_layers=0,
               sliding_window=64, scoring_func="sigmoid")

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "lm_head.weight": t["output.weight"]}
        for i in range(4):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"]
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            if b + "ffn_gate.weight" in t:     # dense lead
                sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
            else:
                sd[hf + "mlp.gate.weight"] = t[b + "ffn_gate_inp.weight"]
                sd[hf + "mlp.e_score_correction_bias"] = t[b + "exp_probs_b.bias"]
                _unstack_experts(sd, t, b, hf, NE)
                for kind in ("gate", "up", "down"):
                    sd[hf + f"mlp.shared_experts.{kind}_proj.weight"] = \
                        t[b + f"ffn_{kind}_shexp.weight"]
        return sd
    return cfg, build


def case_phimoe():
    NE = 4
    cfg = _cfg("PhiMoEForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=48,
               num_hidden_layers=2, rms_norm_eps=1e-5, num_local_experts=NE,
               num_experts_per_tok=2)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"],
              "model.norm.bias": t["output_norm.bias"],
              "lm_head.weight": t["output.weight"],
              "lm_head.bias": t["output.bias"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "input_layernorm.bias"] = t[b + "attn_norm.bias"]
            for part in ("q", "k", "v"):
                sd[hf + f"self_attn.{part}_proj.weight"] = t[b + f"attn_{part}.weight"]
                sd[hf + f"self_attn.{part}_proj.bias"] = t[b + f"attn_{part}.bias"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.o_proj.bias"] = t[b + "attn_output.bias"]
            sd[hf + "post_attention_layernorm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "post_attention_layernorm.bias"] = t[b + "ffn_norm.bias"]
            sd[hf + "block_sparse_moe.gate.weight"] = t[b + "ffn_gate_inp.weight"]
            for hw, gw in (("w1", "gate"), ("w2", "down"), ("w3", "up")):
                stack = t[b + f"ffn_{gw}_exps.weight"]
                for e in range(NE):
                    sd[hf + f"block_sparse_moe.experts.{e}.{hw}.weight"] = stack[e]
        return sd
    return cfg, build


def case_nomic_bert():
    cfg = _cfg("NomicBertModel", n_embd=64, n_head=4, n_layer=2, n_inner=128,
               layer_norm_epsilon=1e-12, max_trained_positions=512)

    def build(t):
        sd = {"embeddings.word_embeddings.weight": t["token_embd.weight"],
              "embeddings.token_type_embeddings.weight": t["token_types.weight"],
              "emb_ln.weight": t["token_embd_norm.weight"],
              "emb_ln.bias": t["token_embd_norm.bias"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"encoder.layers.{i}."
            sd[hf + "attn.Wqkv.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "attn.Wqkv.bias"] = t[b + "attn_qkv.bias"]
            sd[hf + "attn.out_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "norm1.weight"] = t[b + "attn_output_norm.weight"]
            sd[hf + "norm1.bias"] = t[b + "attn_output_norm.bias"]
            if b + "ffn_gate_inp.weight" in t:
                sd[hf + "mlp.router.layer.weight"] = t[b + "ffn_gate_inp.weight"]
                sd[hf + "mlp.experts.mlp.w1"] = t[b + "ffn_up_exps.weight"]
                sd[hf + "mlp.experts.mlp.w2"] = t[b + "ffn_down_exps.weight"]
            elif b + "ffn_gate.weight" in t:
                sd[hf + "mlp.fc11.weight"] = t[b + "ffn_gate.weight"]
                sd[hf + "mlp.fc12.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.fc2.weight"] = t[b + "ffn_down.weight"]
            else:
                sd[hf + "mlp.fc1.weight"] = t[b + "ffn_up.weight"]
                sd[hf + "mlp.fc1.bias"] = t[b + "ffn_up.bias"]
                sd[hf + "mlp.fc2.weight"] = t[b + "ffn_down.weight"]
                sd[hf + "mlp.fc2.bias"] = t[b + "ffn_down.bias"]
            sd[hf + "norm2.weight"] = t[b + "layer_output_norm.weight"]
            sd[hf + "norm2.bias"] = t[b + "layer_output_norm.bias"]
        return sd
    return cfg, build


def case_nomic_bert_moe():
    cfg, build = case_nomic_bert()
    cfg.architectures = ["NomicBertModel"]
    cfg.num_experts = 4
    cfg.moe_top_k = 2
    cfg.moe_every_n_layers = 2
    return cfg, build


def case_jina_v2():
    cfg = _cfg("JinaBertModel", hidden_size=64, num_attention_heads=4,
               num_hidden_layers=2, intermediate_size=128,
               layer_norm_eps=1e-12)

    def build(t):
        sd = {"embeddings.word_embeddings.weight": t["token_embd.weight"],
              "embeddings.token_type_embeddings.weight": t["token_types.weight"],
              "embeddings.LayerNorm.weight": t["token_embd_norm.weight"],
              "embeddings.LayerNorm.bias": t["token_embd_norm.bias"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"encoder.layer.{i}."
            for part, hn in (("q", "query"), ("k", "key"), ("v", "value")):
                sd[hf + f"attention.self.{hn}.weight"] = t[b + f"attn_{part}.weight"]
                sd[hf + f"attention.self.{hn}.bias"] = t[b + f"attn_{part}.bias"]
            sd[hf + "attention.output.dense.weight"] = t[b + "attn_output.weight"]
            sd[hf + "attention.output.dense.bias"] = t[b + "attn_output.bias"]
            sd[hf + "attention.output.LayerNorm.weight"] = t[b + "attn_output_norm.weight"]
            sd[hf + "attention.output.LayerNorm.bias"] = t[b + "attn_output_norm.bias"]
            sd[hf + "mlp.layernorm.weight"] = t[b + "attn_norm_2.weight"]
            sd[hf + "mlp.layernorm.bias"] = t[b + "attn_norm_2.bias"]
            sd[hf + "mlp.gated_layers.weight"] = np.concatenate(
                [t[b + "ffn_gate.weight"], t[b + "ffn_up.weight"]])
            sd[hf + "mlp.gated_layers.bias"] = t[b + "ffn_up.bias"]
            sd[hf + "mlp.wo.weight"] = t[b + "ffn_down.weight"]
            sd[hf + "mlp.wo.bias"] = t[b + "ffn_down.bias"]
            sd[hf + "output.LayerNorm.weight"] = t[b + "layer_output_norm.weight"]
            sd[hf + "output.LayerNorm.bias"] = t[b + "layer_output_norm.bias"]
        return sd
    return cfg, build


def case_neo_bert():
    cfg = _cfg("NeoBERT", hidden_size=64, num_attention_heads=4,
               num_hidden_layers=2, intermediate_size=64, norm_eps=1e-5)

    def build(t):
        sd = {"encoder.weight": t["token_embd.weight"],
              "layer_norm.weight": t["enc.output_norm.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"transformer_encoder.{i}."
            sd[hf + "attention_norm.weight"] = t[b + "attn_norm.weight"]
            sd[hf + "qkv.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "wo.weight"] = t[b + "attn_output.weight"]
            sd[hf + "ffn_norm.weight"] = t[b + "ffn_norm.weight"]
            sd[hf + "ffn.w12.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "ffn.w3.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_gemma_embedding():
    cfg = _cfg("Gemma3TextModel", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=128,
               num_hidden_layers=6, rms_norm_eps=1e-5, sliding_window=8,
               rope_local_base_freq=10000.0, tie_word_embeddings=True)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"] - 1.0}
        for i in range(6):
            b, hf = f"blk.{i}.", f"model.layers.{i}."
            sd[hf + "input_layernorm.weight"] = t[b + "attn_norm.weight"] - 1.0
            sd[hf + "self_attn.q_proj.weight"] = t[b + "attn_q.weight"]
            sd[hf + "self_attn.k_proj.weight"] = t[b + "attn_k.weight"]
            sd[hf + "self_attn.v_proj.weight"] = t[b + "attn_v.weight"]
            sd[hf + "self_attn.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "self_attn.q_norm.weight"] = t[b + "attn_q_norm.weight"] - 1.0
            sd[hf + "self_attn.k_norm.weight"] = t[b + "attn_k_norm.weight"] - 1.0
            sd[hf + "post_attention_layernorm.weight"] = \
                t[b + "post_attention_norm.weight"] - 1.0
            sd[hf + "pre_feedforward_layernorm.weight"] = \
                t[b + "ffn_norm.weight"] - 1.0
            sd[hf + "post_feedforward_layernorm.weight"] = \
                t[b + "post_ffw_norm.weight"] - 1.0
            sd[hf + "mlp.gate_proj.weight"] = t[b + "ffn_gate.weight"]
            sd[hf + "mlp.up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_plamo3():
    cfg = _cfg("Plamo3ForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16, intermediate_size=64,
               num_hidden_layers=2, rms_norm_eps=1e-5)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"] - 1.0,
              "lm_head.weight": t["output.weight"]}
        for i in range(2):
            b, hf = f"blk.{i}.", f"model.layers.layers.{i}."
            sd[hf + "pre_mixer_norm.weight"] = t[b + "attn_norm.weight"] - 1.0
            sd[hf + "mixer.qkv_proj.weight"] = t[b + "attn_qkv.weight"]
            sd[hf + "mixer.q_norm.weight"] = t[b + "attn_q_norm.weight"] - 1.0
            sd[hf + "mixer.k_norm.weight"] = t[b + "attn_k_norm.weight"] - 1.0
            sd[hf + "mixer.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_mixer_norm.weight"] = t[b + "post_attention_norm"] - 1.0 / 5
            sd[hf + "pre_mlp_norm.weight"] = t[b + "ffn_norm.weight"] - 1.0
            sd[hf + "post_mlp_norm.weight"] = t[b + "post_ffw_norm"] - 1.0 / 5 ** 1.5
            sd[hf + "mlp.gate_up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


def case_plamo2():
    cfg = _cfg("Plamo2ForCausalLM", hidden_size=64, num_attention_heads=4,
               num_key_value_heads=2, hidden_size_per_head=16,
               intermediate_size=64, num_hidden_layers=4, mamba_step=2,
               mamba_enabled=True, mamba_num_heads=4, mamba_d_state=8,
               mamba_d_conv=4, rms_norm_eps=1e-5)

    def build(t):
        sd = {"model.embed_tokens.weight": t["token_embd.weight"],
              "model.norm.weight": t["output_norm.weight"] - 1.0,
              "lm_head.weight": t["output.weight"]}
        for i in range(4):
            b, hf = f"blk.{i}.", f"model.layers.layers.{i}."
            sd[hf + "pre_mixer_norm.weight"] = t[b + "attn_norm.weight"] - 1.0
            if b + "ssm_in.weight" in t:
                sd[hf + "mixer.in_proj.weight"] = t[b + "ssm_in.weight"]
                sd[hf + "mixer.conv1d.weight"] = t[b + "ssm_conv1d.weight"][:, None, :]
                sd[hf + "mixer.bcdt_proj.weight"] = t[b + "ssm_x.weight"]
                sd[hf + "mixer.dt_proj.weight"] = t[b + "ssm_dt.weight"]
                sd[hf + "mixer.dt_bias"] = t[b + "ssm_dt.bias"]
                sd[hf + "mixer.A_log"] = np.log(-t[b + "ssm_a"])
                sd[hf + "mixer.D"] = t[b + "ssm_d"]
                sd[hf + "mixer.out_proj.weight"] = t[b + "ssm_out.weight"]
                sd[hf + "mixer.dt_norm_weight"] = t[b + "ssm_dt_norm"]
                sd[hf + "mixer.B_norm_weight"] = t[b + "ssm_b_norm"]
                sd[hf + "mixer.C_norm_weight"] = t[b + "ssm_c_norm"]
            else:
                sd[hf + "mixer.qkv_proj.weight"] = t[b + "attn_qkv.weight"]
                sd[hf + "mixer.q_weight"] = t[b + "attn_q_norm.weight"]
                sd[hf + "mixer.k_weight"] = t[b + "attn_k_norm.weight"]
                sd[hf + "mixer.o_proj.weight"] = t[b + "attn_output.weight"]
            sd[hf + "post_mixer_norm.weight"] = t[b + "post_attention_norm"] - 1.0 / 5
            sd[hf + "pre_mlp_norm.weight"] = t[b + "ffn_norm.weight"] - 1.0
            sd[hf + "post_mlp_norm.weight"] = t[b + "post_ffw_norm"] - 1.0 / 5 ** 1.5
            sd[hf + "mlp.gate_up_proj.weight"] = t[b + "ffn_up.weight"]
            sd[hf + "mlp.down_proj.weight"] = t[b + "ffn_down.weight"]
        return sd
    return cfg, build


CASES = {
    "orion": case_orion, "xverse": case_xverse, "baichuan": case_baichuan,
    "internlm2": case_internlm2, "exaone": case_exaone,
    "minicpm": case_minicpm, "olmo": case_olmo, "deepseek": case_deepseek,
    "qwen": case_qwen, "jais": case_jais, "chatglm": case_chatglm,
    "codeshell": case_codeshell, "dream": case_dream,
    "arctic": case_arctic, "grok": case_grok, "chameleon": case_chameleon,
    "bailingmoe": case_bailingmoe, "bailingmoe2": case_bailingmoe2,
    "smallthinker": case_smallthinker, "grovemoe": case_grovemoe,
    "deci": case_deci, "openelm": case_openelm, "plamo": case_plamo,
    "plm": case_plm, "minicpm3": case_minicpm3,
    "minimax-m2": case_minimax_m2, "pangu-embedded": case_pangu,
    "maincoder": case_maincoder, "llada-moe": case_llada_moe,
    "rwkv6qwen2": case_rwkv6qwen2, "arwkv7": case_arwkv7,
    "rwkv6": case_rwkv6, "rwkv7": case_rwkv7,
    "plamo2": case_plamo2, "plamo3": case_plamo3,
    "nomic-bert": case_nomic_bert, "nomic-bert-moe": case_nomic_bert_moe,
    "jina-bert-v2": case_jina_v2, "neo-bert": case_neo_bert,
    "gemma-embedding": case_gemma_embedding,
    "lfm2": case_lfm2, "lfm2moe": case_lfm2moe, "cogvlm": case_cogvlm,
    "afmoe": case_afmoe, "exaone-moe": case_exaone_moe,
    "phimoe": case_phimoe,
}


def _hparams_equal(a, b) -> list[str]:
    bad = []
    da, db = dataclasses.asdict(a), dataclasses.asdict(b)
    for k in da:
        va, vb = da[k], db[k]
        if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
            ok = np.array_equal(np.asarray(va), np.asarray(vb))
        elif isinstance(va, float) and isinstance(vb, float):
            # GGUF stores f32; spec-side defaults are python doubles
            ok = va == pytest.approx(vb, rel=1e-6, abs=1e-12)
        else:
            ok = va == vb
        if not ok:
            bad.append(f"{k}: {va!r} != {vb!r}")
    return bad


@pytest.mark.parametrize("name", sorted(CASES), ids=str)
def test_convert_matches_spec(name, tmp_path):
    spec_fn = SPECS.get(name) or ENC_SPECS[name]
    arch, md, tensors = spec_fn()
    case = CASES[name]()
    cfg, build = case[0], case[1]
    if len(case) > 2:  # converter-reachable expected tensors differ from spec
        tensors = case[2](tensors)
    spec_path = tmp_path / f"{name}.spec.gguf"
    build_gguf(spec_path, arch, md, tensors)

    sd = build(tensors)
    out_path = tmp_path / f"{name}.conv.gguf"
    convert_state_dict(str(out_path), cfg, sd, GGMLType.F32,
                       tokenizer_fields=tokenizer_fields())

    ra, rb = GGUFReader(spec_path), GGUFReader(out_path)
    assert rb.arch() == arch
    # every spec metadata key must exist with an equal value
    for k, v in ra.metadata.items():
        if k.startswith("general."):
            continue
        got = rb.metadata.get(k)
        if isinstance(v, (np.ndarray, list, tuple)) \
                or isinstance(got, (np.ndarray, list, tuple)):
            assert got is not None and np.array_equal(
                np.asarray(got), np.asarray(v)), f"{k} differs"
        elif isinstance(v, float):
            assert got == pytest.approx(v, rel=1e-6), f"{k}: {got} != {v}"
        else:
            assert got == v, f"{k}: {got!r} != {v!r}"
    # identical tensor sets, bit-equal payloads (ssm_a goes through a
    # log/-exp roundtrip — A_log is the HF storage form — so f32-close only)
    assert set(ra.tensors) == set(rb.tensors), (
        set(ra.tensors) ^ set(rb.tensors))
    for tname, ti in ra.tensors.items():
        if tname.endswith("ssm_a"):
            np.testing.assert_allclose(
                ti.astype_f32(), rb.tensors[tname].astype_f32(),
                rtol=1e-6, atol=1e-7, err_msg=f"{name}:{tname}")
        else:
            np.testing.assert_array_equal(
                ti.astype_f32(), rb.tensors[tname].astype_f32(),
                err_msg=f"{name}:{tname}")
    # identical runtime hparams
    ma = load_model(str(spec_path))
    mb = load_model(str(out_path))
    bad = _hparams_equal(ma.hparams, mb.hparams)
    assert not bad, bad
