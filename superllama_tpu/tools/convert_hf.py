"""HF → GGUF converter (counterpart of convert_hf_to_gguf.py, layer 9).

Supports the llama family (llama/mistral/mixtral/qwen2/qwen3) from a
transformers model directory or an in-memory (config, state_dict) pair.
Writes standard GGUF metadata keys + tensor names so the output is loadable
by any ecosystem runtime, not just ours.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..gguf import GGMLType, GGUFWriter


def permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF interleaved→GGUF adjacent-pair rope layout for q/k projections."""
    out_dim = w.shape[0]
    return (
        w.reshape(n_head, 2, out_dim // n_head // 2, *w.shape[1:])
        .swapaxes(1, 2)
        .reshape(w.shape)
    )


_ARCH_MAP = {
    "LlamaForCausalLM": "llama",
    # reference LlamaModel registrations (convert_hf_to_gguf.py): plain
    # aliases and llama-graph wrappers (VLlama3 = SmolVLM text stack)
    "LlamaModel": "llama",
    "LLaMAForCausalLM": "llama",
    "IQuestCoderForCausalLM": "llama",
    "VLlama3ForCausalLM": "llama",
    # Mistral3/Ministral3: llama tensor layout; the vision tower is dropped
    # by the language_model.* wrapper extraction (Mistral3Model counterpart —
    # non-ministral3 checkpoints use the LLAMA arch there too)
    "Mistral3ForConditionalGeneration": "llama",
    "Ministral3ForCausalLM": "llama",
    "YoutuForCausalLM": "deepseek2",
    "Rwkv6ForCausalLM": "rwkv6",
    "Rwkv7ForCausalLM": "rwkv7",
    "RWKV7ForCausalLM": "rwkv7",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "Qwen3NextForCausalLM": "qwen3next",
    "Gemma3nForCausalLM": "gemma3n",
    "Gemma3nForConditionalGeneration": "gemma3n",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
    "GptOssForCausalLM": "gpt-oss",
    "Phi3ForCausalLM": "phi3",
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek2",
    "BertModel": "bert",
    "BertForSequenceClassification": "bert",
    "MambaForCausalLM": "mamba",
    "FalconMambaForCausalLM": "mamba",
    "Mamba2ForCausalLM": "mamba2",
    "GPT2LMHeadModel": "gpt2",
    "GPTNeoXForCausalLM": "gptneox",
    "FalconForCausalLM": "falcon",
    "Starcoder2ForCausalLM": "starcoder2",
    "PhiForCausalLM": "phi2",
    "CohereForCausalLM": "command-r",
    "Cohere2ForCausalLM": "cohere2",
    "Olmo2ForCausalLM": "olmo2",
    "OlmoForCausalLM": "olmo",
    "StableLmForCausalLM": "stablelm",
    "BloomForCausalLM": "bloom",
    "MptForCausalLM": "mpt",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "GlmForCausalLM": "glm4",
    "Glm4ForCausalLM": "glm4",
    "NemotronForCausalLM": "nemotron",
    "GraniteForCausalLM": "granite",
    "GraniteMoeForCausalLM": "granitemoe",
    "GraniteMoeSharedForCausalLM": "granitemoe",
    "GraniteMoeHybridForCausalLM": "granitehybrid",
    "BambaForCausalLM": "granitehybrid",
    "FalconH1ForCausalLM": "falcon-h1",
    "NemotronHForCausalLM": "nemotron_h",
    "ArceeForCausalLM": "arcee",
    "Glm4MoeForCausalLM": "glm4moe",
    "Dots1ForCausalLM": "dots1",
    "Ernie4_5_MoeForCausalLM": "ernie4_5-moe",
    "HunYuanMoEV1ForCausalLM": "hunyuan-moe",
    "ApertusForCausalLM": "apertus",
    "BitNetForCausalLM": "bitnet",
    "Olmo3ForCausalLM": "olmo2",   # Olmo3 rides the olmo2 graph + iSWA array
    "OlmoeForCausalLM": "olmoe",
    "SeedOssForCausalLM": "seed_oss",
    "HunYuanDenseV1ForCausalLM": "hunyuan-dense",
    "Ernie4_5ForCausalLM": "ernie4_5",
    "SmolLM3ForCausalLM": "smollm3",
    "Exaone4ForCausalLM": "exaone4",
    "Llama4ForCausalLM": "llama4",
    "Qwen2VLForConditionalGeneration": "qwen2vl",
    "Qwen2_5_VLForConditionalGeneration": "qwen2vl",
    "Qwen3VLForConditionalGeneration": "qwen3vl",
    "Qwen3VLMoeForConditionalGeneration": "qwen3vlmoe",
    "LlavaForConditionalGeneration": "llama",
    "DbrxForCausalLM": "dbrx",
    "GPTBigCodeForCausalLM": "starcoder",
    "PhimoeForCausalLM": "phimoe",
    "Lfm2ForCausalLM": "lfm2",
    "JambaForCausalLM": "jamba",
    "RobertaModel": "bert",
    "RobertaForSequenceClassification": "bert",
    "XLMRobertaModel": "bert",
    "XLMRobertaForSequenceClassification": "bert",
    "DistilBertModel": "bert",
    "ModernBertModel": "modern-bert",
    "T5ForConditionalGeneration": "t5",
    "MT5ForConditionalGeneration": "t5",
    "T5EncoderModel": "t5encoder",
    "ModernBertForMaskedLM": "modern-bert",
    # --- wave 3: remaining reference converter classes ---
    # aliases onto existing mappers (convert_hf_to_gguf.py registers the same
    # class names onto the same MODEL_ARCH values)
    "MPTForCausalLM": "mpt",
    "BloomModel": "bloom",
    "MambaLMHeadModel": "mamba",
    "Qwen2Model": "qwen2",
    "KORMoForCausalLM": "qwen2",
    "Qwen2AudioForConditionalGeneration": "qwen2",
    "AudioFlamingo3ForConditionalGeneration": "qwen2",
    "Qwen2VLModel": "qwen2vl",
    "LFM2ForCausalLM": "lfm2",
    "Lfm2Model": "lfm2",
    "Lfm2VlForConditionalGeneration": "lfm2",
    "Ernie4_5_ForCausalLM": "ernie4_5",
    "PhiMoEForCausalLM": "phimoe",
    "BitnetForCausalLM": "bitnet",
    "T5WithLMHeadModel": "t5",
    "UMT5ForConditionalGeneration": "t5",
    "UMT5Model": "t5",
    "BertForMaskedLM": "bert",
    "CamembertModel": "bert",
    "DistilBertForMaskedLM": "bert",
    "DistilBertForSequenceClassification": "bert",
    "ModernBertForSequenceClassification": "modern-bert",
    "InternLM3ForCausalLM": "llama",
    "UltravoxModel": "llama",
    "VoxtralForConditionalGeneration": "llama",
    "JanusForConditionalGeneration": "llama",
    "KimiVLForConditionalGeneration": "deepseek2",
    "YoutuVLForConditionalGeneration": "deepseek2",
    "Glm4MoeLiteForCausalLM": "deepseek2",
    "SolarOpenForCausalLM": "glm4moe",
    "Glm4vForConditionalGeneration": "glm4",
    "Glm4vMoeForConditionalGeneration": "glm4moe",
    "Llama4ForConditionalGeneration": "llama4",
    "GemmaForCausalLM": "gemma",
    # EmbeddingGemma ships as Gemma3TextModel (convert_hf_to_gguf
    # EmbeddingGemma class); causal gemma3 checkpoints use
    # Gemma3ForCausalLM/-ConditionalGeneration
    "Gemma3TextModel": "gemma-embedding",
    # new per-arch mappers (this file, below)
    "OrionForCausalLM": "orion",
    "XverseForCausalLM": "xverse",
    "BaichuanForCausalLM": "baichuan",
    "BaiChuanForCausalLM": "baichuan",
    "InternLM2ForCausalLM": "internlm2",
    "ExaoneForCausalLM": "exaone",
    "MiniCPMForCausalLM": "minicpm",
    "OLMoForCausalLM": "olmo",
    "DeepseekForCausalLM": "deepseek",
    "QWenLMHeadModel": "qwen",
    "JAISLMHeadModel": "jais",
    "ChatGLMModel": "chatglm",
    "ChatGLMForConditionalGeneration": "chatglm",
    "CodeShellForCausalLM": "codeshell",
    "DreamModel": "dream",
    "ArcticForCausalLM": "arctic",
    "GrokForCausalLM": "grok",
    "Grok1ForCausalLM": "grok",
    "ChameleonForCausalLM": "chameleon",
    "ChameleonForConditionalGeneration": "chameleon",
    "BailingMoeForCausalLM": "bailingmoe",
    "BailingMoeV2ForCausalLM": "bailingmoe2",
    "SmallThinkerForCausalLM": "smallthinker",
    "GroveMoeForCausalLM": "grovemoe",
    "modeling_grove_moe.GroveMoeForCausalLM": "grovemoe",
    "DeciLMForCausalLM": "deci",
    "OpenELMForCausalLM": "openelm",
    "PlamoForCausalLM": "plamo",
    "PLMForCausalLM": "plm",
    "PanguEmbeddedForCausalLM": "pangu-embedded",
    "MaincoderForCausalLM": "maincoder",
    "MiniMaxM2ForCausalLM": "minimax-m2",
    "MiniCPM3ForCausalLM": "minicpm3",
    "MiMoV2FlashForCausalLM": "mimo2",
    "LLaDAModelLM": "llada",
    "LLaDAMoEModel": "llada-moe",
    "LLaDAMoEModelLM": "llada-moe",
    "RND1": "rnd1",
    "ExaoneMoEForCausalLM": "exaone-moe",
    "Lfm2MoeForCausalLM": "lfm2moe",
    "AfmoeForCausalLM": "afmoe",
    "StableLMEpochForCausalLM": "stablelm",
    "LlavaStableLMEpochForCausalLM": "stablelm",
    "CogVLMForCausalLM": "cogvlm",
    "GPTRefactForCausalLM": "refact",
    "RWForCausalLM": "falcon",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "RwkvHybridForCausalLM": "arwkv7",
    "Plamo2ForCausalLM": "plamo2",
    "PLaMo2ForCausalLM": "plamo2",
    "Plamo3ForCausalLM": "plamo3",
    "PLaMo3ForCausalLM": "plamo3",
    "NomicBertModel": "nomic-bert",
    "JinaBertModel": "jina-bert-v2",
    "JinaBertForMaskedLM": "jina-bert-v2",
    "NeoBERT": "neo-bert",
    "NeoBERTLMHead": "neo-bert",
    "NeoBERTForSequenceClassification": "neo-bert",
    "LlamaBidirectionalModel": "llama-embed",
    "SmolVLMForConditionalGeneration": "llama",
    "Idefics3ForConditionalGeneration": "llama",
    "LightOnOCRForConditionalGeneration": "llama",
    "Qwen2_5OmniModel": "qwen2vl",
}

# archs whose norm weights are stored as (1 + w) in HF (gemma RMSNorm,
# nemotron LayerNorm1P)
_NORM_PLUS_ONE = {"gemma2", "gemma3", "gemma-embedding", "nemotron",
                  # Qwen3NextRMSNorm is zero-centered (y = x·(1+w)); the
                  # GATED linear_attn.norm is standard and stays raw
                  "qwen3next"}
# archs using adjacent-pair (NORM) rope that need HF q/k permutation
_PERMUTE_QK = {"llama", "granite", "smollm3", "granitemoe", "granitehybrid",
               "arcee",
               # wave 3 (each mirrors the reference class's modify_tensors
               # permute): XverseModel, MiniCPMModel, OlmoModel, DeepseekModel
               "xverse", "minicpm", "olmo", "deepseek"}


def _put_deepseek2_layer(put, get, hf, gg, config, n_expert):
    """DeepSeek-V2 MLA + MoE tensor mapping (convert_hf_to_gguf DeepseekV2
    counterpart)."""
    if get(hf + "self_attn.q_proj.weight") is not None:
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
    else:
        put(gg + "attn_q_a.weight", get(hf + "self_attn.q_a_proj.weight"))
        put(gg + "attn_q_a_norm.weight", get(hf + "self_attn.q_a_layernorm.weight"))
        put(gg + "attn_q_b.weight", get(hf + "self_attn.q_b_proj.weight"))
    put(gg + "attn_kv_a_mqa.weight", get(hf + "self_attn.kv_a_proj_with_mqa.weight"))
    put(gg + "attn_kv_a_norm.weight", get(hf + "self_attn.kv_a_layernorm.weight"))
    put(gg + "attn_kv_b.weight", get(hf + "self_attn.kv_b_proj.weight"))
    put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
    put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
    put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
    if get(hf + "mlp.gate.weight") is not None:  # MoE layer
        put(gg + "ffn_gate_inp.weight", get(hf + "mlp.gate.weight"))
        if get(hf + "mlp.gate.e_score_correction_bias") is not None:  # V3
            put(gg + "exp_probs_b.bias",
                get(hf + "mlp.gate.e_score_correction_bias"))
        import numpy as _np
        for kind, hf_n in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            stack = _np.stack([get(hf + f"mlp.experts.{e}.{hf_n}.weight")
                               for e in range(n_expert)])
            put(gg + f"ffn_{kind}_exps.weight", stack)
        put(gg + "ffn_gate_shexp.weight", get(hf + "mlp.shared_experts.gate_proj.weight"))
        put(gg + "ffn_up_shexp.weight", get(hf + "mlp.shared_experts.up_proj.weight"))
        put(gg + "ffn_down_shexp.weight", get(hf + "mlp.shared_experts.down_proj.weight"))
    else:
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_mamba(w, put, get, config):
    """Mamba SSM mapping (convert_hf_to_gguf MambaModel counterpart)."""
    put("token_embd.weight", get("backbone.embeddings.weight"))
    put("output_norm.weight", get("backbone.norm_f.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm)
    for il in range(config.num_hidden_layers):
        hf = f"backbone.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "norm.weight"))
        put(gg + "ssm_in.weight", get(hf + "mixer.in_proj.weight"))
        conv = get(hf + "mixer.conv1d.weight")          # (di, 1, dc)
        put(gg + "ssm_conv1d.weight", conv[:, 0, :])    # (di, dc)
        put(gg + "ssm_conv1d.bias", get(hf + "mixer.conv1d.bias"))
        put(gg + "ssm_x.weight", get(hf + "mixer.x_proj.weight"))
        put(gg + "ssm_dt.weight", get(hf + "mixer.dt_proj.weight"))
        put(gg + "ssm_dt.bias", get(hf + "mixer.dt_proj.bias"))
        put(gg + "ssm_a", -np.exp(get(hf + "mixer.A_log")))  # A_log -> A (canonical)
        put(gg + "ssm_d", get(hf + "mixer.D"))
        put(gg + "ssm_out.weight", get(hf + "mixer.out_proj.weight"))


def _put_mamba2_mixer(put, get, hf, gg, in_proj_scale=None,
                      out_proj_scale=None):
    """One mamba2 mixer's tensors; hf is the HF mixer prefix (e.g.
    'backbone.layers.0.mixer.' or 'model.layers.0.mamba.')."""
    w_in = get(hf + "in_proj.weight")
    if in_proj_scale is not None:  # falcon-h1 baked zxBCdt multipliers
        w_in = w_in * in_proj_scale
    put(gg + "ssm_in.weight", w_in)
    conv = get(hf + "conv1d.weight")                # (conv_dim, 1, dc)
    put(gg + "ssm_conv1d.weight", conv[:, 0, :])
    b = get(hf + "conv1d.bias")
    if b is not None:
        put(gg + "ssm_conv1d.bias", b)
    put(gg + "ssm_dt.bias", get(hf + "dt_bias"))
    put(gg + "ssm_a", -np.exp(get(hf + "A_log")))  # A_log -> A (canonical)
    put(gg + "ssm_d", get(hf + "D"))
    if get(hf + "norm.weight") is not None:
        put(gg + "ssm_norm.weight", get(hf + "norm.weight"))
    w_out = get(hf + "out_proj.weight")
    if out_proj_scale is not None:  # falcon-h1 ssm_out_multiplier
        w_out = w_out * out_proj_scale
    put(gg + "ssm_out.weight", w_out)


def _convert_mamba2(w, put, get, config):
    """Mamba-2 mapping (convert_hf_to_gguf Mamba2Model counterpart): fused
    zxBCdt in_proj, conv over [x,B,C], per-head dt_bias/A_log/D, gated
    grouped norm."""
    put("token_embd.weight", get("backbone.embeddings.weight"))
    put("output_norm.weight", get("backbone.norm_f.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm)
    for il in range(config.num_hidden_layers):
        hf = f"backbone.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "norm.weight"))
        _put_mamba2_mixer(put, get, hf + "mixer.", gg)


def _put_granite_moe_ffn(put, get, hf, gg, config, np):
    """GraniteMoe FFN tensors: fused input_linear (gate|up stacked on the
    expert ff dim) split apart (convert_hf_to_gguf GraniteMoeModel), router,
    and the always-on shared expert."""
    fused = get(hf + "block_sparse_moe.input_linear.weight")  # (E, 2F, D)
    if fused is not None:
        ff = fused.shape[1] // 2
        put(gg + "ffn_gate_exps.weight", np.ascontiguousarray(fused[:, :ff]))
        put(gg + "ffn_up_exps.weight", np.ascontiguousarray(fused[:, ff:]))
        put(gg + "ffn_down_exps.weight",
            get(hf + "block_sparse_moe.output_linear.weight"))
        put(gg + "ffn_gate_inp.weight",
            get(hf + "block_sparse_moe.router.layer.weight"))
    sh = get(hf + "shared_mlp.input_linear.weight")           # (2Fs, D)
    if sh is not None:
        fs = sh.shape[0] // 2
        sfx = "_shexp" if fused is not None else ""
        put(gg + f"ffn_gate{sfx}.weight", np.ascontiguousarray(sh[:fs]))
        put(gg + f"ffn_up{sfx}.weight", np.ascontiguousarray(sh[fs:]))
        put(gg + f"ffn_down{sfx}.weight",
            get(hf + "shared_mlp.output_linear.weight"))


def _convert_granite_hybrid(w, put, get, config, np):
    """granitehybrid / bamba mapping (convert_hf_to_gguf GraniteHybridModel):
    per-layer mamba2 or attention (layer_types), granite multipliers as KV,
    GraniteMoe fused-FFN splits, optional rope (bamba)."""
    arch = "granitehybrid"
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm)
    layer_types = getattr(config, "layer_types", None) or [
        "attention" if get(f"model.layers.{i}.self_attn.q_proj.weight")
        is not None else "mamba" for i in range(config.num_hidden_layers)]
    n_kv = int(getattr(config, "num_key_value_heads", 0)
               or config.num_attention_heads)
    w.add(f"{arch}.attention.head_count_kv",
          [n_kv if t == "attention" else 0 for t in layer_types])
    for il in range(config.num_hidden_layers):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        if layer_types[il] == "mamba":
            _put_mamba2_mixer(put, get, hf + "mamba.", gg)
        else:
            n_head = int(config.num_attention_heads)
            n_kv = int(getattr(config, "num_key_value_heads", 0) or n_head)
            # NORM-rope layout: permute like the LlamaModel-derived converter
            put(gg + "attn_q.weight",
                permute_qk(get(hf + "self_attn.q_proj.weight"), n_head))
            put(gg + "attn_k.weight",
                permute_qk(get(hf + "self_attn.k_proj.weight"), n_kv))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
            put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        _put_granite_moe_ffn(put, get, hf, gg, config, np)


def _convert_falcon_h1(w, put, get, config, np):
    """falcon-h1 mapping (convert_hf_to_gguf FalconH1Model): every layer has
    attention + a mamba2 mixer + gated FFN; the mup channel multipliers are
    baked into the weights exactly as the reference converter does."""
    m = lambda k: float(getattr(config, k, 1.0) or 1.0)
    emb = get("model.embed_tokens.weight") * m("embedding_multiplier")
    put("token_embd.weight", emb)
    put("output_norm.weight", get("model.final_layernorm.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm * m("lm_head_multiplier"))
    di = int(config.mamba_d_ssm)
    gds = int(config.mamba_n_groups) * int(config.mamba_d_state)
    zx = list(getattr(config, "ssm_multipliers", None) or [1.0] * 5)
    in_scale = np.concatenate([
        np.full(di, zx[0]), np.full(di, zx[1]), np.full(gds, zx[2]),
        np.full(gds, zx[3]), np.full(int(config.mamba_n_heads), zx[4]),
    ]).astype(np.float32)[:, None] * m("ssm_in_multiplier")
    mlp = list(getattr(config, "mlp_multipliers", None) or [1.0, 1.0])
    for il in range(config.num_hidden_layers):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "pre_ff_layernorm.weight"))
        ain = m("attention_in_multiplier")
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight") * ain)
        put(gg + "attn_k.weight",
            get(hf + "self_attn.k_proj.weight") * ain * m("key_multiplier"))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight") * ain)
        put(gg + "attn_output.weight",
            get(hf + "self_attn.o_proj.weight") * m("attention_out_multiplier"))
        _put_mamba2_mixer(put, get, hf + "mamba.", gg, in_proj_scale=in_scale,
                          out_proj_scale=m("ssm_out_multiplier"))
        put(gg + "ffn_gate.weight",
            get(hf + "feed_forward.gate_proj.weight") * mlp[0])
        put(gg + "ffn_up.weight", get(hf + "feed_forward.up_proj.weight"))
        put(gg + "ffn_down.weight",
            get(hf + "feed_forward.down_proj.weight") * mlp[1])


def _convert_gemma3n(w, put, get, config):
    """Gemma3n text mapping (convert_hf_to_gguf Gemma3NModel counterpart;
    norm_shift = 0 — gemma3n norms are NOT zero-centered)."""
    L = config.num_hidden_layers
    A = int(getattr(config, "altup_num_inputs", 4))
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    out = get("lm_head.weight")
    if out is not None:
        put("output.weight", out)
    put("per_layer_token_embd.weight",
        get("model.embed_tokens_per_layer.weight"))
    put("per_layer_model_proj.weight",
        get("model.per_layer_model_projection.weight"))
    put("per_layer_proj_norm.weight",
        get("model.per_layer_projection_norm.weight"))
    put("altup_proj.weight", np.stack(
        [get(f"model.altup_projections.{i}.weight") for i in range(A - 1)]))
    put("altup_unembd_proj.weight", np.stack(
        [get(f"model.altup_unembed_projections.{i}.weight")
         for i in range(A - 1)]))
    for il in range(L):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "post_attention_norm.weight",
            get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_norm.weight",
            get(hf + "pre_feedforward_layernorm.weight"))
        put(gg + "post_ffw_norm.weight",
            get(hf + "post_feedforward_layernorm.weight"))
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
        put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "self_attn.q_norm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "self_attn.k_norm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))
        put(gg + "laurel_l.weight", get(hf + "laurel.linear_left.weight"))
        put(gg + "laurel_r.weight", get(hf + "laurel.linear_right.weight"))
        put(gg + "laurel_post_norm.weight",
            get(hf + "laurel.post_laurel_norm.weight"))
        put(gg + "inp_gate.weight", get(hf + "per_layer_input_gate.weight"))
        put(gg + "proj.weight", get(hf + "per_layer_projection.weight"))
        put(gg + "post_norm.weight",
            get(hf + "post_per_layer_input_norm.weight"))
        put(gg + "altup_correct_scale.weight",
            get(hf + "altup.correct_output_scale"))
        put(gg + "altup_correct_coef.weight",
            get(hf + "altup.correction_coefs.weight"))
        put(gg + "altup_predict_coef.weight",
            get(hf + "altup.prediction_coefs.weight"))
        put(gg + "altup_router.weight",
            get(hf + "altup.modality_router.weight"))
        put(gg + "altup_router_norm.weight",
            get(hf + "altup.router_norm.weight"))


def _convert_qwen3next(w, put, get, get_norm, config):
    """Qwen3-Next mapping (convert_hf_to_gguf Qwen3NextModel counterpart):
    delta-net layers emit head-contiguous attn_qkv [q|k|v] + attn_gate (z)
    rearranged from HF's per-k-head-interleaved in_proj_qkvz; ssm_ba stays
    in HF's native [beta|alpha]-per-k-head layout; A_log → −exp(A_log);
    every zero-centered norm gets +1 EXCEPT the gated linear_attn.norm."""
    L = config.num_hidden_layers
    E = config.hidden_size
    Dk = config.linear_key_head_dim
    Dv = config.linear_value_head_dim
    Hk = config.linear_num_key_heads
    Hv = config.linear_num_value_heads
    R = Hv // Hk
    n_expert = int(getattr(config, "num_experts", 0) or 0)

    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get_norm("model.norm.weight"))
    out = get("lm_head.weight")
    if out is not None:
        put("output.weight", out)
    for il in range(L):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_norm.weight", get_norm(hf + "input_layernorm.weight"))
        put(gg + "post_attention_norm.weight",
            get_norm(hf + "post_attention_layernorm.weight"))
        if (il + 1) % 4 == 0:                  # gated full attention
            put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
            put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
            put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
            put(gg + "attn_q_norm.weight",
                get_norm(hf + "self_attn.q_norm.weight"))
            put(gg + "attn_k_norm.weight",
                get_norm(hf + "self_attn.k_norm.weight"))
        else:                                  # gated delta net
            qkvz = get(hf + "linear_attn.in_proj_qkvz.weight")  # (out, E)
            per = 2 * Dk + 2 * R * Dv
            qkvz = qkvz.reshape(Hk, per, E)
            q = qkvz[:, :Dk].reshape(Hk * Dk, E)
            k = qkvz[:, Dk:2 * Dk].reshape(Hk * Dk, E)
            v = qkvz[:, 2 * Dk:2 * Dk + R * Dv].reshape(Hv * Dv, E)
            z = qkvz[:, 2 * Dk + R * Dv:].reshape(Hv * Dv, E)
            put(gg + "attn_qkv.weight", np.concatenate([q, k, v], axis=0))
            put(gg + "attn_gate.weight", z)
            put(gg + "ssm_ba.weight", get(hf + "linear_attn.in_proj_ba.weight"))
            conv = get(hf + "linear_attn.conv1d.weight")  # (C, 1, dc)
            put(gg + "ssm_conv1d.weight", conv.squeeze(1))
            put(gg + "ssm_a", -np.exp(get(hf + "linear_attn.A_log")))
            put(gg + "ssm_dt.bias", get(hf + "linear_attn.dt_bias"))
            put(gg + "ssm_norm.weight", get(hf + "linear_attn.norm.weight"))
            put(gg + "ssm_out.weight", get(hf + "linear_attn.out_proj.weight"))
        if n_expert:
            put(gg + "ffn_gate_inp.weight", get(hf + "mlp.gate.weight"))
            for kind, hf_n in (("gate", "gate_proj"), ("up", "up_proj"),
                               ("down", "down_proj")):
                put(gg + f"ffn_{kind}_exps.weight",
                    np.stack([get(hf + f"mlp.experts.{e}.{hf_n}.weight")
                              for e in range(n_expert)]))
            put(gg + "ffn_gate_shexp.weight",
                get(hf + "mlp.shared_expert.gate_proj.weight"))
            put(gg + "ffn_up_shexp.weight",
                get(hf + "mlp.shared_expert.up_proj.weight"))
            put(gg + "ffn_down_shexp.weight",
                get(hf + "mlp.shared_expert.down_proj.weight"))
            put(gg + "ffn_gate_inp_shexp.weight",
                get(hf + "mlp.shared_expert_gate.weight").reshape(-1))
        else:
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_gpt2(w, put, get, config):
    """GPT-2 mapping: Conv1D weights are (in, out) → transpose; fused c_attn
    splits straight into q|k|v; learned positions (wpe)."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("position_embd.weight", get("transformer.wpe.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    E = config.hidden_size
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln_1.bias"))
        ca = get(hf + "attn.c_attn.weight").T
        cb = get(hf + "attn.c_attn.bias")
        for i, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gg + nm + ".weight", ca[i * E:(i + 1) * E])
            put(gg + nm + ".bias", cb[i * E:(i + 1) * E])
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight").T)
        put(gg + "attn_output.bias", get(hf + "attn.c_proj.bias"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_norm.bias", get(hf + "ln_2.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.c_fc.weight").T)
        put(gg + "ffn_up.bias", get(hf + "mlp.c_fc.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight").T)
        put(gg + "ffn_down.bias", get(hf + "mlp.c_proj.bias"))


def _convert_gptneox(w, put, get, config):
    """GPT-NeoX/pythia mapping: per-head-interleaved fused QKV."""
    put("token_embd.weight", get("gpt_neox.embed_in.weight"))
    put("output.weight", get("embed_out.weight"))
    put("output_norm.weight", get("gpt_neox.final_layer_norm.weight"))
    put("output_norm.bias", get("gpt_neox.final_layer_norm.bias"))
    H = config.num_attention_heads
    E = config.hidden_size
    D = E // H
    for il in range(config.num_hidden_layers):
        hf, gg = f"gpt_neox.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_norm.bias", get(hf + "input_layernorm.bias"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_norm.bias", get(hf + "post_attention_layernorm.bias"))
        qkv = get(hf + "attention.query_key_value.weight").reshape(H, 3, D, E)
        qkvb = get(hf + "attention.query_key_value.bias").reshape(H, 3, D)
        for i, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gg + nm + ".weight", qkv[:, i].reshape(H * D, E))
            put(gg + nm + ".bias", qkvb[:, i].reshape(H * D))
        put(gg + "attn_output.weight", get(hf + "attention.dense.weight"))
        put(gg + "attn_output.bias", get(hf + "attention.dense.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.dense_h_to_4h.weight"))
        put(gg + "ffn_up.bias", get(hf + "mlp.dense_h_to_4h.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.dense_4h_to_h.weight"))
        put(gg + "ffn_down.bias", get(hf + "mlp.dense_4h_to_h.bias"))


def _convert_falcon(w, put, get, config):
    """Falcon mapping: three fused-QKV layouts (grouped new-arch, MQA,
    per-head interleaved) and one or two parallel-attn norms."""
    put("token_embd.weight", get("transformer.word_embeddings.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    if not getattr(config, "tie_word_embeddings", True):
        put("output.weight", get("lm_head.weight"))
    H = config.num_attention_heads
    E = config.hidden_size
    D = E // H
    new = getattr(config, "new_decoder_architecture", False)
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        if get(hf + "ln_attn.weight") is not None:      # 40b: dual norms
            put(gg + "attn_norm.weight", get(hf + "ln_attn.weight"))
            put(gg + "attn_norm.bias", get(hf + "ln_attn.bias"))
            put(gg + "ffn_norm.weight", get(hf + "ln_mlp.weight"))
            put(gg + "ffn_norm.bias", get(hf + "ln_mlp.bias"))
        else:
            put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
            put(gg + "attn_norm.bias", get(hf + "input_layernorm.bias"))
            put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
            put(gg + "ffn_norm.bias", get(hf + "post_attention_layernorm.bias"))
        qkv = get(hf + "self_attention.query_key_value.weight")
        if new:
            n_kv = config.num_kv_heads
            qpg = H // n_kv
            g4 = qkv.reshape(n_kv, qpg + 2, D, E)
            put(gg + "attn_q.weight", g4[:, :qpg].reshape(H * D, E))
            put(gg + "attn_k.weight", g4[:, qpg].reshape(n_kv * D, E))
            put(gg + "attn_v.weight", g4[:, qpg + 1].reshape(n_kv * D, E))
        elif getattr(config, "multi_query", True):
            put(gg + "attn_q.weight", qkv[:E])
            put(gg + "attn_k.weight", qkv[E:E + D])
            put(gg + "attn_v.weight", qkv[E + D:])
        else:
            g4 = qkv.reshape(H, 3, D, E)
            put(gg + "attn_q.weight", g4[:, 0].reshape(H * D, E))
            put(gg + "attn_k.weight", g4[:, 1].reshape(H * D, E))
            put(gg + "attn_v.weight", g4[:, 2].reshape(H * D, E))
        put(gg + "attn_output.weight", get(hf + "self_attention.dense.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.dense_h_to_4h.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.dense_4h_to_h.weight"))


def _convert_dbrx(w, put, get, config):
    """DBRX mapping: flat-packed expert weights (E*F, D) -> (E, ., .),
    straight-split fused Wqkv, biasless LayerNorms, clip_qkv."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.norm_f.weight"))
    if not getattr(config, "tie_word_embeddings", False):
        put("output.weight", get("lm_head.weight"))
    E = config.hidden_size
    fc = config.ffn_config
    n_exp, F = fc.moe_num_experts, fc.ffn_hidden_size
    kvd = E // config.num_attention_heads * config.attn_config.kv_n_heads
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.blocks.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "norm_attn_norm.norm_1.weight"))
        put(gg + "ffn_norm.weight", get(hf + "norm_attn_norm.norm_2.weight"))
        qkv = get(hf + "norm_attn_norm.attn.Wqkv.weight")
        put(gg + "attn_q.weight", qkv[:E])
        put(gg + "attn_k.weight", qkv[E:E + kvd])
        put(gg + "attn_v.weight", qkv[E + kvd:])
        put(gg + "attn_output.weight", get(hf + "norm_attn_norm.attn.out_proj.weight"))
        put(gg + "ffn_gate_inp.weight", get(hf + "ffn.router.layer.weight"))
        w1 = get(hf + "ffn.experts.mlp.w1").reshape(n_exp, F, E)
        v1 = get(hf + "ffn.experts.mlp.v1").reshape(n_exp, F, E)
        w2 = get(hf + "ffn.experts.mlp.w2").reshape(n_exp, F, E)
        put(gg + "ffn_gate_exps.weight", w1)     # (E_exp, F, D) = GGUF layout
        put(gg + "ffn_up_exps.weight", v1)
        put(gg + "ffn_down_exps.weight", w2.transpose(0, 2, 1).copy())


def _convert_bloom(w, put, get, config):
    """BLOOM mapping: embedding LayerNorm, per-head-interleaved fused QKV,
    ALiBi positions (no rope)."""
    put("token_embd.weight", get("transformer.word_embeddings.weight"))
    put("token_embd_norm.weight", get("transformer.word_embeddings_layernorm.weight"))
    put("token_embd_norm.bias", get("transformer.word_embeddings_layernorm.bias"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    H = config.num_attention_heads
    E = config.hidden_size
    D = E // H
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_norm.bias", get(hf + "input_layernorm.bias"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_norm.bias", get(hf + "post_attention_layernorm.bias"))
        qkv = get(hf + "self_attention.query_key_value.weight").reshape(H, 3, D, E)
        qkvb = get(hf + "self_attention.query_key_value.bias").reshape(H, 3, D)
        for i, nm in enumerate(("attn_q", "attn_k", "attn_v")):
            put(gg + nm + ".weight", qkv[:, i].reshape(H * D, E))
            put(gg + nm + ".bias", qkvb[:, i].reshape(H * D))
        put(gg + "attn_output.weight", get(hf + "self_attention.dense.weight"))
        put(gg + "attn_output.bias", get(hf + "self_attention.dense.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.dense_h_to_4h.weight"))
        put(gg + "ffn_up.bias", get(hf + "mlp.dense_h_to_4h.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.dense_4h_to_h.weight"))
        put(gg + "ffn_down.bias", get(hf + "mlp.dense_4h_to_h.bias"))


def _convert_mpt(w, put, get, config):
    """MPT mapping: straight-split fused Wqkv, ALiBi, biasless LayerNorms."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.norm_f.weight"))
    put("output_norm.bias", get("transformer.norm_f.bias"))
    E = config.hidden_size
    n_kv = getattr(config, "num_key_value_heads", None) or config.num_attention_heads
    kvd = E // config.num_attention_heads * n_kv
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.blocks.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "norm_1.weight"))
        put(gg + "attn_norm.bias", get(hf + "norm_1.bias"))
        put(gg + "ffn_norm.weight", get(hf + "norm_2.weight"))
        put(gg + "ffn_norm.bias", get(hf + "norm_2.bias"))
        qkv = get(hf + "attn.Wqkv.weight")               # [q; k; v] straight
        put(gg + "attn_q.weight", qkv[:E])
        put(gg + "attn_k.weight", qkv[E:E + kvd])
        put(gg + "attn_v.weight", qkv[E + kvd:])
        put(gg + "attn_output.weight", get(hf + "attn.out_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "ffn.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "ffn.down_proj.weight"))


def _convert_gptbigcode(w, put, get, config):
    """GPTBigCode / StarCoder mapping (convert_hf_to_gguf StarCoderModel
    counterpart): fused MQA c_attn [q; k; v] with kv width = head_dim,
    learned positions, biased LayerNorms."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("position_embd.weight", get("transformer.wpe.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm)
    E = config.hidden_size
    n_head = config.num_attention_heads
    n_kv = 1 if getattr(config, "multi_query", True) else n_head
    kvd = E // n_head * n_kv
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln_1.bias"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_norm.bias", get(hf + "ln_2.bias"))
        qkv = get(hf + "attn.c_attn.weight")
        qkvb = get(hf + "attn.c_attn.bias")
        put(gg + "attn_q.weight", qkv[:E])
        put(gg + "attn_k.weight", qkv[E:E + kvd])
        put(gg + "attn_v.weight", qkv[E + kvd:])
        put(gg + "attn_q.bias", qkvb[:E])
        put(gg + "attn_k.bias", qkvb[E:E + kvd])
        put(gg + "attn_v.bias", qkvb[E + kvd:])
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight"))
        put(gg + "attn_output.bias", get(hf + "attn.c_proj.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.c_fc.weight"))
        put(gg + "ffn_up.bias", get(hf + "mlp.c_fc.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))
        put(gg + "ffn_down.bias", get(hf + "mlp.c_proj.bias"))


def _convert_lfm2(w, put, get, config):
    """LFM2 hybrid shortconv/attention mapping (convert_hf_to_gguf LFM2Model
    counterpart): conv.conv (E,1,L)→shortconv.conv (E,L); per-head q/k norms;
    the final norm ships as token_embd_norm (llama-arch.cpp:318)."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("token_embd_norm.weight", get("model.embedding_norm.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", False):
        put("output.weight", lm)
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "operator_norm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ffn_norm.weight"))
        conv = get(hf + "conv.conv.weight")
        if conv is not None:                     # shortconv layer
            put(gg + "shortconv.conv.weight", conv[:, 0, :])
            put(gg + "shortconv.in_proj.weight", get(hf + "conv.in_proj.weight"))
            put(gg + "shortconv.out_proj.weight", get(hf + "conv.out_proj.weight"))
        else:                                    # attention layer
            put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
            put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
            put(gg + "attn_output.weight", get(hf + "self_attn.out_proj.weight"))
            put(gg + "attn_q_norm.weight", get(hf + "self_attn.q_layernorm.weight"))
            put(gg + "attn_k_norm.weight", get(hf + "self_attn.k_layernorm.weight"))
        if get(hf + "feed_forward.gate.weight") is not None:  # lfm2moe layer
            put(gg + "ffn_gate_inp.weight", get(hf + "feed_forward.gate.weight"))
            eb = get(hf + "feed_forward.expert_bias")
            if eb is not None:
                put(gg + "exp_probs_b.bias", eb.reshape(-1))
            NE = int(getattr(config, "num_experts", 0))
            ex = _stack_experts(get, hf + "feed_forward.experts.", NE,
                                kinds=("w1", "w2", "w3"))
            put(gg + "ffn_gate_exps.weight", ex["w1"])
            put(gg + "ffn_down_exps.weight", ex["w2"])
            put(gg + "ffn_up_exps.weight", ex["w3"])
        else:
            put(gg + "ffn_gate.weight", get(hf + "feed_forward.w1.weight"))
            put(gg + "ffn_up.weight", get(hf + "feed_forward.w3.weight"))
            put(gg + "ffn_down.weight", get(hf + "feed_forward.w2.weight"))


def _convert_jamba(w, put, get, config, np):
    """Jamba hybrid mamba/attention + periodic MoE mapping (convert_hf_to_gguf
    JambaModel counterpart). GGUF convention: ssm_a = -exp(A_log), suffix-less
    ssm_a/ssm_d names; dt/B/C selection-stream RMS norms."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.final_layernorm.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", False):
        put("output.weight", lm)
    n_expert = int(getattr(config, "num_experts", 0) or 0)
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "pre_ff_layernorm.weight"))
        if get(hf + "mamba.in_proj.weight") is not None:
            put(gg + "ssm_in.weight", get(hf + "mamba.in_proj.weight"))
            put(gg + "ssm_conv1d.weight", get(hf + "mamba.conv1d.weight")[:, 0, :])
            put(gg + "ssm_conv1d.bias", get(hf + "mamba.conv1d.bias"))
            put(gg + "ssm_x.weight", get(hf + "mamba.x_proj.weight"))
            put(gg + "ssm_dt.weight", get(hf + "mamba.dt_proj.weight"))
            put(gg + "ssm_dt.bias", get(hf + "mamba.dt_proj.bias"))
            put(gg + "ssm_dt_norm.weight", get(hf + "mamba.dt_layernorm.weight"))
            put(gg + "ssm_b_norm.weight", get(hf + "mamba.b_layernorm.weight"))
            put(gg + "ssm_c_norm.weight", get(hf + "mamba.c_layernorm.weight"))
            put(gg + "ssm_a", -np.exp(get(hf + "mamba.A_log")))
            put(gg + "ssm_d", get(hf + "mamba.D"))
            put(gg + "ssm_out.weight", get(hf + "mamba.out_proj.weight"))
        else:
            put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
            put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
            put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        if get(hf + "feed_forward.gate_proj.weight") is not None:  # dense
            put(gg + "ffn_gate.weight", get(hf + "feed_forward.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "feed_forward.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "feed_forward.down_proj.weight"))
        else:                                    # MoE layer
            put(gg + "ffn_gate_inp.weight", get(hf + "feed_forward.router.weight"))
            for kind in ("gate", "up", "down"):
                put(gg + f"ffn_{kind}_exps.weight",
                    np.stack([get(hf + f"feed_forward.experts.{e}.{kind}_proj.weight")
                              for e in range(n_expert)]))


def _convert_t5(w, put, get, config):
    """T5/FLAN-T5/MT5 mapping (convert_hf_to_gguf T5Model counterpart):
    enc./dec. namespaces, shared rel-pos bias on block 0, gated
    (wi_0/wi_1) or plain (wi) FFN."""
    put("token_embd.weight", get("shared.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", True):
        put("output.weight", lm)
    put("enc.output_norm.weight", get("encoder.final_layer_norm.weight"))
    put("dec.output_norm.weight", get("decoder.final_layer_norm.weight"))

    def ffn(hf, gg):
        wi = get(hf + "wi.weight")
        if wi is not None:
            put(gg + "ffn_up.weight", wi)
        else:                                   # gated (flan-t5): wi_0 gate
            put(gg + "ffn_gate.weight", get(hf + "wi_0.weight"))
            put(gg + "ffn_up.weight", get(hf + "wi_1.weight"))
        put(gg + "ffn_down.weight", get(hf + "wo.weight"))

    for il in range(config.num_layers):
        hf, gg = f"encoder.block.{il}.layer.", f"enc.blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "0.layer_norm.weight"))
        put(gg + "attn_q.weight", get(hf + "0.SelfAttention.q.weight"))
        put(gg + "attn_k.weight", get(hf + "0.SelfAttention.k.weight"))
        put(gg + "attn_v.weight", get(hf + "0.SelfAttention.v.weight"))
        put(gg + "attn_o.weight", get(hf + "0.SelfAttention.o.weight"))
        put(gg + "attn_rel_b.weight",
            get(hf + "0.SelfAttention.relative_attention_bias.weight"))
        put(gg + "ffn_norm.weight", get(hf + "1.layer_norm.weight"))
        ffn(hf + "1.DenseReluDense.", gg)
    for il in range(getattr(config, "num_decoder_layers", None)
                    or config.num_layers):
        hf, gg = f"decoder.block.{il}.layer.", f"dec.blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "0.layer_norm.weight"))
        put(gg + "attn_q.weight", get(hf + "0.SelfAttention.q.weight"))
        put(gg + "attn_k.weight", get(hf + "0.SelfAttention.k.weight"))
        put(gg + "attn_v.weight", get(hf + "0.SelfAttention.v.weight"))
        put(gg + "attn_o.weight", get(hf + "0.SelfAttention.o.weight"))
        put(gg + "attn_rel_b.weight",
            get(hf + "0.SelfAttention.relative_attention_bias.weight"))
        put(gg + "cross_attn_norm.weight", get(hf + "1.layer_norm.weight"))
        put(gg + "cross_attn_q.weight", get(hf + "1.EncDecAttention.q.weight"))
        put(gg + "cross_attn_k.weight", get(hf + "1.EncDecAttention.k.weight"))
        put(gg + "cross_attn_v.weight", get(hf + "1.EncDecAttention.v.weight"))
        put(gg + "cross_attn_o.weight", get(hf + "1.EncDecAttention.o.weight"))
        put(gg + "ffn_norm.weight", get(hf + "2.layer_norm.weight"))
        ffn(hf + "2.DenseReluDense.", gg)


def _convert_modernbert(w, put, get, config):
    """ModernBERT mapping (convert_hf_to_gguf ModernBertModel counterpart).
    HF marks GLOBAL attention at il % global_attn_every_n_layers == 0; the
    reference's scalar swa pattern would put it at il % n == n-1
    (llama-hparams.cpp:8 dense_first=false), so we write the explicit
    per-layer bool array instead (hparams honor olmo3-style arrays)."""
    arch = "modern-bert"
    n = int(getattr(config, "global_attn_every_n_layers", 3))
    w.add(f"{arch}.attention.sliding_window",
          int(getattr(config, "local_attention", 128)))
    w.add(f"{arch}.attention.sliding_window_pattern",
          [il % n != 0 for il in range(config.num_hidden_layers)])
    if getattr(config, "local_rope_theta", None) is not None:
        w.add(f"{arch}.rope.freq_base_swa", float(config.local_rope_theta))
    w.add(f"{arch}.attention.causal", False)
    pre = "model." if get("model.embeddings.tok_embeddings.weight") is not None else ""
    put("token_embd.weight", get(pre + "embeddings.tok_embeddings.weight"))
    put("token_embd_norm.weight", get(pre + "embeddings.norm.weight"))
    put("output_norm.weight", get(pre + "final_norm.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"{pre}layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "attn_norm.weight"))
        put(gg + "attn_qkv.weight", get(hf + "attn.Wqkv.weight"))
        put(gg + "attn_output.weight", get(hf + "attn.Wo.weight"))
        put(gg + "ffn_norm.weight", get(hf + "mlp_norm.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.Wi.weight"))   # fused GEGLU
        put(gg + "ffn_down.weight", get(hf + "mlp.Wo.weight"))


def _convert_distilbert(w, put, get, config, pre=""):
    """DistilBERT mapping (convert_hf_to_gguf DistilBertModel counterpart):
    bert graph with q_lin/k_lin/v_lin names and no token-type table."""
    put("token_embd.weight", get(pre + "embeddings.word_embeddings.weight"))
    put("position_embd.weight", get(pre + "embeddings.position_embeddings.weight"))
    put("token_embd_norm.weight", get(pre + "embeddings.LayerNorm.weight"))
    put("token_embd_norm.bias", get(pre + "embeddings.LayerNorm.bias"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"{pre}transformer.layer.{il}.", f"blk.{il}."
        for src, dst in (("attention.q_lin", "attn_q"),
                         ("attention.k_lin", "attn_k"),
                         ("attention.v_lin", "attn_v"),
                         ("attention.out_lin", "attn_output"),
                         ("ffn.lin1", "ffn_up"), ("ffn.lin2", "ffn_down")):
            put(gg + dst + ".weight", get(hf + src + ".weight"))
            put(gg + dst + ".bias", get(hf + src + ".bias"))
        put(gg + "attn_output_norm.weight", get(hf + "sa_layer_norm.weight"))
        put(gg + "attn_output_norm.bias", get(hf + "sa_layer_norm.bias"))
        put(gg + "layer_output_norm.weight", get(hf + "output_layer_norm.weight"))
        put(gg + "layer_output_norm.bias", get(hf + "output_layer_norm.bias"))


def _convert_bert(w, put, get, config):
    """BERT encoder mapping (convert_hf_to_gguf BertModel counterpart;
    RobertaModel/XLMRobertaModel ride the same layout with a `roberta.`/bare
    prefix and position rows offset by pad_token_id+1, which we slice off —
    convert_hf_to_gguf.py XLMRobertaModel._position_offset)."""
    for dpre in ("distilbert.", ""):
        if get(dpre + "transformer.layer.0.attention.q_lin.weight") is not None:
            _convert_distilbert(w, put, get, config, dpre)
            return
    pre = ""
    for cand in ("bert.", "roberta.", ""):
        if get(cand + "embeddings.word_embeddings.weight") is not None:
            pre = cand
            break
    put("token_embd.weight", get(pre + "embeddings.word_embeddings.weight"))
    pos = get(pre + "embeddings.position_embeddings.weight")
    archs = getattr(config, "architectures", None) or []
    if any("Roberta" in a for a in archs):
        # roberta position ids start at pad_token_id+1: drop the dead rows
        pos = pos[int(getattr(config, "pad_token_id", 1) or 1) + 1:]
    put("position_embd.weight", pos)
    put("token_types.weight", get(pre + "embeddings.token_type_embeddings.weight"))
    put("token_embd_norm.weight", get(pre + "embeddings.LayerNorm.weight"))
    put("token_embd_norm.bias", get(pre + "embeddings.LayerNorm.bias"))
    # rerank classification head (BertForSequenceClassification)
    put("cls.weight", get(pre + "pooler.dense.weight"))
    put("cls.bias", get(pre + "pooler.dense.bias"))
    put("cls.output.weight", get("classifier.weight"))
    put("cls.output.bias", get("classifier.bias"))
    for il in range(config.num_hidden_layers):
        hf = f"{pre}encoder.layer.{il}."
        gg = f"blk.{il}."
        put(gg + "attn_q.weight", get(hf + "attention.self.query.weight"))
        put(gg + "attn_q.bias", get(hf + "attention.self.query.bias"))
        put(gg + "attn_k.weight", get(hf + "attention.self.key.weight"))
        put(gg + "attn_k.bias", get(hf + "attention.self.key.bias"))
        put(gg + "attn_v.weight", get(hf + "attention.self.value.weight"))
        put(gg + "attn_v.bias", get(hf + "attention.self.value.bias"))
        put(gg + "attn_output.weight", get(hf + "attention.output.dense.weight"))
        put(gg + "attn_output.bias", get(hf + "attention.output.dense.bias"))
        put(gg + "attn_output_norm.weight", get(hf + "attention.output.LayerNorm.weight"))
        put(gg + "attn_output_norm.bias", get(hf + "attention.output.LayerNorm.bias"))
        put(gg + "ffn_up.weight", get(hf + "intermediate.dense.weight"))
        put(gg + "ffn_up.bias", get(hf + "intermediate.dense.bias"))
        put(gg + "ffn_down.weight", get(hf + "output.dense.weight"))
        put(gg + "ffn_down.bias", get(hf + "output.dense.bias"))
        put(gg + "layer_output_norm.weight", get(hf + "output.LayerNorm.weight"))
        put(gg + "layer_output_norm.bias", get(hf + "output.LayerNorm.bias"))


def _convert_internlm2(w, put, get, config):
    """InternLM2 mapping (convert_hf_to_gguf InternLM2Model counterpart):
    model.tok_embeddings / attention.wqkv grouped-interleaved fused qkv
    ((G, q_per_kv+2, D, E): q rows permuted like llama, then k, then v) /
    feed_forward.w1=gate w3=up w2=down."""
    put("token_embd.weight", get("model.tok_embeddings.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("output.weight"))
    E = config.hidden_size
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    D = E // H
    q_per_kv = H // HKV
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "attention_norm.weight"))
        qkv = get(hf + "attention.wqkv.weight")
        qkv = qkv.reshape(HKV, q_per_kv + 2, D, E)
        q = qkv[:, :q_per_kv].reshape(-1, E)
        k = qkv[:, -2].reshape(-1, E)
        v = qkv[:, -1].reshape(-1, E)
        put(gg + "attn_q.weight", permute_qk(q, H))
        put(gg + "attn_k.weight", permute_qk(k, HKV))
        put(gg + "attn_v.weight", v)
        put(gg + "attn_output.weight", get(hf + "attention.wo.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ffn_norm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "feed_forward.w1.weight"))
        put(gg + "ffn_up.weight", get(hf + "feed_forward.w3.weight"))
        put(gg + "ffn_down.weight", get(hf + "feed_forward.w2.weight"))


def _convert_baichuan(w, put, get, config):
    """Baichuan mapping (convert_hf_to_gguf BaichuanModel counterpart):
    llama-style names except the fused self_attn.W_pack [q; k; v] thirds,
    q/k permuted for adjacent-pair rope."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        pack = get(hf + "self_attn.W_pack.weight")
        r = pack.shape[0] // 3
        put(gg + "attn_q.weight", permute_qk(pack[:r], H))
        put(gg + "attn_k.weight", permute_qk(pack[r:2 * r], HKV))
        put(gg + "attn_v.weight", pack[2 * r:])
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_exaone(w, put, get, config):
    """EXAONE-3 mapping (convert_hf_to_gguf ExaoneModel counterpart):
    transformer.h.N.{ln_1,attn.attention.*,ln_2,mlp.c_fc_0/c_fc_1/c_proj};
    no q/k permute (the reference converter passes them through)."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    lm = get("lm_head.weight")
    if lm is not None and not getattr(config, "tie_word_embeddings", False):
        put("output.weight", lm)
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_q.weight", get(hf + "attn.attention.q_proj.weight"))
        put(gg + "attn_k.weight", get(hf + "attn.attention.k_proj.weight"))
        put(gg + "attn_v.weight", get(hf + "attn.attention.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "attn.attention.out_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.c_fc_0.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.c_fc_1.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))


def _convert_qwen1(w, put, get, config):
    """Qwen-1 mapping (convert_hf_to_gguf QwenModel counterpart): the fused
    c_attn [q; k; v] stays fused (GGUF attn_qkv, create_tensors
    llama-model.cpp:3541), mlp.w2=gate w1=up c_proj=down."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_qkv.weight", get(hf + "attn.c_attn.weight"))
        put(gg + "attn_qkv.bias", get(hf + "attn.c_attn.bias"))
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.w2.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.w1.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))


def _convert_jais(w, put, get, config):
    """JAIS mapping (convert_hf_to_gguf JaisModel counterpart): gpt2-style
    Conv1D tensors transposed; muP embedding/output scales folded into the
    weights; ALiBi slopes tensor dropped (max_alibi_bias is metadata);
    fused c_attn kept fused; mlp.c_fc=up, c_fc2=gate."""
    emb_scale = float(getattr(config, "mup_embeddings_scale", None)
                      or getattr(config, "embeddings_scale", 1.0))
    width_scale = 1.0
    if getattr(config, "mup_output_alpha", None) is not None:
        width_scale = (float(config.mup_output_alpha)
                       * float(config.mup_width_scale))
    elif getattr(config, "width_scale", None) is not None:
        width_scale = float(config.width_scale)
    wte = get("transformer.wte.weight")
    put("token_embd.weight", wte * emb_scale)
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    lm = get("lm_head.weight")
    put("output.weight", (lm if lm is not None else wte) * width_scale)
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln_1.bias"))
        put(gg + "attn_qkv.weight", get(hf + "attn.c_attn.weight").T)
        put(gg + "attn_qkv.bias", get(hf + "attn.c_attn.bias"))
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight").T)
        put(gg + "attn_output.bias", get(hf + "attn.c_proj.bias"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_norm.bias", get(hf + "ln_2.bias"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.c_fc2.weight").T)
        put(gg + "ffn_gate.bias", get(hf + "mlp.c_fc2.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.c_fc.weight").T)
        put(gg + "ffn_up.bias", get(hf + "mlp.c_fc.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight").T)
        put(gg + "ffn_down.bias", get(hf + "mlp.c_proj.bias"))


def _convert_chatglm(w, put, get, config):
    """ChatGLM/GLM-3 mapping (convert_hf_to_gguf ChatGLMModel counterpart):
    transformer.encoder.layers.* with fused query_key_value kept fused,
    fused dense_h_to_4h (gate‖up swiglu) kept as ffn_up."""
    emb = get("transformer.embedding.word_embeddings.weight")
    if emb is None:
        emb = get("embedding.word_embeddings.weight")
    put("token_embd.weight", emb)
    for pre in ("transformer.", ""):
        if get(pre + "encoder.final_layernorm.weight") is not None:
            put("output_norm.weight", get(pre + "encoder.final_layernorm.weight"))
            put("output.weight", get(pre + "output_layer.weight"))
            break
    for il in range(config.num_hidden_layers):
        gg = f"blk.{il}."
        hf = None
        for pre in ("transformer.", ""):
            if get(pre + f"encoder.layers.{il}.input_layernorm.weight") is not None:
                hf = pre + f"encoder.layers.{il}."
                break
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_qkv.weight", get(hf + "self_attention.query_key_value.weight"))
        put(gg + "attn_qkv.bias", get(hf + "self_attention.query_key_value.bias"))
        put(gg + "attn_output.weight", get(hf + "self_attention.dense.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.dense_h_to_4h.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.dense_4h_to_h.weight"))


def _convert_codeshell(w, put, get, config):
    """CodeShell mapping (convert_hf_to_gguf CodeShellModel counterpart):
    gpt-bigcode naming with GQA, fused c_attn kept fused (create_tensors
    codeshell uses ATTN_QKV)."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output_norm.bias", get("transformer.ln_f.bias"))
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln_1.bias"))
        put(gg + "attn_qkv.weight", get(hf + "attn.c_attn.weight"))
        put(gg + "attn_qkv.bias", get(hf + "attn.c_attn.bias"))
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight"))
        put(gg + "attn_output.bias", get(hf + "attn.c_proj.bias"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_norm.bias", get(hf + "ln_2.bias"))
        put(gg + "ffn_up.weight", get(hf + "mlp.c_fc.weight"))
        put(gg + "ffn_up.bias", get(hf + "mlp.c_fc.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))
        put(gg + "ffn_down.bias", get(hf + "mlp.c_proj.bias"))


def _stack_experts(get, prefix: str, n_expert: int, kinds=("gate_proj",
                                                           "up_proj",
                                                           "down_proj")):
    """Stack per-expert matrices {prefix}{e}.{kind}.weight → (E, out, in)."""
    out = {}
    for kind in kinds:
        mats = [get(f"{prefix}{e}.{kind}.weight") for e in range(n_expert)]
        if any(m is None for m in mats):
            return None
        out[kind] = np.stack(mats)
    return out


def _convert_arctic(w, put, get, config):
    """Snowflake Arctic mapping (convert_hf_to_gguf ArcticModel counterpart):
    llama names + rope permute; residual_layernorm→ffn_norm and
    post_attention_layernorm→ffn_norm_exps (arch_block_mappings_cfg,
    gguf-py tensor_mapping.py ARCTIC); mixtral-style w1/w2/w3 experts plus
    the parallel residual_mlp dense branch."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    NE = config.num_local_experts
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_q.weight", permute_qk(get(hf + "self_attn.q_proj.weight"), H))
        put(gg + "attn_k.weight", permute_qk(get(hf + "self_attn.k_proj.weight"), HKV))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "residual_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "residual_mlp.w1.weight"))
        put(gg + "ffn_up.weight", get(hf + "residual_mlp.w3.weight"))
        put(gg + "ffn_down.weight", get(hf + "residual_mlp.w2.weight"))
        put(gg + "ffn_norm_exps.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate_inp.weight", get(hf + "block_sparse_moe.gate.weight"))
        ex = _stack_experts(get, hf + "block_sparse_moe.experts.", NE,
                            kinds=("w1", "w2", "w3"))
        put(gg + "ffn_gate_exps.weight", ex["w1"])
        put(gg + "ffn_down_exps.weight", ex["w2"])
        put(gg + "ffn_up_exps.weight", ex["w3"])


def _convert_grok(w, put, get, config):
    """Grok-1 mapping (convert_hf_to_gguf GrokModel counterpart):
    transformer.decoder_layer.* names, rms_norm/_1/_2/_3 = attn/attn-out/
    ffn/post-ffn norms, moe.{x}.linear=gate linear_1=down linear_v=up."""
    put("token_embd.weight", get("transformer.in_out_embed.weight")
        if get("transformer.in_out_embed.weight") is not None
        else get("model.embed_tokens.weight"))
    put("output_norm.weight", get("transformer.rms_norm.weight")
        if get("transformer.rms_norm.weight") is not None
        else get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    NE = config.num_local_experts
    for il in range(config.num_hidden_layers):
        gg = f"blk.{il}."
        hf = f"transformer.decoder_layer.{il}."
        if get(hf + "rms_norm.weight") is None:
            hf = f"model.layers.{il}."  # grok-2 style naming
            put(gg + "attn_norm.weight", get(hf + "pre_attn_norm.weight"))
            put(gg + "attn_output_norm.weight", get(hf + "post_attn_norm.weight"))
            put(gg + "ffn_norm.weight", get(hf + "pre_moe_norm.weight"))
            put(gg + "post_ffw_norm.weight", get(hf + "post_moe_norm.weight"))
            put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
            put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
            put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
            put(gg + "ffn_gate_inp.weight", get(hf + "block_sparse_moe.gate.weight"))
            ex = _stack_experts(get, hf + "block_sparse_moe.experts.", NE,
                                kinds=("w1", "w2", "w3"))
            put(gg + "ffn_gate_exps.weight", ex["w1"])
            put(gg + "ffn_down_exps.weight", ex["w2"])
            put(gg + "ffn_up_exps.weight", ex["w3"])
            continue
        put(gg + "attn_norm.weight", get(hf + "rms_norm.weight"))
        put(gg + "attn_q.weight", get(hf + "multi_head_attention.query.weight"))
        put(gg + "attn_k.weight", get(hf + "multi_head_attention.key.weight"))
        put(gg + "attn_v.weight", get(hf + "multi_head_attention.value.weight"))
        put(gg + "attn_output.weight", get(hf + "multi_head_attention.linear.weight"))
        put(gg + "attn_output_norm.weight", get(hf + "rms_norm_1.weight"))
        put(gg + "ffn_norm.weight", get(hf + "rms_norm_2.weight"))
        put(gg + "post_ffw_norm.weight", get(hf + "rms_norm_3.weight"))
        put(gg + "ffn_gate_inp.weight", get(hf + "router.weight"))
        ex = _stack_experts(get, hf + "moe.", NE,
                            kinds=("linear", "linear_1", "linear_v"))
        put(gg + "ffn_gate_exps.weight", ex["linear"])
        put(gg + "ffn_down_exps.weight", ex["linear_1"])
        put(gg + "ffn_up_exps.weight", ex["linear_v"])


def _chameleon_unshuffle_norm(v: np.ndarray, n_heads: int) -> np.ndarray:
    """ChameleonModel._reverse_hf_permute: row 0 de-interleaved to the
    adjacent-pair rope layout, repeated across heads → (H, D)."""
    d = v.shape[-1]
    row = v.reshape(-1, d)[0]
    row = row.reshape(2, d // 2).T.reshape(-1)
    return np.tile(row, (n_heads, 1))


def _convert_chameleon(w, put, get, config):
    """Chameleon mapping (convert_hf_to_gguf ChameleonModel counterpart):
    llama names + rope permute; per-head q/k LayerNorms de-interleaved and
    broadcast to (H, D); vqmodel image tower skipped."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_q.weight", permute_qk(get(hf + "self_attn.q_proj.weight"), H))
        put(gg + "attn_k.weight", permute_qk(get(hf + "self_attn.k_proj.weight"), HKV))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        for part, n in (("q", H), ("k", HKV)):
            for suf in ("weight", "bias"):
                t = get(hf + f"self_attn.{part}_norm.{suf}")
                if t is not None:
                    put(gg + f"attn_{part}_norm.{suf}",
                        _chameleon_unshuffle_norm(t, n))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_bailingmoe(w, put, get, config):
    """BailingMoe (Ling) mapping (convert_hf_to_gguf BailingMoeModel
    counterpart): model.word_embeddings, fused attention.query_key_value
    split+permuted, attention.dense, per-expert mlp.experts + shared."""
    put("token_embd.weight", get("model.word_embeddings.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    E = config.hidden_size
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    D = getattr(config, "head_dim", None) or E // H
    NE = config.num_experts
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        qkv = get(hf + "attention.query_key_value.weight")
        nq, nk = H * D, HKV * D
        put(gg + "attn_q.weight", permute_qk(qkv[:nq], H))
        put(gg + "attn_k.weight", permute_qk(qkv[nq:nq + nk], HKV))
        put(gg + "attn_v.weight", qkv[nq + nk:])
        put(gg + "attn_output.weight", get(hf + "attention.dense.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate_inp.weight", get(hf + "mlp.gate.weight"))
        ex = _stack_experts(get, hf + "mlp.experts.", NE)
        if ex is not None:
            put(gg + "ffn_gate_exps.weight", ex["gate_proj"])
            put(gg + "ffn_up_exps.weight", ex["up_proj"])
            put(gg + "ffn_down_exps.weight", ex["down_proj"])
            put(gg + "ffn_gate_shexp.weight", get(hf + "mlp.shared_experts.gate_proj.weight"))
            put(gg + "ffn_up_shexp.weight", get(hf + "mlp.shared_experts.up_proj.weight"))
            put(gg + "ffn_down_shexp.weight", get(hf + "mlp.shared_experts.down_proj.weight"))
        else:  # dense lead layer
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_bailingmoe2(w, put, get, config):
    """BailingMoe2 (Ling-2) mapping (BailingMoeV2Model counterpart): fused
    attention.query_key_value KEPT fused, query/key_layernorm per-head
    norms, sigmoid MoE with gate.expert_bias, dense lead layers."""
    put("token_embd.weight", get("model.word_embeddings.weight"))
    fln = get("model.final_layernorm.weight")
    put("output_norm.weight", fln if fln is not None
        else get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    NE = config.num_experts
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_qkv.weight", get(hf + "attention.query_key_value.weight"))
        put(gg + "attn_output.weight", get(hf + "attention.dense.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "attention.query_layernorm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "attention.key_layernorm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        ex = _stack_experts(get, hf + "mlp.experts.", NE)
        if ex is not None:
            put(gg + "ffn_gate_inp.weight", get(hf + "mlp.gate.weight"))
            eb = get(hf + "mlp.gate.expert_bias")
            if eb is not None:
                put(gg + "exp_probs_b.bias", eb.reshape(-1))
            put(gg + "ffn_gate_exps.weight", ex["gate_proj"])
            put(gg + "ffn_up_exps.weight", ex["up_proj"])
            put(gg + "ffn_down_exps.weight", ex["down_proj"])
            put(gg + "ffn_gate_shexp.weight", get(hf + "mlp.shared_experts.gate_proj.weight"))
            put(gg + "ffn_up_shexp.weight", get(hf + "mlp.shared_experts.up_proj.weight"))
            put(gg + "ffn_down_shexp.weight", get(hf + "mlp.shared_experts.down_proj.weight"))
        else:
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_smallthinker(w, put, get, config):
    """SmallThinker mapping (SmallThinkerModel counterpart):
    block_sparse_moe.primary_router + per-expert {gate,up,down}.weight."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    NE = (getattr(config, "num_experts", None)
          or getattr(config, "moe_num_primary_experts", 0))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
        put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate_inp.weight",
            get(hf + "block_sparse_moe.primary_router.weight"))
        ex = _stack_experts(get, hf + "block_sparse_moe.experts.",
                            NE, kinds=("gate", "up", "down"))
        put(gg + "ffn_gate_exps.weight", ex["gate"])
        put(gg + "ffn_up_exps.weight", ex["up"])
        put(gg + "ffn_down_exps.weight", ex["down"])


def _convert_grovemoe(w, put, get, config):
    """GroveMoE mapping (GroveMoeModel counterpart): main expert bank plus
    the adjugate chunk_experts bank; router mlp.gate; unused expert_bias
    dropped."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    NE = config.num_experts
    # experts_per_group hardcoded 2 in modeling_grove_moe.py:298
    NG = int(getattr(config, "experts_per_group", None)
             or getattr(config, "n_group_experts", None) or 2)
    NC = NE // NG
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
        put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "self_attn.q_norm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "self_attn.k_norm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate_inp.weight", get(hf + "mlp.gate.weight"))
        ex = _stack_experts(get, hf + "mlp.experts.", NE)
        put(gg + "ffn_gate_exps.weight", ex["gate_proj"])
        put(gg + "ffn_up_exps.weight", ex["up_proj"])
        put(gg + "ffn_down_exps.weight", ex["down_proj"])
        ch = _stack_experts(get, hf + "mlp.chunk_experts.", NC)
        put(gg + "ffn_gate_chexps.weight", ch["gate_proj"])
        put(gg + "ffn_up_chexps.weight", ch["up_proj"])
        put(gg + "ffn_down_chexps.weight", ch["down_proj"])


def _convert_deci(w, put, get, config):
    """DeciLM / Nemotron-51B mapping (DeciModel counterpart): per-layer
    head counts from block_configs (linear-attention, attention-free and
    FFN-free layer kinds), per-layer rope permute."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    H_arr, HKV_arr = _deci_head_arrays(config)
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        h, hkv = H_arr[il], HKV_arr[il]
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        q = get(hf + "self_attn.q_proj.weight")
        if q is not None:
            put(gg + "attn_q.weight", permute_qk(q, h))
            put(gg + "attn_k.weight",
                permute_qk(get(hf + "self_attn.k_proj.weight"), hkv))
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _deci_ffn_size(mult: float, n_embd: int) -> int:
    n = int(2 * mult * n_embd / 3)
    return n if n % 256 == 0 else n + 256 - (n % 256)


def _deci_head_arrays(config):
    """Per-layer (n_head, n_head_kv) from DeciLM block_configs semantics."""
    H = config.num_attention_heads
    bcs = getattr(config, "block_configs", None)
    if bcs is None:
        L = config.num_hidden_layers
        kv = getattr(config, "num_key_value_heads_per_layer", None)
        if kv is not None:
            return [H] * L, list(kv)
        return [H] * L, [getattr(config, "num_key_value_heads", H)] * L
    H_arr, HKV_arr = [], []
    for bc in bcs:
        att = bc["attention"] if isinstance(bc, dict) else bc.attention
        g = att["n_heads_in_group"] if isinstance(att, dict) else att.n_heads_in_group
        lin = (att["replace_with_linear"] if isinstance(att, dict)
               else att.replace_with_linear)
        if g is None:
            H_arr.append(H if lin else 0)
            HKV_arr.append(0)
        else:
            H_arr.append(H)
            HKV_arr.append(H // g)
    return H_arr, HKV_arr


def _convert_openelm(w, put, get, config):
    """OpenELM mapping (OpenELMModel counterpart): transformer.layers.*,
    fused attn.qkv_proj kept fused, per-head q/k norms, ffn.proj_1 split
    into gate‖up halves, proj_2=down, tied lm head."""
    put("token_embd.weight", get("transformer.token_embeddings.weight"))
    put("output_norm.weight", get("transformer.norm.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "attn_norm.weight"))
        put(gg + "attn_qkv.weight", get(hf + "attn.qkv_proj.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "attn.q_norm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "attn.k_norm.weight"))
        put(gg + "attn_output.weight", get(hf + "attn.out_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ffn_norm.weight"))
        p1 = get(hf + "ffn.proj_1.weight")
        fdim = p1.shape[0] // 2
        put(gg + "ffn_gate.weight", p1[:fdim])
        put(gg + "ffn_up.weight", p1[fdim:])
        put(gg + "ffn_down.weight", get(hf + "ffn.proj_2.weight"))


def _convert_plamo1(w, put, get, config):
    """PLaMo-1 mapping (PlamoModel counterpart): model.layers.layers.*
    double-nested names, parallel attn+FFN, rotary inv_freq dropped."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "norm.weight"))
        put(gg + "attn_q.weight", get(hf + "self_attn.q_proj.weight"))
        put(gg + "attn_k.weight", get(hf + "self_attn.k_proj.weight"))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_afmoe(w, put, get, config):
    """AFMoE mapping (convert_hf_to_gguf AfmoeModel counterpart): dual
    pre/post norms, σ-gated attention (self_attn.gate_proj → attn_gate),
    per-head q/k norms, rope permute (LlamaModel base), sigmoid MoE with
    expert_bias and shared expert, dense lead layers."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    NE = int(getattr(config, "num_experts", 0))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "post_attention_norm.weight",
            get(hf + "post_attention_layernorm.weight"))
        put(gg + "attn_q.weight", permute_qk(get(hf + "self_attn.q_proj.weight"), H))
        put(gg + "attn_k.weight", permute_qk(get(hf + "self_attn.k_proj.weight"), HKV))
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        put(gg + "attn_gate.weight", get(hf + "self_attn.gate_proj.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "self_attn.q_norm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "self_attn.k_norm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "pre_mlp_layernorm.weight"))
        put(gg + "post_ffw_norm.weight", get(hf + "post_mlp_layernorm.weight"))
        if get(hf + "mlp.router.gate.weight") is not None:  # MoE layer
            put(gg + "ffn_gate_inp.weight", get(hf + "mlp.router.gate.weight"))
            eb = get(hf + "mlp.expert_bias")
            if eb is not None:
                put(gg + "exp_probs_b.bias", eb.reshape(-1))
            ex = _stack_experts(get, hf + "mlp.experts.", NE)
            put(gg + "ffn_gate_exps.weight", ex["gate_proj"])
            put(gg + "ffn_up_exps.weight", ex["up_proj"])
            put(gg + "ffn_down_exps.weight", ex["down_proj"])
            for sh in ("mlp.shared_expert.", "mlp.shared_experts."):
                if get(hf + sh + "gate_proj.weight") is not None:
                    put(gg + "ffn_gate_shexp.weight", get(hf + sh + "gate_proj.weight"))
                    put(gg + "ffn_up_shexp.weight", get(hf + sh + "up_proj.weight"))
                    put(gg + "ffn_down_shexp.weight", get(hf + sh + "down_proj.weight"))
                    break
        else:
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_cogvlm(w, put, get, config):
    """CogVLM text-path mapping (convert_hf_to_gguf CogVLMModel
    counterpart): fused language_expert qkv/dense plus the vision-expert
    bank (vis_* GGUF tensors, used by image ubatches)."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "attn_qkv.weight",
            get(hf + "self_attn.language_expert_query_key_value.weight"))
        put(gg + "attn_output.weight",
            get(hf + "self_attn.language_expert_dense.weight"))
        put(gg + "vis_attn_qkv.weight",
            get(hf + "self_attn.vision_expert_query_key_value.weight"))
        put(gg + "vis_attn_output.weight",
            get(hf + "self_attn.vision_expert_dense.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.language_mlp.gate_proj.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.language_mlp.up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.language_mlp.down_proj.weight"))
        put(gg + "vis_gate.weight", get(hf + "mlp.vision_mlp.gate_proj.weight"))
        put(gg + "vis_up.weight", get(hf + "mlp.vision_mlp.up_proj.weight"))
        put(gg + "vis_down.weight", get(hf + "mlp.vision_mlp.down_proj.weight"))


def _convert_refact(w, put, get, config):
    """Refact mapping (convert_hf_to_gguf RefactModel counterpart): MQA with
    fused kv split, gpt2-ish transformer.h naming, LLaMA-rounded FFN."""
    put("token_embd.weight", get("transformer.wte.weight"))
    put("output_norm.weight", get("transformer.ln_f.weight"))
    put("output.weight", get("lm_head.weight"))
    E = getattr(config, "n_embd", None) or config.hidden_size
    H = getattr(config, "n_head", None) or config.num_attention_heads
    D = E // H
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer.h.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "ln_1.weight"))
        put(gg + "attn_q.weight", get(hf + "attn.q.weight"))
        kv = get(hf + "attn.kv.weight")
        put(gg + "attn_k.weight", kv[:D])
        put(gg + "attn_v.weight", kv[D:])
        put(gg + "attn_output.weight", get(hf + "attn.c_proj.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ln_2.weight"))
        put(gg + "ffn_gate.weight", get(hf + "mlp.linear_1.weight"))
        put(gg + "ffn_up.weight", get(hf + "mlp.linear_3.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))


_RWKV6_LERP_ORDER = ("w", "k", "v", "r", "g")


def _convert_rwkv6qwen2(w, put, get, config):
    """RWKV6-in-Qwen2 mapping (convert_hf_to_gguf RWKV6Qwen2Model
    counterpart): qrwkv time mix — low-rank token-shift/decay stacks are
    transposed and their 5 groups reordered rkvwg→wkvrg; the five lerp
    vectors fuse into one (5,1,1,E) tensor; GQA k/v/q(+bias) map onto
    time_mix key/value/receptance."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    E = config.hidden_size
    perm = [3, 1, 2, 0, 4]  # rkvwg → wkvrg (involution)
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.self_attn.", f"blk.{il}."
        put(gg + "attn_norm.weight",
            get(f"model.layers.{il}.input_layernorm.weight"))
        w1 = get(hf + "time_maa_w1").T            # (E,5·ED) → (5·ED,E)
        ed = w1.shape[0] // 5
        w1 = w1.reshape(5, ed, E)[perm].reshape(5 * ed, E)
        put(gg + "time_mix_w1.weight", w1)
        w2 = get(hf + "time_maa_w2")              # (5,ED,E)
        w2 = w2.transpose(0, 2, 1)[perm]          # → (5,E,ED), reordered
        put(gg + "time_mix_w2.weight", w2)
        put(gg + "time_mix_lerp_x.weight",
            get(hf + "time_maa_x").reshape(1, 1, E))
        fused = np.stack([get(hf + f"time_maa_{i}").reshape(1, 1, E)
                          for i in _RWKV6_LERP_ORDER])
        put(gg + "time_mix_lerp_fused.weight", fused)
        put(gg + "time_mix_decay.weight", get(hf + "time_decay").reshape(E))
        put(gg + "time_mix_decay_w1.weight", get(hf + "time_decay_w1").T)
        put(gg + "time_mix_decay_w2.weight", get(hf + "time_decay_w2").T)
        put(gg + "time_mix_key.weight", get(hf + "k_proj.weight"))
        put(gg + "time_mix_key.bias", get(hf + "k_proj.bias"))
        put(gg + "time_mix_value.weight", get(hf + "v_proj.weight"))
        put(gg + "time_mix_value.bias", get(hf + "v_proj.bias"))
        put(gg + "time_mix_receptance.weight", get(hf + "q_proj.weight"))
        put(gg + "time_mix_receptance.bias", get(hf + "q_proj.bias"))
        put(gg + "time_mix_gate.weight", get(hf + "gate.weight"))
        put(gg + "time_mix_output.weight", get(hf + "o_proj.weight"))
        mlp = f"model.layers.{il}.mlp."
        put(gg + "ffn_norm.weight",
            get(f"model.layers.{il}.post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(mlp + "gate_proj.weight"))
        put(gg + "ffn_up.weight", get(mlp + "up_proj.weight"))
        put(gg + "ffn_down.weight", get(mlp + "down_proj.weight"))


def _convert_arwkv7(w, put, get, config):
    """ARWKV-7 mapping (convert_hf_to_gguf ARwkv7Model counterpart): rwkv7
    time mix (w/a/v low-rank stacks transposed, fused x_x lerp reshaped to
    (5,1,1,E), r_k flattened) with a Qwen silu FFN; layer-0 v0/v1/v2 are
    copied from a0/a1/a2 when the checkpoint ships dummies (reference
    behavior) but kept when real."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    put("output.weight", get("lm_head.weight"))
    E = config.hidden_size
    for il in range(config.num_hidden_layers):
        gg = f"blk.{il}."
        at = None
        for cand in (f"model.layers.{il}.self_attn.time_mixer.",
                     f"model.layers.{il}.self_attn.",
                     f"model.layers.{il}.attention."):
            if get(cand + "w0") is not None or get(cand + "w0.weight") is not None:
                at = cand
                break

        def g(name, at=at):
            v = get(at + name)
            return v if v is not None else get(at + name + ".weight")

        put(gg + "attn_norm.weight",
            get(f"model.layers.{il}.input_layernorm.weight"))
        put(gg + "time_mix_w0.weight", g("w0").reshape(E))
        put(gg + "time_mix_w1.weight", g("w1").T)
        put(gg + "time_mix_w2.weight", g("w2").T)
        put(gg + "time_mix_a0.weight", g("a0").reshape(E))
        put(gg + "time_mix_a1.weight", g("a1").T)
        put(gg + "time_mix_a2.weight", g("a2").T)
        v0, v1, v2 = g("v0"), g("v1"), g("v2")
        if il == 0 and v0 is None:  # dummy first-layer v → reuse a (ref)
            v0, v1, v2 = g("a0"), g("a1"), g("a2")
        put(gg + "time_mix_v0.weight", v0.reshape(E))
        put(gg + "time_mix_v1.weight", v1.T)
        put(gg + "time_mix_v2.weight", v2.T)
        put(gg + "time_mix_lerp_fused.weight",
            g("x_x").reshape(5, 1, 1, E))
        put(gg + "time_mix_k_k.weight", g("k_k").reshape(E))
        put(gg + "time_mix_k_a.weight", g("k_a").reshape(E))
        put(gg + "time_mix_r_k.weight", g("r_k").reshape(E))
        put(gg + "time_mix_key.weight", g("key"))
        put(gg + "time_mix_value.weight", g("value"))
        put(gg + "time_mix_receptance.weight", g("receptance"))
        put(gg + "time_mix_output.weight", g("output"))
        mlp = f"model.layers.{il}.mlp."
        put(gg + "ffn_norm.weight",
            get(f"model.layers.{il}.post_attention_layernorm.weight"))
        put(gg + "ffn_gate.weight", get(mlp + "gate_proj.weight"))
        put(gg + "ffn_up.weight", get(mlp + "up_proj.weight"))
        put(gg + "ffn_down.weight", get(mlp + "down_proj.weight"))


def _convert_rwkv6(w, put, get, config):
    """Plain RWKV-6 world mapping (convert_hf_to_gguf Rwkv6Model
    counterpart): HF rwkv.blocks.* names; low-rank token-shift/decay stacks
    transposed, the five time_maa lerp vectors fused to (5,1,1,E) in w/k/v/
    r/g order, time_faaaa kept (H,head_size), and the 2^(il//rescale_every)
    output/value rescale folded into the weights."""
    E = config.hidden_size
    rescale = int(getattr(config, "rescale_every", 0) or 0)
    put("token_embd.weight", get("rwkv.embeddings.weight"))
    put("token_embd_norm.weight", get("rwkv.blocks.0.pre_ln.weight"))
    put("token_embd_norm.bias", get("rwkv.blocks.0.pre_ln.bias"))
    put("output_norm.weight", get("rwkv.ln_out.weight"))
    put("output_norm.bias", get("rwkv.ln_out.bias"))
    put("output.weight", get("head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"rwkv.blocks.{il}.", f"blk.{il}."
        at, fw = hf + "attention.", hf + "feed_forward."
        put(gg + "attn_norm.weight", get(hf + "ln1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln1.bias"))
        put(gg + "attn_norm_2.weight", get(hf + "ln2.weight"))
        put(gg + "attn_norm_2.bias", get(hf + "ln2.bias"))
        put(gg + "time_mix_lerp_x.weight", get(at + "time_maa_x").reshape(E))
        fused = np.stack([get(at + f"time_maa_{i}").reshape(1, E)
                          for i in _RWKV6_LERP_ORDER])          # (5,1,E)
        put(gg + "time_mix_lerp_fused.weight", fused[:, None])  # (5,1,1,E)
        put(gg + "time_mix_w1.weight", get(at + "time_maa_w1").T)
        put(gg + "time_mix_w2.weight",
            get(at + "time_maa_w2").transpose(0, 2, 1))         # (5,E,ED)
        put(gg + "time_mix_first.weight", get(at + "time_faaaa"))
        put(gg + "time_mix_decay.weight", get(at + "time_decay").reshape(E))
        put(gg + "time_mix_decay_w1.weight", get(at + "time_decay_w1").T)
        put(gg + "time_mix_decay_w2.weight", get(at + "time_decay_w2").T)
        scale = 2.0 ** (il // rescale) if rescale > 0 else 1.0
        put(gg + "time_mix_key.weight", get(at + "key.weight"))
        put(gg + "time_mix_value.weight", get(at + "value.weight"))
        put(gg + "time_mix_receptance.weight", get(at + "receptance.weight"))
        put(gg + "time_mix_gate.weight", get(at + "gate.weight"))
        put(gg + "time_mix_output.weight", get(at + "output.weight") / scale)
        put(gg + "time_mix_ln.weight", get(at + "ln_x.weight"))
        put(gg + "time_mix_ln.bias", get(at + "ln_x.bias"))
        put(gg + "channel_mix_lerp_k.weight",
            get(fw + "time_maa_k").reshape(E))
        put(gg + "channel_mix_lerp_r.weight",
            get(fw + "time_maa_r").reshape(E))
        put(gg + "channel_mix_key.weight", get(fw + "key.weight"))
        put(gg + "channel_mix_value.weight", get(fw + "value.weight") / scale)
        put(gg + "channel_mix_receptance.weight",
            get(fw + "receptance.weight"))


_RWKV7_LERP_ORDER = ("r", "w", "k", "v", "a", "g")


def _convert_rwkv7(w, put, get, config):
    """Plain RWKV-7 mapping (convert_hf_to_gguf Rwkv7Model counterpart):
    HF model.layers.N names (official `attention.w1` or fla-hub
    `attn.w_lora.lora.N` low-rank forms), x_r..x_g lerps fused to
    (n,1,1,E) in r/w/k/v/a/g order, layer-0 dummy v0/v1/v2 emitted from
    a0/a1/a2 (reference keeps the loader happy that way), r_k flattened."""
    E = config.hidden_size
    has_gate = bool(getattr(config, "wkv_has_gate", True))
    n_mix = 6 if has_gate else 5
    put("token_embd.weight", get("model.embeddings.weight"))
    pre = ("model.pre_ln." if get("model.pre_ln.weight") is not None
           else "model.layers.0.pre_norm.")
    put("token_embd_norm.weight", get(pre + "weight"))
    put("token_embd_norm.bias", get(pre + "bias"))
    put("output_norm.weight", get("model.ln_out.weight"))
    put("output_norm.bias", get("model.ln_out.bias"))
    head = get("head.weight")
    put("output.weight", head if head is not None else get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.{il}.", f"blk.{il}."
        # official RWKV names attention.*; fla-hub uses attn./time_mixer.
        at = next((c for c in (hf + "attention.", hf + "attn.",
                               hf + "self_attn.time_mixer.")
                   if get(c + "receptance.weight") is not None
                   or get(c + "r_proj.weight") is not None), hf + "attention.")
        lora_t = get(at + "w_lora.lora.0.weight") is None

        def g(n, at=at, lora_t=lora_t):
            """Low-rank pair/bias under either naming; transpose official."""
            v = get(at + n)
            if v is not None:
                return v.T if (lora_t and v.ndim == 2) else v
            stem, idx = n[:-1], n[-1]       # w1 → (w, 1)
            if idx == "0":                  # bias of the second lora linear
                return get(at + f"{stem}_lora.lora.2.bias")
            return get(at + f"{stem}_lora.lora.{0 if idx == '1' else 2}.weight")

        put(gg + "attn_norm.weight", get(hf + "ln1.weight"))
        put(gg + "attn_norm.bias", get(hf + "ln1.bias"))
        ln2 = (hf + "ln2." if get(hf + "ln2.weight") is not None
               else hf + "feed_forward_norm.")
        put(gg + "attn_norm_2.weight", get(ln2 + "weight"))
        put(gg + "attn_norm_2.bias", get(ln2 + "bias"))
        xx = get(at + "x_x")
        if xx is not None:                  # already-fused lerp stack
            put(gg + "time_mix_lerp_fused.weight",
                xx.reshape(n_mix, 1, 1, E))
        else:
            fused = np.stack([get(at + f"x_{i}").reshape(1, 1, E)
                              for i in _RWKV7_LERP_ORDER[:n_mix]])
            put(gg + "time_mix_lerp_fused.weight", fused)
        put(gg + "time_mix_w0.weight", g("w0").reshape(E))
        put(gg + "time_mix_w1.weight", g("w1"))
        put(gg + "time_mix_w2.weight", g("w2"))
        put(gg + "time_mix_a0.weight", g("a0").reshape(E))
        put(gg + "time_mix_a1.weight", g("a1"))
        put(gg + "time_mix_a2.weight", g("a2"))
        v0, v1, v2 = g("v0"), g("v1"), g("v2")
        if il == 0 or v0 is None:           # dummy first-layer v ← a (ref)
            v0, v1, v2 = g("a0"), g("a1"), g("a2")
        put(gg + "time_mix_v0.weight", v0.reshape(E))
        put(gg + "time_mix_v1.weight", v1)
        put(gg + "time_mix_v2.weight", v2)
        if has_gate:
            put(gg + "time_mix_g1.weight", g("g1"))
            put(gg + "time_mix_g2.weight", g("g2"))
        put(gg + "time_mix_k_k.weight", g("k_k").reshape(E))
        put(gg + "time_mix_k_a.weight", g("k_a").reshape(E))
        put(gg + "time_mix_r_k.weight", g("r_k").reshape(-1))
        for nm, cands in (("key", ("key", "k_proj")),
                          ("value", ("value", "v_proj")),
                          ("receptance", ("receptance", "r_proj")),
                          ("output", ("output", "o_proj"))):
            t = next((get(at + c + ".weight") for c in cands
                      if get(at + c + ".weight") is not None), None)
            put(gg + f"time_mix_{nm}.weight", t)
        lnx = (at + "ln_x." if get(at + "ln_x.weight") is not None
               else at + "g_norm.")
        put(gg + "time_mix_ln.weight", get(lnx + "weight"))
        put(gg + "time_mix_ln.bias", get(lnx + "bias"))
        fw = (hf + "feed_forward." if get(hf + "feed_forward.key.weight")
              is not None else hf + "ffn.")
        put(gg + "channel_mix_lerp_k.weight", get(fw + "x_k").reshape(E))
        put(gg + "channel_mix_key.weight", get(fw + "key.weight"))
        put(gg + "channel_mix_value.weight", get(fw + "value.weight"))


def _convert_nomic_bert(w, put, get, config):
    """nomic-bert / nomic-bert-moe mapping (convert_hf_to_gguf
    NomicBertModel counterpart): fused attn.Wqkv, norm1/norm2 post-norms,
    fc11=gate fc12=up fc2=down; MoE layers carry router.layer + stacked
    experts.mlp.w1/w2."""
    put("token_embd.weight", get("embeddings.word_embeddings.weight"))
    put("token_types.weight", get("embeddings.token_type_embeddings.weight"))
    put("token_embd_norm.weight", get("emb_ln.weight"))
    put("token_embd_norm.bias", get("emb_ln.bias"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"encoder.layers.{il}.", f"blk.{il}."
        put(gg + "attn_qkv.weight", get(hf + "attn.Wqkv.weight"))
        put(gg + "attn_qkv.bias", get(hf + "attn.Wqkv.bias"))
        put(gg + "attn_output.weight", get(hf + "attn.out_proj.weight"))
        put(gg + "attn_output_norm.weight", get(hf + "norm1.weight"))
        put(gg + "attn_output_norm.bias", get(hf + "norm1.bias"))
        if get(hf + "mlp.router.layer.weight") is not None:  # moe layer
            put(gg + "ffn_gate_inp.weight", get(hf + "mlp.router.layer.weight"))
            put(gg + "ffn_up_exps.weight", get(hf + "mlp.experts.mlp.w1"))
            put(gg + "ffn_down_exps.weight", get(hf + "mlp.experts.mlp.w2"))
        elif get(hf + "mlp.fc11.weight") is not None:        # gated dense
            put(gg + "ffn_gate.weight", get(hf + "mlp.fc11.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.fc12.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.fc2.weight"))
        else:                                                # gelu-seq dense
            put(gg + "ffn_up.weight", get(hf + "mlp.fc1.weight"))
            put(gg + "ffn_up.bias", get(hf + "mlp.fc1.bias"))
            put(gg + "ffn_down.weight", get(hf + "mlp.fc2.weight"))
            put(gg + "ffn_down.bias", get(hf + "mlp.fc2.bias"))
        put(gg + "layer_output_norm.weight", get(hf + "norm2.weight"))
        put(gg + "layer_output_norm.bias", get(hf + "norm2.bias"))


def _convert_jina_v2(w, put, get, config):
    """jina-bert-v2 mapping (convert_hf_to_gguf JinaBertV2Model
    counterpart): bert-style attention with the extra attn_norm_2 double
    residual, fused GEGLU gated_layers split into gate‖up halves."""
    put("token_embd.weight", get("embeddings.word_embeddings.weight"))
    put("token_types.weight", get("embeddings.token_type_embeddings.weight"))
    put("token_embd_norm.weight", get("embeddings.LayerNorm.weight"))
    put("token_embd_norm.bias", get("embeddings.LayerNorm.bias"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"encoder.layer.{il}.", f"blk.{il}."
        for part, hn in (("q", "query"), ("k", "key"), ("v", "value")):
            put(gg + f"attn_{part}.weight",
                get(hf + f"attention.self.{hn}.weight"))
            put(gg + f"attn_{part}.bias",
                get(hf + f"attention.self.{hn}.bias"))
        put(gg + "attn_output.weight", get(hf + "attention.output.dense.weight"))
        put(gg + "attn_output.bias", get(hf + "attention.output.dense.bias"))
        put(gg + "attn_output_norm.weight",
            get(hf + "attention.output.LayerNorm.weight"))
        put(gg + "attn_output_norm.bias",
            get(hf + "attention.output.LayerNorm.bias"))
        put(gg + "attn_norm_2.weight", get(hf + "mlp.layernorm.weight"))
        put(gg + "attn_norm_2.bias", get(hf + "mlp.layernorm.bias"))
        gl = get(hf + "mlp.gated_layers.weight")
        if gl is not None:                     # fused GEGLU [gate; up]
            fdim = gl.shape[0] // 2
            put(gg + "ffn_gate.weight", gl[:fdim])
            put(gg + "ffn_up.weight", gl[fdim:])
        else:                                  # split variant
            put(gg + "ffn_gate.weight", get(hf + "mlp.gated_layers_w.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.gated_layers_v.weight"))
        put(gg + "ffn_up.bias", get(hf + "mlp.up_gated_layer.bias")
            if get(hf + "mlp.up_gated_layer.bias") is not None
            else get(hf + "mlp.gated_layers.bias"))
        put(gg + "ffn_down.weight", get(hf + "mlp.wo.weight"))
        put(gg + "ffn_down.bias", get(hf + "mlp.wo.bias"))
        put(gg + "layer_output_norm.weight",
            get(hf + "output.LayerNorm.weight"))
        put(gg + "layer_output_norm.bias", get(hf + "output.LayerNorm.bias"))


def _convert_neobert(w, put, get, config):
    """NeoBERT mapping (convert_hf_to_gguf NeoBert counterpart): pre-norm
    RMS, fused qkv, fused SWIGLU w12 kept fused as ffn_up, final
    enc.output_norm from the top-level layer_norm."""
    put("token_embd.weight", get("encoder.weight"))
    put("enc.output_norm.weight", get("layer_norm.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"transformer_encoder.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "attention_norm.weight"))
        put(gg + "attn_qkv.weight", get(hf + "qkv.weight"))
        put(gg + "attn_output.weight", get(hf + "wo.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ffn_norm.weight"))
        put(gg + "ffn_up.weight", get(hf + "ffn.w12.weight"))
        put(gg + "ffn_down.weight", get(hf + "ffn.w3.weight"))


def _convert_plamo3(w, put, get, config):
    """PLaMo-3 mapping (convert_hf_to_gguf Plamo3Model counterpart):
    model.layers.layers.* nesting, zero-centered norms re-centered
    (+1, +1/5, +1/5^1.5 per position), fused qkv kept fused, per-head q/k
    norms, fused SWIGLU gate_up, suffix-less post-norm GGUF names."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight") + 1.0)
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "pre_mixer_norm.weight") + 1.0)
        put(gg + "attn_qkv.weight", get(hf + "mixer.qkv_proj.weight"))
        put(gg + "attn_q_norm.weight", get(hf + "mixer.q_norm.weight") + 1.0)
        put(gg + "attn_k_norm.weight", get(hf + "mixer.k_norm.weight") + 1.0)
        put(gg + "attn_output.weight", get(hf + "mixer.o_proj.weight"))
        put(gg + "post_attention_norm",
            get(hf + "post_mixer_norm.weight") + 1.0 / 5)
        put(gg + "ffn_norm.weight", get(hf + "pre_mlp_norm.weight") + 1.0)
        put(gg + "post_ffw_norm",
            get(hf + "post_mlp_norm.weight") + 1.0 / 5 ** 1.5)
        put(gg + "ffn_up.weight", get(hf + "mlp.gate_up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_plamo2(w, put, get, config):
    """PLaMo-2 mapping (convert_hf_to_gguf Plamo2Model counterpart): hybrid
    mamba/attention; A_log → -exp, conv1d squeezed, dt/B/C stream norms,
    per-head q/k norm planes, same zero-centered norm re-centering."""
    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight") + 1.0)
    put("output.weight", get("lm_head.weight"))
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.layers.layers.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "pre_mixer_norm.weight") + 1.0)
        if get(hf + "mixer.in_proj.weight") is not None:    # mamba layer
            put(gg + "ssm_in.weight", get(hf + "mixer.in_proj.weight"))
            conv = get(hf + "mixer.conv1d.weight")
            put(gg + "ssm_conv1d.weight",
                conv[:, 0, :] if conv.ndim == 3 else conv)
            put(gg + "ssm_x.weight", get(hf + "mixer.bcdt_proj.weight"))
            put(gg + "ssm_dt.weight", get(hf + "mixer.dt_proj.weight"))
            put(gg + "ssm_dt.bias", get(hf + "mixer.dt_bias"))
            put(gg + "ssm_a", -np.exp(get(hf + "mixer.A_log")))
            put(gg + "ssm_d", get(hf + "mixer.D"))
            put(gg + "ssm_out.weight", get(hf + "mixer.out_proj.weight"))
            put(gg + "ssm_dt_norm", get(hf + "mixer.dt_norm_weight"))
            put(gg + "ssm_b_norm", get(hf + "mixer.B_norm_weight"))
            put(gg + "ssm_c_norm", get(hf + "mixer.C_norm_weight"))
        else:                                               # attention layer
            put(gg + "attn_qkv.weight", get(hf + "mixer.qkv_proj.weight"))
            put(gg + "attn_q_norm.weight", get(hf + "mixer.q_weight"))
            put(gg + "attn_k_norm.weight", get(hf + "mixer.k_weight"))
            put(gg + "attn_output.weight", get(hf + "mixer.o_proj.weight"))
        put(gg + "post_attention_norm",
            get(hf + "post_mixer_norm.weight") + 1.0 / 5)
        put(gg + "ffn_norm.weight", get(hf + "pre_mlp_norm.weight") + 1.0)
        put(gg + "post_ffw_norm",
            get(hf + "post_mlp_norm.weight") + 1.0 / 5 ** 1.5)
        put(gg + "ffn_up.weight", get(hf + "mlp.gate_up_proj.weight"))
        put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))


def _convert_llada(w, put, get, config):
    """LLaDA dense mapping (LLaDAModel counterpart): olmo-style
    model.transformer.blocks.* with fused attn/ffn projections split."""
    put("token_embd.weight", get("model.transformer.wte.weight"))
    put("output_norm.weight", get("model.transformer.ln_f.weight"))
    put("output.weight", get("model.transformer.ff_out.weight"))
    E = config.hidden_size
    H = config.num_attention_heads
    HKV = getattr(config, "num_key_value_heads", None) or H
    kvd = E // H * HKV
    for il in range(config.num_hidden_layers):
        hf, gg = f"model.transformer.blocks.{il}.", f"blk.{il}."
        put(gg + "attn_norm.weight", get(hf + "attn_norm.weight"))
        if get(hf + "q_proj.weight") is not None:
            put(gg + "attn_q.weight", get(hf + "q_proj.weight"))
            put(gg + "attn_k.weight", get(hf + "k_proj.weight"))
            put(gg + "attn_v.weight", get(hf + "v_proj.weight"))
        else:
            att = get(hf + "att_proj.weight")   # fused [q;k;v]
            put(gg + "attn_q.weight", att[:E])
            put(gg + "attn_k.weight", att[E:E + kvd])
            put(gg + "attn_v.weight", att[E + kvd:])
        put(gg + "attn_output.weight", get(hf + "attn_out.weight"))
        put(gg + "ffn_norm.weight", get(hf + "ff_norm.weight"))
        if get(hf + "up_proj.weight") is not None:
            put(gg + "ffn_gate.weight", get(hf + "ff_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "up_proj.weight"))
        else:
            ff = get(hf + "ff_proj.weight")     # fused [up;gate] (olmo order)
            fdim = ff.shape[0] // 2
            put(gg + "ffn_up.weight", ff[:fdim])
            put(gg + "ffn_gate.weight", ff[fdim:])
        put(gg + "ffn_down.weight", get(hf + "ff_out.weight"))


def convert_state_dict(
    out_path: str,
    config: Any,
    state_dict: dict[str, np.ndarray],
    ggml_type: GGMLType = GGMLType.F32,
    tokenizer_fields: dict[str, Any] | None = None,
    arch: str | None = None,
) -> None:
    """Write a GGUF from an HF-style config + state dict (numpy arrays)."""
    archs = getattr(config, "architectures", None) or []
    arch = arch or (_ARCH_MAP.get(archs[0]) if archs else None) or "llama"
    if arch == "nomic-bert" and getattr(config, "moe_every_n_layers", 0):
        arch = "nomic-bert-moe"  # same HF class; MoE detected from config
    if getattr(config, "num_hidden_layers", None) is None:
        # exaone (num_layers) / gpt2-family remote configs (n_layer)
        alt = (getattr(config, "num_layers", None)
               or getattr(config, "n_layer", None))
        if alt is not None:
            try:
                config.num_hidden_layers = int(alt)
            except Exception:
                pass

    # multimodal wrappers (qwen-vl / llava / gemma3n-cond): extract the text
    # stack under language_model.* and convert with the text config; the
    # vision/audio towers load separately (tools/mtmd.py)
    if any(k.startswith(("model.text_model.", "text_model.", "thinker."))
           for k in state_dict):
        # SmolVLM/Idefics3 (text_model.) and Qwen2.5-Omni (thinker.)
        # wrappers: strip the prefix, drop the towers, recurse
        tsd = {}
        for k, v in state_dict.items():
            for pre in ("model.text_model.", "text_model.", "thinker."):
                if k.startswith(pre):
                    k2 = k[len(pre):]
                    if not k2.startswith(("vision", "audio", "visual",
                                          "connector.", "talker.",
                                          "token2wav.")):
                        tsd[k2 if k2.startswith(("model.", "lm_head"))
                            else "model." + k2] = v
                    break
            else:
                if not k.startswith(("model.vision_model.", "vision_model.",
                                     "model.connector.", "connector.",
                                     "talker.", "token2wav.")):
                    tsd[k] = v
        tc = getattr(config, "text_config", None) or config
        return convert_state_dict(out_path, tc, tsd, ggml_type,
                                  tokenizer_fields, arch=arch)

    if any(k.startswith(("model.language_model.", "language_model."))
           for k in state_dict):
        tsd = {}
        for k, v in state_dict.items():
            if k.startswith("model.language_model."):
                tsd["model." + k[len("model.language_model."):]] = v
            elif k.startswith("language_model.model."):
                tsd["model." + k[len("language_model.model."):]] = v
            elif k.startswith("language_model.lm_head."):
                tsd["lm_head" + k[len("language_model.lm_head"):]] = v
            elif k.startswith(("model.visual.", "visual.", "vision_tower.",
                               "model.vision_tower.", "multi_modal_projector.",
                               "model.multi_modal_projector.", "audio_tower.",
                               "model.audio_tower.", "model.embed_vision.",
                               "model.embed_audio.")):
                continue
            else:
                tsd[k] = v
        tc = getattr(config, "text_config", None) or config
        return convert_state_dict(out_path, tc, tsd, ggml_type,
                                  tokenizer_fields, arch=arch)

    if arch in ("t5", "t5encoder"):
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")
        w.add(f"{arch}.context_length", int(getattr(config, "n_positions", 512)))
        w.add(f"{arch}.embedding_length", int(config.d_model))
        w.add(f"{arch}.block_count", int(config.num_layers))
        w.add(f"{arch}.decoder_block_count",
              int(getattr(config, "num_decoder_layers", None)
                  or config.num_layers))
        w.add(f"{arch}.feed_forward_length", int(config.d_ff))
        w.add(f"{arch}.attention.head_count", int(config.num_heads))
        w.add(f"{arch}.attention.head_count_kv", int(config.num_heads))
        w.add(f"{arch}.attention.key_length", int(config.d_kv))
        w.add(f"{arch}.attention.value_length", int(config.d_kv))
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "layer_norm_epsilon", 1e-6)))
        w.add(f"{arch}.attention.relative_buckets_count",
              int(config.relative_attention_num_buckets))
        w.add(f"{arch}.decoder_start_token_id",
              int(getattr(config, "decoder_start_token_id", 0) or 0))
        w.add(f"{arch}.vocab_size", int(config.vocab_size))
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)

        def get5(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        def put5(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            t = GGMLType.F32 if arr.ndim == 1 else qtype
            if (arr.ndim >= 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        _convert_t5(w, put5, get5, config)
        w.write()
        return

    if arch in ("rwkv6", "rwkv7"):
        # recurrent wkv archs have no attention head metadata (reference
        # Rwkv6Model/Rwkv7Model set_gguf_parameters writes head_count 0)
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")

        def getc(*names, default=None):
            for n in names:
                v = getattr(config, n, None)
                if v is not None:
                    return v
            return default

        def put_r(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            arr = np.asarray(arr, np.float32)
            t = GGMLType.F32 if arr.ndim != 2 else qtype
            if (arr.ndim == 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        def get_r(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        E = int(getc("hidden_size", "n_embd"))
        L = int(getc("num_hidden_layers", "n_layer", "num_layers"))
        w.add(f"{arch}.context_length", 1048576)   # RWKV: unbounded (ref)
        w.add(f"{arch}.embedding_length", E)
        w.add(f"{arch}.block_count", L)
        w.add(f"{arch}.attention.layer_norm_epsilon",
              float(getc("layer_norm_epsilon", "norm_eps", default=1e-5)))
        w.add(f"{arch}.attention.head_count", 0)   # unused; required by ref
        w.add(f"{arch}.vocab_size", int(config.vocab_size))
        if arch == "rwkv6":
            head_size = int(getc("head_size", "head_dim", default=64))
            w.add(f"{arch}.wkv.head_size", head_size)
            w.add(f"{arch}.rescale_every_n_layers",
                  int(getc("rescale_every", default=0) or 0))
            w.add(f"{arch}.time_mix_extra_dim",
                  int(getc("time_mix_extra_dim",
                           default=64 if E == 4096 else 32)))
            w.add(f"{arch}.time_decay_extra_dim",
                  int(getc("time_decay_extra_dim",
                           default=128 if E == 4096 else 64)))
            w.add(f"{arch}.feed_forward_length",
                  int(getc("intermediate_size",
                           default=int((E * 3.5) // 32 * 32))))
            _convert_rwkv6(w, put_r, get_r, config)
        else:
            head_size = int(getc("head_size", "head_dim", default=64))
            lora = lambda exp, mult: max(1, round(E ** exp * mult / 32)) * 32
            w.add(f"{arch}.wkv.head_size", head_size)
            w.add(f"{arch}.attention.decay_lora_rank",
                  int(getc("lora_rank_decay", "decay_low_rank_dim",
                           default=lora(0.5, 1.8))))
            w.add(f"{arch}.attention.iclr_lora_rank",
                  int(getc("lora_rank_iclr", "a_low_rank_dim",
                           default=lora(0.5, 1.8))))
            w.add(f"{arch}.attention.value_residual_mix_lora_rank",
                  int(getc("lora_rank_value_residual_mix", "v_low_rank_dim",
                           default=lora(0.5, 1.3))))
            w.add(f"{arch}.attention.gate_lora_rank",
                  int(getc("lora_rank_gate", "gate_low_rank_dim",
                           default=lora(0.8, 0.6))))
            w.add(f"{arch}.feed_forward_length",
                  int(getc("intermediate_size", default=E * 4)))
            _convert_rwkv7(w, put_r, get_r, config)
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)
        w.write()
        return

    if arch in ("deci", "openelm"):
        # per-layer head/FFN arrays preclude the generic scalar metadata
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")

        def put_a(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            t = GGMLType.F32 if arr.ndim == 1 else qtype
            if (arr.ndim >= 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        def get_a(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        if arch == "deci":
            E = config.hidden_size
            H = config.num_attention_heads
            D = getattr(config, "head_dim", None) or E // H
            H_arr, HKV_arr = _deci_head_arrays(config)
            F_arr = []
            for bc in getattr(config, "block_configs", []):
                ffn = bc["ffn"] if isinstance(bc, dict) else bc.ffn
                fd = ffn.get("intermediate_size") if isinstance(ffn, dict) \
                    else getattr(ffn, "intermediate_size", None)
                mult = ffn.get("ffn_mult") if isinstance(ffn, dict) \
                    else getattr(ffn, "ffn_mult", None)
                F_arr.append(int(fd) if fd is not None
                             else (_deci_ffn_size(mult, E) if mult else 0))
            w.add(f"{arch}.context_length",
                  int(getattr(config, "max_position_embeddings", 2048)))
            w.add(f"{arch}.embedding_length", E)
            w.add(f"{arch}.block_count", int(config.num_hidden_layers))
            w.add(f"{arch}.feed_forward_length",
                  F_arr or int(getattr(config, "intermediate_size", 4 * E)))
            w.add(f"{arch}.attention.head_count", H_arr)
            w.add(f"{arch}.attention.head_count_kv", HKV_arr)
            w.add(f"{arch}.attention.key_length", D)
            w.add(f"{arch}.attention.value_length", D)
            w.add(f"{arch}.rope.dimension_count", D)
            w.add(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(getattr(config, "rms_norm_eps", 1e-5)))
            w.add(f"{arch}.rope.freq_base",
                  float(getattr(config, "rope_theta", 10000.0)))
            w.add(f"{arch}.vocab_size", int(config.vocab_size))
            _convert_deci(w, put_a, get_a, config)
        else:  # openelm (OpenELMModel counterpart)
            E = int(config.model_dim)
            D = int(config.head_dim)
            H_arr = [int(x) for x in config.num_query_heads]
            HKV_arr = [int(x) for x in config.num_kv_heads]
            div = int(getattr(config, "ffn_dim_divisor", 256))

            def mkdiv(v):
                nv = max(div, int(v + div / 2) // div * div)
                return nv + div if nv < 0.9 * v else nv
            F_arr = [mkdiv(m * E) for m in config.ffn_multipliers]
            L = len(H_arr)
            config.num_hidden_layers = L
            w.add(f"{arch}.context_length",
                  int(getattr(config, "max_context_length", 2048)))
            w.add(f"{arch}.embedding_length", E)
            w.add(f"{arch}.block_count", L)
            w.add(f"{arch}.feed_forward_length", F_arr)
            w.add(f"{arch}.attention.head_count", H_arr)
            w.add(f"{arch}.attention.head_count_kv", HKV_arr)
            w.add(f"{arch}.attention.key_length", D)
            w.add(f"{arch}.attention.value_length", D)
            w.add(f"{arch}.rope.dimension_count", D)
            w.add(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(getattr(config, "rms_norm_eps", None) or 1e-6))
            w.add(f"{arch}.rope.freq_base",
                  float(getattr(config, "rope_freq_constant", 10000.0)))
            w.add(f"{arch}.vocab_size", int(config.vocab_size))
            _convert_openelm(w, put_a, get_a, config)
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)
        w.write()
        return

    if arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v2", "neo-bert"):
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")

        def getc(*names, default=None):
            for n in names:
                v = getattr(config, n, None)
                if v is not None:
                    return v
            return default

        def put_e(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            t = GGMLType.F32 if arr.ndim == 1 else qtype
            if (arr.ndim >= 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        def get_e(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        E = int(getc("hidden_size", "n_embd"))
        H = int(getc("num_attention_heads", "n_head"))
        L = int(getc("num_hidden_layers", "n_layer", "num_layers"))
        F = int(getc("intermediate_size", "n_inner", default=4 * E))
        w.add(f"{arch}.context_length",
              int(getc("max_trained_positions", "max_position_embeddings",
                       default=512)))
        w.add(f"{arch}.embedding_length", E)
        w.add(f"{arch}.block_count", L)
        w.add(f"{arch}.feed_forward_length", F)
        w.add(f"{arch}.attention.head_count", H)
        w.add(f"{arch}.attention.head_count_kv", H)
        w.add(f"{arch}.attention.key_length", E // H)
        w.add(f"{arch}.attention.value_length", E // H)
        w.add(f"{arch}.rope.dimension_count", E // H)
        w.add(f"{arch}.rope.freq_base",
              float(getc("rotary_emb_base", "rope_theta", default=10000.0)))
        w.add(f"{arch}.vocab_size", int(config.vocab_size))
        w.add(f"{arch}.attention.causal", False)
        w.add(f"{arch}.pooling_type", 1)   # mean (the embedding default)
        if arch == "neo-bert":
            w.add(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(getc("norm_eps", "rms_norm_eps", default=1e-5)))
            _convert_neobert(w, put_e, get_e, config)
        else:
            w.add(f"{arch}.attention.layer_norm_epsilon",
                  float(getc("layer_norm_epsilon", "layer_norm_eps",
                             default=1e-12)))
            w.add("tokenizer.ggml.token_type_count",
                  int(getc("type_vocab_size", default=2)))
            if arch == "jina-bert-v2":
                _convert_jina_v2(w, put_e, get_e, config)
            else:
                if arch == "nomic-bert-moe":
                    w.add(f"{arch}.moe_every_n_layers",
                          int(getc("moe_every_n_layers", default=2)))
                    w.add(f"{arch}.expert_count", int(config.num_experts))
                    w.add(f"{arch}.expert_used_count",
                          int(getc("moe_top_k", "num_experts_per_tok",
                                   default=2)))
                _convert_nomic_bert(w, put_e, get_e, config)
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)
        w.write()
        return

    if arch in ("jais", "codeshell", "chatglm"):
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")

        def getc(*names, default=None):
            for n in names:
                v = getattr(config, n, None)
                if v is not None:
                    return v
            return default

        def put_c(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            t = GGMLType.F32 if arr.ndim == 1 else qtype
            if (arr.ndim >= 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        def get_c(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        E = int(getc("hidden_size", "n_embd"))
        H = int(getc("num_attention_heads", "n_head"))
        L = int(getc("num_hidden_layers", "n_layer", "num_layers"))
        w.add(f"{arch}.embedding_length", E)
        w.add(f"{arch}.block_count", L)
        w.add(f"{arch}.attention.head_count", H)
        w.add(f"{arch}.vocab_size", int(config.vocab_size))
        if arch == "jais":
            # JaisModel counterpart: n_inner FFN, biased LNs, ALiBi
            w.add(f"{arch}.context_length", int(getc("n_positions", default=2048)))
            w.add(f"{arch}.feed_forward_length", int(getc("n_inner", default=4 * E)))
            w.add(f"{arch}.attention.head_count_kv", H)
            w.add(f"{arch}.attention.key_length", E // H)
            w.add(f"{arch}.attention.value_length", E // H)
            w.add(f"{arch}.rope.dimension_count", E // H)
            w.add(f"{arch}.rope.freq_base", 10000.0)
            w.add(f"{arch}.attention.layer_norm_epsilon",
                  float(getc("layer_norm_epsilon", default=1e-5)))
            w.add(f"{arch}.attention.max_alibi_bias", 8.0)
            _convert_jais(w, put_c, get_c, config)
        elif arch == "codeshell":
            w.add(f"{arch}.context_length", int(getc("n_positions", default=8192)))
            w.add(f"{arch}.feed_forward_length", int(getc("n_inner", default=4 * E)))
            HKV = int(getc("num_query_groups", "num_key_value_heads", default=H))
            w.add(f"{arch}.attention.head_count_kv", HKV)
            w.add(f"{arch}.attention.key_length", E // H)
            w.add(f"{arch}.attention.value_length", E // H)
            w.add(f"{arch}.rope.dimension_count", E // H)
            w.add(f"{arch}.rope.freq_base", 10000.0)
            w.add(f"{arch}.attention.layer_norm_epsilon",
                  float(getc("layer_norm_epsilon", default=1e-5)))
            _convert_codeshell(w, put_c, get_c, config)
        else:  # chatglm (ChatGLMModel counterpart)
            D = int(getc("attention_dim",
                         default=E // H))
            w.add(f"{arch}.context_length", int(getc("seq_length", default=E)))
            w.add(f"{arch}.feed_forward_length",
                  int(getc("ffn_hidden_size", "intermediate_size",
                           default=4 * E)))
            w.add(f"{arch}.attention.head_count_kv",
                  int(getc("multi_query_group_num", "num_key_value_heads",
                           default=H)))
            w.add(f"{arch}.attention.key_length", D)
            w.add(f"{arch}.attention.value_length", D)
            w.add(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(getc("layernorm_epsilon", default=1e-5)))
            w.add(f"{arch}.rope.dimension_count",
                  int(D * float(getc("partial_rotary_factor", default=0.5))))
            w.add(f"{arch}.rope.freq_base",
                  10000.0 * float(getc("rope_ratio", default=1.0)))
            _convert_chatglm(w, put_c, get_c, config)
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)
        w.write()
        return

    if arch == "plamo2":
        # per-layer mamba/attention pattern precludes the generic metadata
        w = GGUFWriter(out_path, arch=arch)
        w.add("general.name", getattr(config, "name_or_path", "") or "converted")
        E = config.hidden_size
        H = config.num_attention_heads
        HKV = getattr(config, "num_key_value_heads", None) or H
        D = int(getattr(config, "hidden_size_per_head", None)
                or getattr(config, "head_dim", None) or E // H)
        L = int(config.num_hidden_layers)
        step = int(getattr(config, "mamba_step", 2))
        if getattr(config, "mamba_enabled", True):
            kv_arr = []
            for i in range(L):
                is_mamba = ((i != L - 1) if L <= step // 2
                            else (i % step) != (step // 2))
                kv_arr.append(0 if is_mamba else int(HKV))
        else:
            kv_arr = [int(HKV)] * L
        nh = int(getattr(config, "mamba_num_heads", 64))
        w.add(f"{arch}.context_length",
              int(getattr(config, "max_position_embeddings", 2048)))
        w.add(f"{arch}.embedding_length", E)
        w.add(f"{arch}.block_count", L)
        w.add(f"{arch}.feed_forward_length",
              int(getattr(config, "intermediate_size", 4 * E)))
        w.add(f"{arch}.attention.head_count", int(H))
        w.add(f"{arch}.attention.head_count_kv", kv_arr)
        w.add(f"{arch}.attention.key_length", D)
        w.add(f"{arch}.attention.value_length", D)
        w.add(f"{arch}.rope.dimension_count", D)
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "rms_norm_eps", 1e-6)))
        w.add(f"{arch}.rope.freq_base",
              float(getattr(config, "rope_theta", 10000.0)))
        w.add(f"{arch}.vocab_size", int(config.vocab_size))
        w.add(f"{arch}.ssm.state_size",
              int(getattr(config, "mamba_d_state", 64)))
        w.add(f"{arch}.ssm.conv_kernel",
              int(getattr(config, "mamba_d_conv", 4)))
        w.add(f"{arch}.ssm.time_step_rank", nh)
        w.add(f"{arch}.ssm.inner_size", nh * D)
        w.add(f"{arch}.ssm.group_count", 0)

        def put_p(gguf_name, arr, qtype=ggml_type):
            if arr is None:
                return
            t = GGMLType.F32 if arr.ndim == 1 else qtype
            if (arr.ndim >= 2 and arr.shape[-1] % 256 != 0
                    and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16)):
                t = GGMLType.F16
            w.add_tensor(gguf_name, arr, t)

        def get_p(name):
            t = state_dict.get(name)
            return None if t is None else np.asarray(t, dtype=np.float32)

        _convert_plamo2(w, put_p, get_p, config)
        for key, val in (tokenizer_fields or {}).items():
            w.add(key, val)
        w.write()
        return

    n_head = getattr(config, "num_attention_heads", 0)
    n_kv = getattr(config, "num_key_value_heads", None) or n_head
    n_embd = config.hidden_size
    head_dim = (getattr(config, "head_dim", None)
                or getattr(config, "hidden_size_per_head", None)  # plamo3
                or (n_embd // n_head if n_head else 0))
    if arch == "deepseek2":  # MLA: k head = nope + rope dims, v head separate
        head_dim = int(config.qk_nope_head_dim) + int(config.qk_rope_head_dim)
        n_kv = n_head
    if arch == "falcon":
        n_kv = (config.num_kv_heads if getattr(config, "new_decoder_architecture", False)
                else (1 if getattr(config, "multi_query", True) else n_head))
    if arch == "dbrx":
        n_kv = config.attn_config.kv_n_heads
    if arch == "starcoder":
        n_kv = 1 if getattr(config, "multi_query", True) else n_head

    w = GGUFWriter(out_path, arch=arch)
    w.add("general.name", getattr(config, "name_or_path", "") or "converted")
    w.add(f"{arch}.context_length", int(getattr(config, "max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", int(n_embd))
    w.add(f"{arch}.block_count", int(config.num_hidden_layers))
    n_ff = (getattr(config, "intermediate_size", None)
            or getattr(config, "n_inner", None)
            or getattr(getattr(config, "ffn_config", None), "ffn_hidden_size", None)
            or 4 * n_embd)
    if isinstance(n_ff, (list, tuple)):   # per-layer widths (gemma3n)
        n_ff = n_ff[0] if len(set(n_ff)) == 1 else list(map(int, n_ff))
    w.add(f"{arch}.feed_forward_length",
          n_ff if isinstance(n_ff, list) else int(n_ff))
    w.add(f"{arch}.attention.head_count", int(n_head))
    # hybrid stacks carry a per-layer kv-head array (0 = recurrent/conv layer)
    if arch in ("lfm2", "lfm2moe"):
        lt = list(getattr(config, "layer_types", []) or [])
        w.add(f"{arch}.attention.head_count_kv",
              [0 if t == "conv" else int(n_kv) for t in lt])
    elif arch == "jamba":
        per = int(getattr(config, "attn_layer_period", 8))
        off = int(getattr(config, "attn_layer_offset", 4))
        w.add(f"{arch}.attention.head_count_kv",
              [int(n_kv) if il % per == off else 0
               for il in range(config.num_hidden_layers)])
    else:
        w.add(f"{arch}.attention.head_count_kv", int(n_kv))
    if arch == "deepseek2":
        w.add(f"{arch}.attention.key_length", int(head_dim))
        w.add(f"{arch}.attention.value_length", int(config.v_head_dim))
        w.add(f"{arch}.rope.dimension_count", int(config.qk_rope_head_dim))
        if getattr(config, "q_lora_rank", None):
            w.add(f"{arch}.attention.q_lora_rank", int(config.q_lora_rank))
        w.add(f"{arch}.attention.kv_lora_rank", int(config.kv_lora_rank))
        w.add(f"{arch}.leading_dense_block_count", int(getattr(config, "first_k_dense_replace", 0)))
        w.add(f"{arch}.expert_weights_scale", float(getattr(config, "routed_scaling_factor", 1.0)))
        w.add(f"{arch}.expert_shared_count", int(getattr(config, "n_shared_experts", 0) or 0))
    else:
        w.add(f"{arch}.attention.key_length", int(head_dim))
        w.add(f"{arch}.attention.value_length", int(head_dim))
        rot_pct = (getattr(config, "partial_rotary_factor", None)
                   or getattr(config, "rotary_pct", None) or 1.0)
        w.add(f"{arch}.rope.dimension_count", int(head_dim * rot_pct))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon",
          float(getattr(config, "rms_norm_eps", None)
                or getattr(config, "norm_eps", None) or 1e-5))
    ln_eps = (getattr(config, "layer_norm_eps", None)
              or getattr(config, "layer_norm_epsilon", None)
              or getattr(config, "layernorm_epsilon", None))
    if ln_eps:
        w.add(f"{arch}.attention.layer_norm_epsilon", float(ln_eps))
    if arch == "gptneox":
        w.add(f"{arch}.use_parallel_residual",
              bool(getattr(config, "use_parallel_residual", True)))
    if arch == "falcon":
        w.add(f"{arch}.use_parallel_residual",
              bool(getattr(config, "parallel_attn", True)))
    if getattr(config, "logit_scale", None):
        w.add(f"{arch}.logit_scale", float(config.logit_scale))
    if arch == "llama4":
        w.add(f"{arch}.attention.temperature_tuning",
              bool(getattr(config, "attn_temperature_tuning", True)))
        w.add(f"{arch}.attention.floor_scale", float(config.floor_scale))
        w.add(f"{arch}.attention.scale_smooth", float(config.attn_scale))
        w.add(f"{arch}.attention.chunk_size",
              int(getattr(config, "attention_chunk_size", 0) or 0))
        nr = getattr(config, "no_rope_layers", None)
        if nr:  # [1,1,1,0,...] — 0 every Nth; derive the step
            step = nr.index(0) + 1 if 0 in nr else 0
            w.add(f"{arch}.no_rope_layer_step", int(step))
    if getattr(config, "embedding_multiplier", None) and arch != "falcon-h1":
        # falcon-h1 bakes the mup multipliers into the weights instead
        w.add(f"{arch}.embedding_scale", float(config.embedding_multiplier))
    if getattr(config, "residual_multiplier", None):
        w.add(f"{arch}.residual_scale", float(config.residual_multiplier))
    if getattr(config, "attention_multiplier", None):
        w.add(f"{arch}.attention.scale", float(config.attention_multiplier))
    if getattr(config, "logits_scaling", None):
        w.add(f"{arch}.logit_scale", float(config.logits_scaling))
    if arch == "granitemoe":  # router softmaxes over the selected top-k
        w.add(f"{arch}.expert_weights_norm", True)
    clip_qkv = getattr(getattr(config, "attn_config", None), "clip_qkv", None)
    if clip_qkv:
        w.add(f"{arch}.attention.clamp_kqv", float(clip_qkv))
    rope_theta = (getattr(config, "rope_theta", None)
                  or getattr(getattr(config, "attn_config", None), "rope_theta", None)
                  or 10000.0)
    w.add(f"{arch}.rope.freq_base", float(rope_theta))
    w.add(f"{arch}.vocab_size", int(config.vocab_size))
    n_expert = int(getattr(config, "num_local_experts", 0)
                   or getattr(config, "num_experts", 0)
                   or getattr(config, "n_routed_experts", 0)
                   or getattr(config, "moe_num_experts", 0)
                   or getattr(getattr(config, "ffn_config", None), "moe_num_experts", 0) or 0)
    if n_expert:
        w.add(f"{arch}.expert_count", n_expert)
        w.add(f"{arch}.expert_used_count",
              int(getattr(config, "num_experts_per_tok", 0)
                  or getattr(config, "moe_k", 0)            # ernie4_5-moe
                  or getattr(config, "moe_topk", 0)         # hunyuan-moe
                  or getattr(getattr(config, "ffn_config", None), "moe_top_k", 0) or 2))
        moe_ff = (getattr(config, "moe_intermediate_size", None)
                  or getattr(config, "expert_intermediate_size", None)  # llada
                  or getattr(config, "moe_ffn_hidden_size", None))  # smallthinker
        if moe_ff:
            w.add(f"{arch}.expert_feed_forward_length", int(moe_ff))
        if arch == "minimax-m2":  # MiniMaxM2Model: experts are full-width
            w.add(f"{arch}.expert_feed_forward_length",
                  int(config.intermediate_size))
        shared = int(getattr(config, "n_shared_experts", 0)
                     or getattr(config, "moe_num_shared_experts", 0)
                     or getattr(config, "num_shared_expert", 0)
                     or getattr(config, "num_shared_experts", 0) or 0)
        if shared and moe_ff and arch in ("exaone-moe", "bailingmoe2"):
            sh_ff = (getattr(config, "moe_shared_expert_intermediate_size",
                             None) or int(moe_ff) * shared)
            w.add(f"{arch}.expert_shared_feed_forward_length", int(sh_ff))
        if shared and arch != "deepseek2":  # deepseek2 branch writes its own
            w.add(f"{arch}.expert_shared_count", shared)
        dense_lead = (getattr(config, "first_k_dense_replace", None)
                      if arch != "deepseek2" else None)
        if dense_lead is None:
            dense_lead = getattr(config, "moe_layer_start_index", None)  # ernie
        if dense_lead is None:
            dense_lead = getattr(config, "first_last_k_dense_replace", None)  # exaone-moe
        if dense_lead is None:
            dense_lead = getattr(config, "num_dense_layers", None)  # afmoe/lfm2moe
        if dense_lead is not None:
            w.add(f"{arch}.leading_dense_block_count", int(dense_lead))
        if (getattr(config, "routed_scaling_factor", None)
                and arch != "deepseek2"):
            w.add(f"{arch}.expert_weights_scale",
                  float(config.routed_scaling_factor))
        if arch in ("glm4moe", "dots1"):
            # HF routers are DeepseekV3-style sigmoid; config carries no
            # scoring_func attr (Glm4MoeModel converter hardcodes SIGMOID)
            w.add(f"{arch}.expert_gating_func", 2)
        if arch in ("ernie4_5-moe", "hunyuan-moe"):
            # build_moe_ffn called with norm_w=true in both graphs
            w.add(f"{arch}.expert_weights_norm", True)
        if getattr(config, "num_nextn_predict_layers", None) is not None:
            w.add(f"{arch}.nextn_predict_layers",
                  int(config.num_nextn_predict_layers))
        if getattr(config, "norm_topk_prob", None) is not None:
            w.add(f"{arch}.expert_weights_norm", bool(config.norm_topk_prob))
        # deepseek-v3 style routing (convert_hf_to_gguf.py:912-923)
        score_func = (getattr(config, "score_function", None)
                      or getattr(config, "scoring_func", None)
                      or getattr(config, "score_func", None))
        if score_func is not None:
            w.add(f"{arch}.expert_gating_func",
                  2 if score_func == "sigmoid" else 1)
        if getattr(config, "n_group", None):
            w.add(f"{arch}.expert_group_count", int(config.n_group))
        if getattr(config, "topk_group", None):
            w.add(f"{arch}.expert_group_used_count", int(config.topk_group))
    if getattr(config, "sliding_window", None):
        w.add(f"{arch}.attention.sliding_window", int(config.sliding_window))
        lt = getattr(config, "layer_types", None)
        if lt and "sliding_attention" in lt:  # olmo3-style explicit pattern
            w.add(f"{arch}.attention.sliding_window_pattern",
                  [t == "sliding_attention" for t in lt])
    if arch == "apertus":  # per-layer raw xIELU params as KV arrays
        n_layers = config.num_hidden_layers
        for f in ("alpha_n", "alpha_p", "beta", "eps"):
            vals = [float(np.asarray(
                        state_dict[f"model.layers.{i}.mlp.act_fn.{f}"]
                    ).reshape(-1)[0]) for i in range(n_layers)]
            w.add(f"{arch}.xielu.{f}", vals)
    if getattr(config, "query_pre_attn_scalar", None):
        w.add(f"{arch}.attention.scale",
              float(config.query_pre_attn_scalar) ** -0.5)
    if getattr(config, "attn_logit_softcapping", None):
        w.add(f"{arch}.attn_logit_softcapping", float(config.attn_logit_softcapping))
    if getattr(config, "final_logit_softcapping", None):
        w.add(f"{arch}.final_logit_softcapping", float(config.final_logit_softcapping))
    if getattr(config, "rope_local_base_freq", None):  # gemma3 SWA layers
        w.add(f"{arch}.rope.freq_base_swa", float(config.rope_local_base_freq))
    rs = getattr(config, "rope_scaling", None)
    rope_freqs = None
    if rs and rs.get("mrope_section"):
        w.add(f"{arch}.rope.dimension_sections",
              [int(v) for v in rs["mrope_section"]])
    if rs:
        rtype = rs.get("rope_type") or rs.get("type")
        if rtype in ("linear", "yarn"):
            w.add(f"{arch}.rope.scaling.type", rtype)
            w.add(f"{arch}.rope.scaling.factor", float(rs.get("factor", 1.0)))
            if rtype == "yarn":
                w.add(f"{arch}.rope.scaling.original_context_length",
                      int(rs.get("original_max_position_embeddings", 0)))
        elif rtype == "llama3":
            # llama-3.1 wavelength-banded factors → rope_freqs.weight tensor
            # (convert_hf_to_gguf LlamaModel.generate_extra_tensors semantics)
            factor = float(rs.get("factor", 8.0))
            lo_f = float(rs.get("low_freq_factor", 1.0))
            hi_f = float(rs.get("high_freq_factor", 4.0))
            octx = int(rs.get("original_max_position_embeddings", 8192))
            base = float(getattr(config, "rope_theta", 10000.0))
            dims = int(head_dim * (getattr(config, "partial_rotary_factor", None)
                                   or getattr(config, "rotary_pct", None) or 1.0))
            freqs = 1.0 / base ** (np.arange(0, dims, 2, dtype=np.float64) / dims)
            wavelen = 2.0 * np.pi / freqs
            lo_wl, hi_wl = octx / lo_f, octx / hi_f
            smooth = (octx / wavelen - lo_f) / (hi_f - lo_f)
            facs = np.where(
                wavelen < hi_wl, 1.0,
                np.where(wavelen > lo_wl, factor,
                         1.0 / ((1.0 - smooth) / factor + smooth)))
            rope_freqs = facs.astype(np.float32)
    if rope_freqs is not None:
        w.add_tensor("rope_freqs.weight", rope_freqs, GGMLType.F32)
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)

    def get(name):
        t = state_dict.get(name)
        return None if t is None else np.asarray(t, dtype=np.float32)

    def get_norm(name):
        """Gemma stores RMSNorm weights as w with y = x·(1+w): fold the +1."""
        t = get(name)
        if t is not None and arch in _NORM_PLUS_ONE:
            t = t + 1.0
        return t

    def put(gguf_name, arr, qtype=ggml_type):
        if arr is None:
            return
        # 1-D tensors stay f32 (matches ecosystem convention)
        t = GGMLType.F32 if arr.ndim == 1 else qtype
        if arr.ndim >= 2 and arr.shape[-1] % 256 != 0 and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            t = GGMLType.F16  # fall back when rows don't fit superblocks
        w.add_tensor(gguf_name, arr, t)

    if arch == "bert":
        w.add(f"{arch}.attention.layer_norm_epsilon",
              float(getattr(config, "layer_norm_eps", 1e-12)))
        _convert_bert(w, put, get, config)
        w.write()
        return
    if arch == "modern-bert":
        w.add(f"{arch}.attention.layer_norm_epsilon",
              float(getattr(config, "norm_eps", 1e-5)))
        _convert_modernbert(w, put, get, config)
        w.write()
        return
    if arch == "gemma3n":
        import math as _math

        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "rms_norm_eps", 1e-6)))
        w.add(f"{arch}.altup.num_inputs",
              int(getattr(config, "altup_num_inputs", 4)))
        w.add(f"{arch}.altup.active_idx",
              int(getattr(config, "altup_active_idx", 0)))
        w.add(f"{arch}.embedding_length_per_layer_input",
              int(config.hidden_size_per_layer_input))
        w.add(f"{arch}.attention.shared_kv_layers",
              int(getattr(config, "num_kv_shared_layers", 0)))
        w.add(f"{arch}.attention.sliding_window",
              int(getattr(config, "sliding_window", 512)))
        lt = list(getattr(config, "layer_types", []) or [])
        if lt:
            w.add(f"{arch}.attention.sliding_window_pattern",
                  [t == "sliding_attention" for t in lt])
        # icdf(0.95) ≈ 1.64485 per sparse layer (Gemma3NModel converter)
        sp = list(getattr(config, "activation_sparsity_pattern", []) or [])
        if sp:
            from statistics import NormalDist

            w.add(f"{arch}.activation_sparsity_scale",
                  [float(NormalDist().inv_cdf(s)) if s > 0 else 0.0
                   for s in sp])
        if getattr(config, "rope_local_base_freq", None) is not None:
            w.add(f"{arch}.rope.freq_base_swa",
                  float(config.rope_local_base_freq))
        w.add(f"{arch}.final_logit_softcapping",
              float(getattr(config, "final_logit_softcapping", 30.0)))
        _convert_gemma3n(w, put, get, config)
        w.write()
        return
    if arch == "qwen3next":
        w.add(f"{arch}.ssm.conv_kernel", int(config.linear_conv_kernel_dim))
        w.add(f"{arch}.ssm.state_size", int(config.linear_key_head_dim))
        w.add(f"{arch}.ssm.group_count", int(config.linear_num_key_heads))
        w.add(f"{arch}.ssm.time_step_rank", int(config.linear_num_value_heads))
        w.add(f"{arch}.ssm.inner_size",
              int(config.linear_value_head_dim * config.linear_num_value_heads))
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "rms_norm_eps", 1e-6)))
        w.add(f"{arch}.expert_count", int(getattr(config, "num_experts", 0)))
        w.add(f"{arch}.expert_used_count",
              int(getattr(config, "num_experts_per_tok", 0)))
        w.add(f"{arch}.expert_feed_forward_length",
              int(getattr(config, "moe_intermediate_size", 0)))
        w.add(f"{arch}.expert_shared_feed_forward_length",
              int(getattr(config, "shared_expert_intermediate_size", 0)))
        _convert_qwen3next(w, put, get, get_norm, config)
        w.write()
        return
    if arch == "mamba":
        if "FalconMambaForCausalLM" in archs:
            # falcon-mamba: non-parametric RMS on dt/B/C (llama-model.cpp:1438)
            w.add(f"{arch}.ssm.dt_b_c_rms", True)
        w.add(f"{arch}.ssm.conv_kernel", int(config.conv_kernel))
        w.add(f"{arch}.ssm.inner_size", int(config.intermediate_size))
        w.add(f"{arch}.ssm.state_size", int(config.state_size))
        w.add(f"{arch}.ssm.time_step_rank", int(config.time_step_rank))
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "layer_norm_epsilon", 1e-5)))
        _convert_mamba(w, put, get, config)
        w.write()
        return
    if arch == "mamba2":
        di = int(getattr(config, "mamba_d_ssm", None)
                 or getattr(config, "intermediate_size", None)
                 or int(config.expand) * config.hidden_size)
        w.add(f"{arch}.ssm.conv_kernel", int(config.conv_kernel))
        w.add(f"{arch}.ssm.inner_size", di)
        w.add(f"{arch}.ssm.state_size", int(config.state_size))
        # time_step_rank carries n_head for mamba2 (Mamba2Model converter)
        w.add(f"{arch}.ssm.time_step_rank", di // int(config.head_dim))
        w.add(f"{arch}.ssm.group_count", int(getattr(config, "n_groups", 1)))
        w.add(f"{arch}.attention.layer_norm_rms_epsilon",
              float(getattr(config, "layer_norm_epsilon", 1e-5)))
        _convert_mamba2(w, put, get, config)
        w.write()
        return
    if arch == "granitehybrid":
        di = int(getattr(config, "mamba_expand", 2)) * config.hidden_size
        w.add(f"{arch}.ssm.conv_kernel", int(config.mamba_d_conv))
        w.add(f"{arch}.ssm.inner_size", di)
        w.add(f"{arch}.ssm.state_size", int(config.mamba_d_state))
        w.add(f"{arch}.ssm.time_step_rank", int(config.mamba_n_heads))
        w.add(f"{arch}.ssm.group_count", int(config.mamba_n_groups))
        if getattr(config, "num_local_experts", 0):
            # GraniteMoe router: softmax over the selected top-k
            w.add(f"{arch}.expert_weights_norm", True)
        if getattr(config, "shared_intermediate_size", 0):
            w.add(f"{arch}.expert_shared_feed_forward_length",
                  int(config.shared_intermediate_size))
        if "BambaForCausalLM" in (getattr(config, "architectures", None) or []):
            w.add(f"{arch}.rope.scaling.finetuned", True)  # rope on
        _convert_granite_hybrid(w, put, get, config, np)
        w.write()
        return
    if arch == "falcon-h1":
        w.add(f"{arch}.ssm.conv_kernel", int(config.mamba_d_conv))
        w.add(f"{arch}.ssm.inner_size", int(config.mamba_d_ssm))
        w.add(f"{arch}.ssm.state_size", int(config.mamba_d_state))
        w.add(f"{arch}.ssm.time_step_rank", int(config.mamba_n_heads))
        w.add(f"{arch}.ssm.group_count", int(config.mamba_n_groups))
        _convert_falcon_h1(w, put, get, config, np)
        w.write()
        return
    if arch == "gpt2":
        _convert_gpt2(w, put, get, config)
        w.write()
        return
    if arch == "starcoder":
        _convert_gptbigcode(w, put, get, config)
        w.write()
        return
    if arch in ("lfm2", "lfm2moe"):
        w.add(f"{arch}.shortconv.l_cache",
              int(getattr(config, "conv_L_cache", 3)))
        if arch == "lfm2moe":
            # LFM2MoeModel counterpart: sigmoid router, dense lead layers
            w.add(f"{arch}.leading_dense_block_count",
                  int(getattr(config, "num_dense_layers", 0)))
            w.add(f"{arch}.expert_gating_func", 2)
        _convert_lfm2(w, put, get, config)
        w.write()
        return
    if arch == "jamba":
        w.add(f"{arch}.ssm.conv_kernel", int(config.mamba_d_conv))
        w.add(f"{arch}.ssm.inner_size",
              int(getattr(config, "mamba_expand", 2)) * config.hidden_size)
        w.add(f"{arch}.ssm.state_size", int(config.mamba_d_state))
        w.add(f"{arch}.ssm.time_step_rank", int(config.mamba_dt_rank))
        _convert_jamba(w, put, get, config, np)
        w.write()
        return
    if arch == "gptneox":
        _convert_gptneox(w, put, get, config)
        w.write()
        return
    if arch == "falcon":
        _convert_falcon(w, put, get, config)
        w.write()
        return
    if arch == "bloom":
        _convert_bloom(w, put, get, config)
        w.write()
        return
    if arch == "dbrx":
        _convert_dbrx(w, put, get, config)
        w.write()
        return
    if arch == "mpt":
        ac = getattr(config, "attn_config", None)
        w.add(f"{arch}.attention.max_alibi_bias",
              float(getattr(ac, "alibi_bias_max", 8.0) if ac is not None else 8.0))
        _convert_mpt(w, put, get, config)
        w.write()
        return
    if arch == "dream":
        w.add(f"{arch}.attention.causal", False)  # diffusion LM (DreamModel)
    if arch == "gemma-embedding":
        w.add(f"{arch}.pooling_type", 1)   # mean (EmbeddingGemma counterpart)
    if arch in ("llada", "llada-moe", "rnd1"):
        w.add(f"{arch}.attention.causal", False)  # diffusion LMs
    if arch == "chameleon":
        w.add(f"{arch}.swin_norm", bool(getattr(config, "swin_norm", False)))
    if arch == "grok":
        # GrokModel counterpart: softcaps + muP scales (defaults match the
        # reference builder's old-GGUF defaults, llama-model.cpp:795-813)
        w.add(f"{arch}.attn_logit_softcapping",
              float(getattr(config, "attn_logit_softcapping", None) or 30.0))
        w.add(f"{arch}.router_logit_softcapping",
              float(getattr(config, "router_logit_softcapping", None) or 30.0))
        if getattr(config, "final_logit_softcapping", None):
            w.add(f"{arch}.final_logit_softcapping",
                  float(config.final_logit_softcapping))
        rope_dim = (getattr(config, "head_dim", None)
                    or config.hidden_size // config.num_attention_heads)
        w.add(f"{arch}.attention.output_scale",
              float(getattr(config, "attn_output_multiplier", None)
                    or rope_dim ** -0.5))
        if getattr(config, "embedding_multiplier_scale", None):
            w.add(f"{arch}.embedding_scale",
                  float(config.embedding_multiplier_scale))
        if getattr(config, "output_multiplier_scale", None):
            w.add(f"{arch}.logit_scale",
                  float(config.output_multiplier_scale))
    if arch == "minimax-m2":
        w.add(f"{arch}.rope.dimension_count", int(config.rotary_dim))
    if arch == "grovemoe":
        # reference hardcodes these from modeling_grove_moe.py:298-376;
        # honor explicit config keys when present, else the same defaults
        w.add(f"{arch}.expert_chunk_feed_forward_length",
              int(getattr(config, "moe_chunk_intermediate_size", None)
                  or getattr(config, "head_dim", None) or 128))
        w.add(f"{arch}.experts_per_group",
              int(getattr(config, "experts_per_group", None)
                  or getattr(config, "n_group_experts", None) or 2))
        w.add(f"{arch}.expert_group_scale",
              float(getattr(config, "expert_group_scale", None) or 0.05))
    if arch == "smallthinker":
        apply_softmax = getattr(config, "moe_primary_router_apply_softmax",
                                None)
        w.add(f"{arch}.expert_gating_func", 1 if apply_softmax else 2)
        if getattr(config, "sliding_window_size", None) and any(
                getattr(config, "sliding_window_layout", []) or []):
            w.add(f"{arch}.attention.sliding_window",
                  int(config.sliding_window_size))
    if arch == "rwkv6qwen2":
        # RWKV6Qwen2Model counterpart: wkv head size = attention head dim,
        # low-rank token-shift/decay dims from the qwen-rwkv config
        E = config.hidden_size
        w.add(f"{arch}.wkv.head_size", E // config.num_attention_heads)
        w.add(f"{arch}.time_mix_extra_dim",
              int(getattr(config, "lora_rank_tokenshift", None)
                  or (64 if E >= 4096 else 32)))
        w.add(f"{arch}.time_decay_extra_dim",
              int(getattr(config, "lora_rank_decay", None)
                  or (128 if E >= 4096 else 64)))
        w.add(f"{arch}.token_shift_count", 1)
    if arch == "arwkv7":
        # ARwkv7Model counterpart
        w.add(f"{arch}.wkv.head_size", int(config.head_size))
        w.add(f"{arch}.attention.decay_lora_rank",
              int(getattr(config, "lora_rank_decay", None) or 64))
        w.add(f"{arch}.attention.iclr_lora_rank",
              int(getattr(config, "lora_rank_iclr", None) or 64))
        w.add(f"{arch}.attention.value_residual_mix_lora_rank",
              int(getattr(config, "lora_rank_value_residual_mix", None) or 32))
        if getattr(config, "wkv_has_gate", False):
            w.add(f"{arch}.attention.gate_lora_rank",
                  int(getattr(config, "lora_rank_gate", None) or 128))
        w.add(f"{arch}.token_shift_count", 1)
    if arch == "afmoe":
        # AfmoeModel counterpart: route_norm/route_scale, sigmoid router
        if getattr(config, "route_norm", None) is not None:
            w.add(f"{arch}.expert_weights_norm", bool(config.route_norm))
        if getattr(config, "route_scale", None) is not None:
            w.add(f"{arch}.expert_weights_scale", float(config.route_scale))
        w.add(f"{arch}.expert_gating_func", 2)
    if arch == "mimo2":
        # MimoV2Model counterpart: per-layer kv heads from the hybrid
        # sliding-window pattern, separate v head dim, noaux_tc router
        pat = [int(x) for x in getattr(config, "hybrid_layer_pattern", [])]
        kv_full = int(config.num_key_value_heads)
        kv_swa = int(getattr(config, "swa_num_key_value_heads", kv_full))
        w.add(f"{arch}.attention.head_count_kv",
              [kv_swa if p == 1 else kv_full for p in pat])
        w.add(f"{arch}.attention.sliding_window",
              int(getattr(config, "sliding_window", 0) or 0))
        w.add(f"{arch}.attention.sliding_window_pattern",
              [bool(p) for p in pat])
        w.add(f"{arch}.attention.value_length", int(config.v_head_dim))
        if getattr(config, "layernorm_epsilon", None):
            w.add(f"{arch}.attention.layer_norm_rms_epsilon",
                  float(config.layernorm_epsilon))
    if arch in ("plm", "minicpm3"):
        w.add(f"{arch}.attention.kv_lora_rank", int(config.kv_lora_rank))
        if getattr(config, "q_lora_rank", None):
            w.add(f"{arch}.attention.q_lora_rank", int(config.q_lora_rank))
        w.add(f"{arch}.attention.key_length",
              int(config.qk_nope_head_dim) + int(config.qk_rope_head_dim))
        w.add(f"{arch}.attention.value_length", int(config.v_head_dim))
        w.add(f"{arch}.rope.dimension_count", int(config.qk_rope_head_dim))
    if arch == "orion":
        # OrionModel counterpart: config says rms_norm_eps but the model is
        # LayerNorm (modeling_orion.py L570)
        w.add(f"{arch}.attention.layer_norm_epsilon",
              float(getattr(config, "rms_norm_eps", 1e-5)))
    if arch == "olmo":
        w.add(f"{arch}.attention.layer_norm_epsilon", 1e-5)
        if getattr(config, "clip_qkv", None) is not None:
            w.add(f"{arch}.attention.clamp_kqv", float(config.clip_qkv))
    if arch == "minicpm":
        # muP scalings (MiniCPMModel counterpart)
        if getattr(config, "scale_emb", None):
            w.add(f"{arch}.embedding_scale", float(config.scale_emb))
        if getattr(config, "scale_depth", None):
            w.add(f"{arch}.residual_scale",
                  float(config.scale_depth) / config.num_hidden_layers ** 0.5)
        if getattr(config, "dim_model_base", None):
            w.add(f"{arch}.logit_scale",
                  float(config.hidden_size) / float(config.dim_model_base))
    if arch in ("deepseek", "bailingmoe") and not getattr(
            config, "routed_scaling_factor", None):
        # Deepseek/BailingMoe converters hardcode expert_weights_scale 1.0
        w.add(f"{arch}.expert_weights_scale", 1.0)
    if arch == "internlm2":
        _convert_internlm2(w, put, get, config)
        w.write()
        return
    if arch == "baichuan":
        _convert_baichuan(w, put, get, config)
        w.write()
        return
    if arch == "exaone":
        _convert_exaone(w, put, get, config)
        w.write()
        return
    if arch == "qwen":
        _convert_qwen1(w, put, get, config)
        w.write()
        return
    if arch == "arctic":
        _convert_arctic(w, put, get, config)
        w.write()
        return
    if arch == "grok":
        _convert_grok(w, put, get, config)
        w.write()
        return
    if arch == "chameleon":
        _convert_chameleon(w, put, get, config)
        w.write()
        return
    if arch == "bailingmoe":
        _convert_bailingmoe(w, put, get, config)
        w.write()
        return
    if arch == "bailingmoe2":
        _convert_bailingmoe2(w, put, get, config)
        w.write()
        return
    if arch == "smallthinker":
        _convert_smallthinker(w, put, get, config)
        w.write()
        return
    if arch == "grovemoe":
        _convert_grovemoe(w, put, get, config)
        w.write()
        return
    if arch == "plamo":
        _convert_plamo1(w, put, get, config)
        w.write()
        return
    if arch == "llada":
        _convert_llada(w, put, get, config)
        w.write()
        return
    if arch == "cogvlm":
        _convert_cogvlm(w, put, get, config)
        w.write()
        return
    if arch == "afmoe":
        _convert_afmoe(w, put, get, config)
        w.write()
        return
    if arch == "refact":
        _convert_refact(w, put, get, config)
        w.write()
        return
    if arch == "rwkv6qwen2":
        _convert_rwkv6qwen2(w, put, get, config)
        w.write()
        return
    if arch == "arwkv7":
        _convert_arwkv7(w, put, get, config)
        w.write()
        return
    if arch == "plamo3":
        _convert_plamo3(w, put, get, config)
        w.write()
        return

    put("token_embd.weight", get("model.embed_tokens.weight"))
    fln = get("model.final_layernorm.weight")          # phi2-style final LN
    if fln is not None:
        put("output_norm.weight", fln)
        put("output_norm.bias", get("model.final_layernorm.bias"))
    else:
        put("output_norm.weight", get_norm("model.norm.weight"))
        put("output_norm.bias", get("model.norm.bias"))
    lm_head = get("lm_head.weight")
    if lm_head is not None and not getattr(config, "tie_word_embeddings", False):
        put("output.weight", lm_head)
        put("output.bias", get("lm_head.bias"))

    for il in range(config.num_hidden_layers):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        if arch in ("deepseek2", "minicpm3", "plm"):
            # shared MLA tensor layout (q LoRA optional, kv latent + mqa)
            _put_deepseek2_layer(put, get, hf, gg, config, n_expert)
            continue
        q = get(hf + "self_attn.q_proj.weight")
        k = get(hf + "self_attn.k_proj.weight")
        if q is None and get(hf + "self_attn.qkv_proj.weight") is not None:
            qkv = get(hf + "self_attn.qkv_proj.weight")  # phi3/ernie fused
            nq, nk = n_head * head_dim, n_kv * head_dim
            q, k = qkv[:nq], qkv[nq:nq + nk]
            put(gg + "attn_v.weight", qkv[nq + nk:])
            bqkv = get(hf + "self_attn.qkv_proj.bias")
            if bqkv is not None:
                put(gg + "attn_q.bias", bqkv[:nq])
                put(gg + "attn_k.bias", bqkv[nq:nq + nk])
                put(gg + "attn_v.bias", bqkv[nq + nk:])
        else:
            put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        if arch in _PERMUTE_QK:  # adjacent-pair rope layout needs permuted q/k
            q = permute_qk(q, n_head)
            k = permute_qk(k, n_kv)
        put(gg + "attn_q.weight", q)
        put(gg + "attn_k.weight", k)
        o_proj = get(hf + "self_attn.o_proj.weight")
        if o_proj is None:                               # phi2 names it dense
            o_proj = get(hf + "self_attn.dense.weight")
            put(gg + "attn_output.bias", get(hf + "self_attn.dense.bias"))
        put(gg + "attn_output.weight", o_proj)
        for bias_hf, bias_gg in (
            ("self_attn.q_proj.bias", "attn_q.bias"),
            ("self_attn.k_proj.bias", "attn_k.bias"),
            ("self_attn.v_proj.bias", "attn_v.bias"),
            ("self_attn.o_proj.bias", "attn_output.bias"),
        ):
            put(gg + bias_gg, get(hf + bias_hf))
        put(gg + "attn_q_norm.weight",
            get_norm(hf + "self_attn.q_norm.weight")
            if get(hf + "self_attn.q_norm.weight") is not None
            else get_norm(hf + "self_attn.query_layernorm.weight"))  # hunyuan
        put(gg + "attn_k_norm.weight",
            get_norm(hf + "self_attn.k_norm.weight")
            if get(hf + "self_attn.k_norm.weight") is not None
            else get_norm(hf + "self_attn.key_layernorm.weight"))
        put(gg + "attn_norm.weight",
            get_norm(hf + "input_layernorm.weight")
            if get(hf + "input_layernorm.weight") is not None
            else get_norm(hf + "attention_layernorm.weight"))   # apertus
        put(gg + "attn_norm.bias", get(hf + "input_layernorm.bias"))
        put(gg + "attn_sinks.weight",
            get(hf + "self_attn.sinks")
            if get(hf + "self_attn.sinks") is not None
            else get(hf + "self_attn.attention_sink_bias"))  # mimo2
        # bitnet sub-norms (pre-out-projection / pre-down-projection RMS)
        put(gg + "attn_sub_norm.weight", get(hf + "self_attn.attn_sub_norm.weight"))
        put(gg + "ffn_sub_norm.weight", get(hf + "mlp.ffn_sub_norm.weight"))
        # norm wiring differs: gemma has pre+post norms around both blocks;
        # olmo2 has post-norms only (no input norms); glm4 has sandwich norms
        if get(hf + "post_self_attn_layernorm.weight") is not None:  # glm4
            put(gg + "post_attention_norm.weight", get_norm(hf + "post_self_attn_layernorm.weight"))
            put(gg + "ffn_norm.weight", get_norm(hf + "post_attention_layernorm.weight"))
            put(gg + "post_ffw_norm.weight", get_norm(hf + "post_mlp_layernorm.weight"))
        elif arch in ("olmo2", "exaone4"):  # post-norm blocks
            put(gg + "post_attention_norm.weight", get_norm(hf + "post_attention_layernorm.weight"))
            put(gg + "post_ffw_norm.weight", get_norm(hf + "post_feedforward_layernorm.weight"))
        elif get(hf + "pre_feedforward_layernorm.weight") is not None:  # gemma
            put(gg + "post_attention_norm.weight", get_norm(hf + "post_attention_layernorm.weight"))
            put(gg + "ffn_norm.weight", get_norm(hf + "pre_feedforward_layernorm.weight"))
            put(gg + "post_ffw_norm.weight", get_norm(hf + "post_feedforward_layernorm.weight"))
        else:
            put(gg + "ffn_norm.weight",
                get_norm(hf + "post_attention_layernorm.weight")
                if get(hf + "post_attention_layernorm.weight") is not None
                else get_norm(hf + "feedforward_layernorm.weight"))  # apertus
            put(gg + "ffn_norm.bias", get(hf + "post_attention_layernorm.bias"))

        if get(hf + "feed_forward.router.weight") is not None:   # llama4 MoE
            put(gg + "ffn_gate_inp.weight", get(hf + "feed_forward.router.weight"))
            gu = get(hf + "feed_forward.experts.gate_up_proj")   # (E, in, 2f)
            fdim = gu.shape[-1] // 2
            put(gg + "ffn_gate_exps.weight", gu[..., :fdim].transpose(0, 2, 1))
            put(gg + "ffn_up_exps.weight", gu[..., fdim:].transpose(0, 2, 1))
            dn = get(hf + "feed_forward.experts.down_proj")      # (E, f, out)
            put(gg + "ffn_down_exps.weight", dn.transpose(0, 2, 1))
            put(gg + "ffn_up_shexp.weight", get(hf + "feed_forward.shared_expert.up_proj.weight"))
            put(gg + "ffn_gate_shexp.weight", get(hf + "feed_forward.shared_expert.gate_proj.weight"))
            put(gg + "ffn_down_shexp.weight", get(hf + "feed_forward.shared_expert.down_proj.weight"))
        elif get(hf + "feed_forward.gate_proj.weight") is not None:  # llama4 dense
            put(gg + "ffn_gate.weight", get(hf + "feed_forward.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "feed_forward.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "feed_forward.down_proj.weight"))
        elif get(hf + "block_sparse_moe.input_linear.weight") is not None:
            # granitemoe fused expert gate|up + shared expert
            _put_granite_moe_ffn(put, get, hf, gg, config, np)
        elif get(hf + "block_sparse_moe.gate.weight") is not None:  # mixtral
            put(gg + "ffn_gate_inp.weight", get(hf + "block_sparse_moe.gate.weight"))
            eb = get(hf + "block_sparse_moe.e_score_correction_bias")  # minimax-m2
            if eb is None:
                eb = get(hf + "block_sparse_moe.e_score_correction.bias")
            if eb is not None:
                put(gg + "exp_probs_b.bias", eb.reshape(-1))
            w1 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w1.weight") for e in range(n_expert)])
            w2 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w2.weight") for e in range(n_expert)])
            w3 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w3.weight") for e in range(n_expert)])
            put(gg + "ffn_gate_exps.weight", w1)
            put(gg + "ffn_down_exps.weight", w2)
            put(gg + "ffn_up_exps.weight", w3)
        elif get(hf + "mlp.router.weight") is not None:  # gpt-oss
            put(gg + "ffn_gate_inp.weight", get(hf + "mlp.router.weight"))
            put(gg + "ffn_gate_inp.bias", get(hf + "mlp.router.bias"))
            gate_up = get(hf + "mlp.experts.gate_up_proj")      # (E, in, 2F) interleaved
            gub = get(hf + "mlp.experts.gate_up_proj_bias")     # (E, 2F)
            down = get(hf + "mlp.experts.down_proj")            # (E, F, out)
            # GGUF expert weights are (E, out, in): transpose HF's (E, in, out)
            put(gg + "ffn_gate_exps.weight", gate_up[..., 0::2].transpose(0, 2, 1))
            put(gg + "ffn_up_exps.weight", gate_up[..., 1::2].transpose(0, 2, 1))
            put(gg + "ffn_gate_exps.bias", gub[..., 0::2])
            put(gg + "ffn_up_exps.bias", gub[..., 1::2])
            put(gg + "ffn_down_exps.weight", down.transpose(0, 2, 1))
            put(gg + "ffn_down_exps.bias", get(hf + "mlp.experts.down_proj_bias"))
        elif get(hf + "mlp.gate_up_proj.weight") is not None:  # phi3 fused
            gu = get(hf + "mlp.gate_up_proj.weight")            # (2F, in)
            F = gu.shape[0] // 2
            put(gg + "ffn_gate.weight", gu[:F])
            put(gg + "ffn_up.weight", gu[F:])
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))
        elif get(hf + "mlp.experts.0.gate_proj.weight") is not None:
            # per-expert proj MoE: qwen-moe / glm4moe / dots1 / ernie / hunyuan
            put(gg + "ffn_gate_inp.weight",
                get(hf + "mlp.gate.weight")
                if get(hf + "mlp.gate.weight") is not None
                else get(hf + "mlp.gate.wg.weight"))            # hunyuan
            eb = None
            for cand in ("mlp.gate.e_score_correction_bias",   # glm4/dots1
                         "mlp.moe_statics.e_score_correction_bias",  # ernie
                         "mlp.e_score_correction_bias",        # exaone-moe
                         "mlp.e_score_correction"):            # fla naming
                if get(hf + cand) is not None:
                    eb = get(hf + cand)
                    break
            if eb is not None:
                put(gg + "exp_probs_b.bias", eb.reshape(-1))    # ernie (1,E)
            for kind in ("gate", "up", "down"):
                stack = np.stack([get(hf + f"mlp.experts.{e}.{kind}_proj.weight")
                                  for e in range(n_expert)])
                put(gg + f"ffn_{kind}_exps.weight", stack)
            for sh in ("mlp.shared_expert.", "mlp.shared_experts.",
                       "mlp.shared_mlp."):
                if get(hf + sh + "gate_proj.weight") is not None:
                    put(gg + "ffn_gate_shexp.weight", get(hf + sh + "gate_proj.weight"))
                    put(gg + "ffn_up_shexp.weight", get(hf + sh + "up_proj.weight"))
                    put(gg + "ffn_down_shexp.weight", get(hf + sh + "down_proj.weight"))
                    break
            put(gg + "ffn_gate_inp_shexp.weight",
                get(hf + "mlp.shared_expert_gate.weight"))      # qwen2moe
        elif get(hf + "mlp.fc1.weight") is not None:    # phi2 dense mlp
            put(gg + "ffn_up.weight", get(hf + "mlp.fc1.weight"))
            put(gg + "ffn_up.bias", get(hf + "mlp.fc1.bias"))
            put(gg + "ffn_down.weight", get(hf + "mlp.fc2.weight"))
            put(gg + "ffn_down.bias", get(hf + "mlp.fc2.bias"))
        elif get(hf + "mlp.c_fc.weight") is not None:   # starcoder2
            put(gg + "ffn_up.weight", get(hf + "mlp.c_fc.weight"))
            put(gg + "ffn_up.bias", get(hf + "mlp.c_fc.bias"))
            put(gg + "ffn_down.weight", get(hf + "mlp.c_proj.weight"))
            put(gg + "ffn_down.bias", get(hf + "mlp.c_proj.bias"))
        else:
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))
    w.write()


# --------------------------------------------------------------------- CLI

def _parse_spm_model(path: str) -> dict:
    """Minimal sentencepiece ModelProto reader (no sentencepiece dep):
    repeated field 1 = SentencePiece{1: piece, 2: score, 3: type} — enough
    for tokenizer.ggml.{tokens,scores,token_type} (gguf-py vocab.py
    SentencePieceVocab counterpart)."""
    import struct as _struct

    data = open(path, "rb").read()

    def read_varint(buf, i):
        val, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    tokens, scores, types = [], [], []
    i = 0
    while i < len(data):
        tag, i = read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:       # SentencePiece submessage
            ln, i = read_varint(data, i)
            sub, end = data[i:i + ln], i + ln
            piece, score, ptype = b"", 0.0, 1
            j = 0
            while j < len(sub):
                t2, j = read_varint(sub, j)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    l2, j = read_varint(sub, j)
                    piece = sub[j:j + l2]
                    j += l2
                elif f2 == 2 and w2 == 5:
                    score = _struct.unpack("<f", sub[j:j + 4])[0]
                    j += 4
                elif f2 == 3 and w2 == 0:
                    ptype, j = read_varint(sub, j)
                else:                       # skip unknown
                    if w2 == 0:
                        _, j = read_varint(sub, j)
                    elif w2 == 2:
                        l2, j = read_varint(sub, j)
                        j += l2
                    elif w2 == 5:
                        j += 4
                    else:
                        j += 8
            tokens.append(piece.decode("utf-8", errors="replace"))
            scores.append(score)
            types.append({1: 1, 2: 2, 3: 3, 4: 4, 6: 6}.get(ptype, 1))
            i = end
        elif wire == 2:
            ln, i = read_varint(data, i)
            i += ln
        elif wire == 0:
            _, i = read_varint(data, i)
        elif wire == 5:
            i += 4
        else:
            i += 8
    return {"tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.scores": [float(s) for s in scores],
            "tokenizer.ggml.token_type": types}


def _tokenizer_fields_from_dir(model_dir) -> dict:
    """Extract tokenizer.ggml.* KVs from an HF checkpoint directory
    (convert_hf_to_gguf set_vocab counterpart: SPM via tokenizer.model,
    BPE via tokenizer.json)."""
    import json as _json
    from pathlib import Path as _P

    d = _P(model_dir)
    fields: dict = {}
    if (d / "tokenizer.model").exists():
        fields = _parse_spm_model(str(d / "tokenizer.model"))
    elif (d / "tokenizer.json").exists():
        tj = _json.loads((d / "tokenizer.json").read_text())
        model = tj.get("model", {})
        vocab = model.get("vocab", {})
        ordered = sorted(vocab.items(), key=lambda kv: kv[1])
        tokens = [t for t, _ in ordered]
        types = [1] * len(tokens)
        for at in tj.get("added_tokens", []):
            tid = at.get("id")
            if tid is not None:
                while tid >= len(tokens):
                    tokens.append("")
                    types.append(1)
                tokens[tid] = at["content"]
                types[tid] = 3 if at.get("special") else 4
        merges = model.get("merges", [])
        merges = [" ".join(m) if isinstance(m, (list, tuple)) else m
                  for m in merges]
        fields = {"tokenizer.ggml.model": "gpt2",
                  "tokenizer.ggml.pre": "default",   # refined by caller
                  "tokenizer.ggml.tokens": tokens,
                  "tokenizer.ggml.token_type": types,
                  "tokenizer.ggml.merges": merges}
    # special ids from tokenizer_config / config
    cfgs = {}
    for name in ("tokenizer_config.json", "config.json",
                 "generation_config.json"):
        p = d / name
        if p.exists():
            try:
                cfgs[name] = _json.loads(p.read_text())
            except _json.JSONDecodeError:
                pass
    tok_index = {t: i for i, t in
                 enumerate(fields.get("tokenizer.ggml.tokens", []))}

    def resolve(val):
        if isinstance(val, dict):
            val = val.get("content")
        if isinstance(val, str):
            return tok_index.get(val)
        if isinstance(val, list):
            val = val[0] if val else None
        return val if isinstance(val, int) else None

    for key, names in (("bos_token_id", "bos"), ("eos_token_id", "eos"),
                       ("pad_token_id", "padding"), ("unk_token_id", "unknown")):
        for src in ("generation_config.json", "config.json",
                    "tokenizer_config.json"):
            v = resolve(cfgs.get(src, {}).get(key))
            if v is None and src == "tokenizer_config.json":
                v = resolve(cfgs[src].get(key.replace("_id", "")) if src in cfgs else None)
            if v is not None:
                fields[f"tokenizer.ggml.{names}_token_id"] = int(v)
                break
    return fields


def _load_state_dict_dir(model_dir) -> dict:
    """All tensors from *.safetensors (preferred) or pytorch bin shards."""
    from pathlib import Path as _P

    d = _P(model_dir)
    sd: dict = {}
    st_files = sorted(d.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="np") as r:
                for k in r.keys():
                    t = r.get_tensor(k)
                    if t.dtype.kind not in "fiu":   # bf16 → f32
                        t = t.astype(np.float32)
                    sd[k] = t
        return sd
    for f in sorted(d.glob("pytorch_model*.bin")):
        import torch

        for k, v in torch.load(str(f), map_location="cpu",
                               weights_only=True).items():
            sd[k] = v.float().numpy()
    if not sd:
        raise FileNotFoundError(f"no safetensors/bin weights in {model_dir}")
    return sd


def main(argv=None):
    """convert_hf_to_gguf.py counterpart CLI:
    python -m superllama_tpu.tools.convert_hf DIR --outfile out.gguf
    [--outtype f32|f16|bf16|q8_0|q4_k|...] [--mmproj]"""
    import argparse

    from transformers import AutoConfig

    ap = argparse.ArgumentParser(description="Convert an HF checkpoint "
                                             "directory to GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("--outfile", required=True)
    ap.add_argument("--outtype", default="f16")
    ap.add_argument("--mmproj", action="store_true",
                    help="write the vision tower as an mmproj GGUF instead")
    ap.add_argument("--arch", default=None,
                    help="override the GGUF architecture string")
    a = ap.parse_args(argv)

    config = AutoConfig.from_pretrained(a.model_dir)
    sd = _load_state_dict_dir(a.model_dir)
    if a.mmproj:
        from .convert_mmproj import convert_mmproj

        convert_mmproj(a.outfile, config, sd)
        print(f"wrote mmproj {a.outfile}")
        return
    ttype = GGMLType[a.outtype.upper()]
    tok_fields = _tokenizer_fields_from_dir(a.model_dir)
    # pretokenizer family by model_type (the reference detects via chkhsh;
    # the model_type → pre map covers the same mainstream checkpoints)
    _PRE_BY_TYPE = {
        "llama": "llama-bpe", "mllama": "llama-bpe", "llama4": "llama4",
        "qwen2": "qwen2", "qwen2_moe": "qwen2", "qwen3": "qwen2",
        "qwen3_moe": "qwen2", "qwen2_vl": "qwen2", "qwen2_5_vl": "qwen2",
        "qwen3_vl": "qwen2", "qwen3_vl_moe": "qwen2", "qwen3_next": "qwen2",
        "deepseek_v2": "deepseek-llm", "deepseek_v3": "deepseek-v3",
        "starcoder2": "starcoder", "gpt_bigcode": "starcoder",
        "falcon": "falcon", "falcon_h1": "falcon-h1",
        "gpt2": "gpt-2", "phi": "phi-2", "mpt": "mpt", "olmo": "olmo",
        "olmo2": "olmo", "dbrx": "dbrx", "glm4": "glm4", "chatglm": "glm4",
        "command-r": "command-r", "cohere": "command-r",
        "stablelm": "stablelm2", "bloom": "bloom", "jais": "jais",
        "smollm3": "smollm", "lfm2": "lfm2", "modernbert": "modern-bert",
        "hunyuan_v1_dense": "hunyuan-dense", "hunyuan_v1_moe": "hunyuan",
        "exaone": "exaone", "exaone4": "exaone4", "minimax_m2": "minimax-m2",
    }
    if tok_fields.get("tokenizer.ggml.model") == "gpt2":
        # chkhsh fingerprint first (the reference's get_vocab_base_pre
        # detection; table synced by tools/update_pretok_hashes), then the
        # model_type fallback for checkpoints the table hasn't seen
        pre = None
        try:
            from .update_pretok_hashes import detect_pre

            pre = detect_pre(a.model_dir)
        except Exception:
            pre = None
        mt = getattr(config, "model_type", "")
        tok_fields["tokenizer.ggml.pre"] = (
            pre or _PRE_BY_TYPE.get(mt, "default"))
    convert_state_dict(a.outfile, config, sd, ttype,
                       tokenizer_fields=tok_fields, arch=a.arch)
    print(f"wrote {a.outfile}")


if __name__ == "__main__":
    main()
