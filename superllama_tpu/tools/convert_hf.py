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
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
}


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

    n_head = config.num_attention_heads
    n_kv = getattr(config, "num_key_value_heads", n_head)
    n_embd = config.hidden_size
    head_dim = getattr(config, "head_dim", None) or n_embd // n_head

    w = GGUFWriter(out_path, arch=arch)
    w.add("general.name", getattr(config, "name_or_path", "") or "converted")
    w.add(f"{arch}.context_length", int(getattr(config, "max_position_embeddings", 2048)))
    w.add(f"{arch}.embedding_length", int(n_embd))
    w.add(f"{arch}.block_count", int(config.num_hidden_layers))
    w.add(f"{arch}.feed_forward_length", int(config.intermediate_size))
    w.add(f"{arch}.attention.head_count", int(n_head))
    w.add(f"{arch}.attention.head_count_kv", int(n_kv))
    w.add(f"{arch}.attention.key_length", int(head_dim))
    w.add(f"{arch}.attention.value_length", int(head_dim))
    w.add(f"{arch}.rope.dimension_count", int(head_dim))
    w.add(f"{arch}.attention.layer_norm_rms_epsilon", float(getattr(config, "rms_norm_eps", 1e-5)))
    w.add(f"{arch}.rope.freq_base", float(getattr(config, "rope_theta", 10000.0)))
    w.add(f"{arch}.vocab_size", int(config.vocab_size))
    n_expert = int(getattr(config, "num_local_experts", 0) or getattr(config, "num_experts", 0) or 0)
    if n_expert:
        w.add(f"{arch}.expert_count", n_expert)
        w.add(f"{arch}.expert_used_count", int(getattr(config, "num_experts_per_tok", 2)))
    for key, val in (tokenizer_fields or {}).items():
        w.add(key, val)

    def get(name):
        t = state_dict.get(name)
        return None if t is None else np.asarray(t, dtype=np.float32)

    def put(gguf_name, arr, qtype=ggml_type):
        if arr is None:
            return
        # 1-D tensors stay f32 (matches ecosystem convention)
        t = GGMLType.F32 if arr.ndim == 1 else qtype
        if arr.ndim >= 2 and arr.shape[-1] % 256 != 0 and t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            t = GGMLType.F16  # fall back when rows don't fit superblocks
        w.add_tensor(gguf_name, arr, t)

    put("token_embd.weight", get("model.embed_tokens.weight"))
    put("output_norm.weight", get("model.norm.weight"))
    lm_head = get("lm_head.weight")
    if lm_head is not None and not getattr(config, "tie_word_embeddings", False):
        put("output.weight", lm_head)

    for il in range(config.num_hidden_layers):
        hf = f"model.layers.{il}."
        gg = f"blk.{il}."
        q = get(hf + "self_attn.q_proj.weight")
        k = get(hf + "self_attn.k_proj.weight")
        if arch in ("llama",):  # adjacent-pair rope layout needs permuted q/k
            q = permute_qk(q, n_head)
            k = permute_qk(k, n_kv)
        put(gg + "attn_q.weight", q)
        put(gg + "attn_k.weight", k)
        put(gg + "attn_v.weight", get(hf + "self_attn.v_proj.weight"))
        put(gg + "attn_output.weight", get(hf + "self_attn.o_proj.weight"))
        for bias_hf, bias_gg in (
            ("self_attn.q_proj.bias", "attn_q.bias"),
            ("self_attn.k_proj.bias", "attn_k.bias"),
            ("self_attn.v_proj.bias", "attn_v.bias"),
        ):
            put(gg + bias_gg, get(hf + bias_hf))
        put(gg + "attn_q_norm.weight", get(hf + "self_attn.q_norm.weight"))
        put(gg + "attn_k_norm.weight", get(hf + "self_attn.k_norm.weight"))
        put(gg + "attn_norm.weight", get(hf + "input_layernorm.weight"))
        put(gg + "ffn_norm.weight", get(hf + "post_attention_layernorm.weight"))
        if get(hf + "block_sparse_moe.gate.weight") is not None:  # mixtral
            put(gg + "ffn_gate_inp.weight", get(hf + "block_sparse_moe.gate.weight"))
            w1 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w1.weight") for e in range(n_expert)])
            w2 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w2.weight") for e in range(n_expert)])
            w3 = np.stack([get(hf + f"block_sparse_moe.experts.{e}.w3.weight") for e in range(n_expert)])
            put(gg + "ffn_gate_exps.weight", w1)
            put(gg + "ffn_down_exps.weight", w2)
            put(gg + "ffn_up_exps.weight", w3)
        else:
            put(gg + "ffn_gate.weight", get(hf + "mlp.gate_proj.weight"))
            put(gg + "ffn_up.weight", get(hf + "mlp.up_proj.weight"))
            put(gg + "ffn_down.weight", get(hf + "mlp.down_proj.weight"))
    w.write()
