"""Model saver — write a (finetuned) params pytree back to a GGUF file.

Counterpart of src/llama-model-saver.{h,cpp}: the inverse of models/loader.py
(matmul weights transposed back from our (in, out) convention to the GGUF
(out, in) row layout), carrying over the source metadata so the output loads
in any ecosystem runtime."""

from __future__ import annotations

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from .loader import LoadedModel

# params key → GGUF base name (inverse of the loader's mapping)
_KEY2GG = {
    "wq": "attn_q", "wk": "attn_k", "wv": "attn_v", "wo": "attn_output",
    "bq": "attn_q", "bk": "attn_k", "bv": "attn_v", "bo": "attn_output",
    "attn_norm": "attn_norm", "attn_norm_b": "attn_norm",
    "ffn_norm": "ffn_norm", "ffn_norm_b": "ffn_norm",
    "ffn_gate": "ffn_gate", "ffn_up": "ffn_up", "ffn_down": "ffn_down",
    "ffn_gate_b": "ffn_gate", "ffn_up_b": "ffn_up", "ffn_down_b": "ffn_down",
    "attn_q_norm": "attn_q_norm", "attn_k_norm": "attn_k_norm",
    "attn_post_norm": "attn_post_norm", "ffn_post_norm": "ffn_post_norm",
    "attn_sinks": "attn_sinks",
    "ffn_gate_inp": "ffn_gate_inp", "ffn_gate_inp_b": "ffn_gate_inp",
    "ffn_gate_exps": "ffn_gate_exps", "ffn_up_exps": "ffn_up_exps",
    "ffn_down_exps": "ffn_down_exps",
    "ffn_gate_shexp": "ffn_gate_shexp", "ffn_up_shexp": "ffn_up_shexp",
    "ffn_down_shexp": "ffn_down_shexp",
    "wq_a": "attn_q_a", "wq_b": "attn_q_b", "attn_q_a_norm": "attn_q_a_norm",
    "wkv_a": "attn_kv_a_mqa", "wkv_b": "attn_kv_b",
    "attn_kv_a_norm": "attn_kv_a_norm",
    "ssm_in": "ssm_in", "ssm_conv1d": "ssm_conv1d", "ssm_conv1d_b": "ssm_conv1d",
    "ssm_x": "ssm_x", "ssm_dt": "ssm_dt", "ssm_dt_b": "ssm_dt",
    "ssm_a": "ssm_a", "ssm_d": "ssm_d", "ssm_out": "ssm_out",
}
_NO_TRANSPOSE = {"token_embd", "output_norm", "output_norm_b"}


def save_model_gguf(model: LoadedModel, path: str,
                    ggml_type: GGMLType = GGMLType.F32) -> None:
    """Write the model's (possibly finetuned) params back as a GGUF."""
    md = model.metadata
    w = GGUFWriter(path, arch=md["general.architecture"])
    for k, v in md.items():
        if k != "general.architecture":
            w.add(k, v)

    # 2-D tensors the loader did NOT transpose (stored in GGUF layout already)
    no_t = {"token_embd", "ssm_a"}

    def put(name: str, arr, key: str):
        if arr is None:
            return
        a = np.asarray(arr, np.float32)
        if a.ndim == 2 and key not in no_t:
            a = a.T                          # (in,out) → GGUF (out,in)
        elif a.ndim == 3:
            a = a.transpose(0, 2, 1)         # experts
        t = GGMLType.F32 if a.ndim == 1 else ggml_type
        if a.ndim >= 2 and a.shape[-1] % 256 != 0 and \
                t not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            t = GGMLType.F16
        w.add_tensor(name, a, t)

    p = model.params
    put("token_embd.weight", p.get("token_embd"), "token_embd")
    put("output_norm.weight", p.get("output_norm"), "output_norm")
    put("output_norm.bias", p.get("output_norm_b"), "output_norm_b")
    put("output.weight", p.get("output"), "output")
    for il, layer in enumerate(p["layers"]):
        for key, arr in layer.items():
            gg = _KEY2GG.get(key)
            if gg is None:
                continue
            suffix = "bias" if (key.endswith("_b") or key in ("bq", "bk", "bv", "bo")) \
                else "weight"
            put(f"blk.{il}.{gg}.{suffix}", arr, key)
    w.write()
