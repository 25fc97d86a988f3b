"""Deterministic tiny-model specs for reference-oracle architecture parity.

For architectures with no HF transformers class (baichuan, xverse, orion, …)
the correctness oracle is the COMPILED reference CPU stack itself: each spec
deterministically builds a tiny GGUF (seeded random weights + the real SPM
vocab), the reference's `llama-perplexity --save-all-logits` evaluates it
once to produce a committed golden (tests/goldens/arch_logits/<name>.npz),
and tests/test_arch_golden.py replays the same GGUF through our stack and
asserts token-level log-prob parity against the golden — so the check runs
everywhere, not only where the reference build exists.

Tensor shapes follow the reference's create_tensors lists
(src/llama-model.cpp per-arch cases); all arrays here are numpy-order
(out_features, in_features) — our GGUFWriter reverses into GGUF ne order.
"""

from __future__ import annotations

import numpy as np

from superllama_tpu.gguf import GGMLType, GGUFReader, GGUFWriter

SPM_VOCAB = "/root/reference/models/ggml-vocab-llama-spm.gguf"

SPECS: dict[str, callable] = {}


def spec(name):
    def deco(fn):
        SPECS[name] = fn
        return fn
    return deco


def _seed(name: str) -> int:
    return int.from_bytes(name.encode()[:4].ljust(4, b"\0"), "little")


class P:
    """Tensor-spec builder: seeded random weights with fan-in scaling."""

    def __init__(self, name: str):
        self.rng = np.random.default_rng(_seed(name))
        self.tensors: dict[str, np.ndarray] = {}

    def w(self, name: str, *shape, scale: float | None = None):
        if scale is None:
            fan_in = shape[-1] if len(shape) > 1 else shape[0]
            scale = 0.7 * fan_in ** -0.5
        self.tensors[name] = (
            self.rng.standard_normal(shape).astype(np.float32) * scale)

    def norm(self, name: str, dim: int):
        self.tensors[name] = (
            1.0 + 0.1 * self.rng.standard_normal(dim).astype(np.float32))

    def bias(self, name: str, dim: int, scale: float = 0.02):
        self.tensors[name] = (
            self.rng.standard_normal(dim).astype(np.float32) * scale)


def tokenizer_fields() -> dict:
    r = GGUFReader(SPM_VOCAB)
    out = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    return out


def build_gguf(path: str, arch: str, md: dict, tensors: dict[str, np.ndarray],
               ggml_type: GGMLType = GGMLType.F32) -> None:
    w = GGUFWriter(str(path), arch=arch)
    w.add("general.name", f"tiny-{arch}")
    for k, v in md.items():
        w.add(f"{arch}.{k}" if not k.startswith(("general.", "tokenizer."))
              else k, v)
    for k, v in tokenizer_fields().items():
        w.add(k, v)
    for name, arr in tensors.items():
        t = GGMLType.F32 if arr.ndim == 1 else ggml_type
        if arr.ndim >= 2 and arr.shape[-1] % 256 != 0 and t not in (
                GGMLType.F32, GGMLType.F16, GGMLType.BF16):
            t = GGMLType.F16
        w.add_tensor(name, arr, t)
    w.write()


V = 32000  # SPM llama vocab


def _base_md(E, H, HKV, F, L, D=None, rope_base=10000.0, ctx=512,
             rms_eps=1e-5, **extra):
    D = D or E // H
    md = {
        "context_length": ctx, "embedding_length": E, "block_count": L,
        "feed_forward_length": F, "attention.head_count": H,
        "attention.head_count_kv": HKV, "attention.key_length": D,
        "attention.value_length": D, "rope.dimension_count": D,
        "attention.layer_norm_rms_epsilon": rms_eps,
        "rope.freq_base": rope_base, "vocab_size": V,
    }
    md.update(extra)
    return md


def _llama_layers(p: P, L, E, H, HKV, F, D=None, ln_bias=False):
    """Standard llama tensor set (attn_norm, q/k/v/o, ffn_norm, gate/up/down)."""
    D = D or E // H
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
        if ln_bias:
            p.bias(b + "attn_norm.bias", E)
            p.bias(b + "ffn_norm.bias", E)


def _head(p: P, E, tied=False):
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    if not tied:
        p.w("output.weight", V, E)


@spec("baichuan")
def spec_baichuan():
    """Baichuan-7B shape (rope NORM llama graph; the reference builder gates
    on LLM_TYPE_7B ⇒ n_layer must be 32; src/models/baichuan.cpp:16,46)."""
    E, H, HKV, F, L = 64, 4, 4, 128, 32
    p = P("baichuan")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    return "baichuan", _base_md(E, H, HKV, F, L), p.tensors


@spec("xverse")
def spec_xverse():
    """XVERSE (llama graph, rope NORM; src/models/xverse.cpp)."""
    E, H, HKV, F, L = 64, 4, 4, 128, 2
    p = P("xverse")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    return "xverse", _base_md(E, H, HKV, F, L), p.tensors


@spec("qwen")
def spec_qwen():
    """Qwen-1 (fused wqkv+bias, NEOX rope, gated silu FFN at n_ff/2;
    src/models/qwen.cpp, create_tensors llama-model.cpp:3541)."""
    E, H, F, L = 64, 4, 128, 2
    p = P("qwen")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.bias(b + "attn_qkv.bias", 3 * E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F // 2, E)
        p.w(b + "ffn_up.weight", F // 2, E)
        p.w(b + "ffn_down.weight", E, F // 2)
    return "qwen", _base_md(E, H, H, F, L), p.tensors


@spec("codeshell")
def spec_codeshell():
    """CodeShell (LayerNorm+bias, fused GQA wqkv+bias, NEOX rope, no-gate
    tanh-gelu FFN with biases; src/models/codeshell.cpp)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("codeshell")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.bias("output_norm.bias", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.bias(b + "attn_norm.bias", E)
        p.w(b + "attn_qkv.weight", (H + 2 * HKV) * D, E)
        p.bias(b + "attn_qkv.bias", (H + 2 * HKV) * D, scale=0.1)
        p.w(b + "attn_output.weight", E, H * D)
        p.bias(b + "attn_output.bias", E)
        p.norm(b + "ffn_norm.weight", E)
        p.bias(b + "ffn_norm.bias", E)
        p.w(b + "ffn_up.weight", F, E)
        p.bias(b + "ffn_up.bias", F)
        p.w(b + "ffn_down.weight", E, F)
        p.bias(b + "ffn_down.bias", E)
    md = _base_md(E, H, HKV, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md["attention.layer_norm_epsilon"] = 1e-5
    return "codeshell", md, p.tensors


@spec("deepseek")
def spec_deepseek():
    """DeepSeek-V1 MoE (llama attention + softmax-gated top-k experts with
    unnormalized weights, dense lead layer, always-on shared experts;
    src/models/deepseek.cpp:84-105)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 3
    NE, KE, FE, SH = 4, 2, 48, 2
    p = P("deepseek")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(1, L):  # layers past the dense lead become MoE
        b = f"blk.{i}."
        for t in ("ffn_gate.weight", "ffn_up.weight", "ffn_down.weight"):
            del p.tensors[b + t]
        # decisive router logits: near-tie top-k selections are legitimate
        # cross-engine divergence (f32 associativity), not a model bug
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
        p.w(b + "ffn_gate_shexp.weight", FE * SH, E)
        p.w(b + "ffn_up_shexp.weight", FE * SH, E)
        p.w(b + "ffn_down_shexp.weight", E, FE * SH)
    md = _base_md(E, H, HKV, F, L,
                  **{"expert_count": NE, "expert_used_count": KE,
                     "expert_feed_forward_length": FE,
                     "expert_shared_count": SH,
                     "leading_dense_block_count": 1,
                     "expert_weights_scale": 1.0})
    return "deepseek", md, p.tensors


@spec("minicpm3")
def spec_minicpm3():
    """MiniCPM3 — MLA attention (q LoRA + compressed KV latent, NEOX rope on
    the rope slices) with muP scalings hardcoded in the reference builder
    (src/models/minicpm3.cpp: scale_embd 12, scale_depth 1.4, lm-head
    n_embd_base/n_embd)."""
    E, H, F, L = 64, 4, 128, 2
    d_rope, d_nope, d_v = 16, 16, 16
    rq, rkv = 32, 32
    p = P("minicpm3")
    # the builder scales embeddings ×12 — compensate so activations (and the
    # golden's uint16 log-prob quantization step) stay in the usual range
    p.w("token_embd.weight", V, E, scale=0.02 / 12.0)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E, scale=0.02)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.norm(b + "attn_q_a_norm.weight", rq)
        p.norm(b + "attn_kv_a_norm.weight", rkv)
        p.w(b + "attn_q_a.weight", rq, E)
        p.w(b + "attn_q_b.weight", H * (d_nope + d_rope), rq)
        p.w(b + "attn_kv_a_mqa.weight", rkv + d_rope, E)
        p.w(b + "attn_kv_b.weight", H * (d_nope + d_v), rkv)
        p.w(b + "attn_output.weight", E, H * d_v)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, H, F, L, D=d_nope + d_rope)
    md["attention.value_length"] = d_v
    md["rope.dimension_count"] = d_rope
    md["attention.q_lora_rank"] = rq
    md["attention.kv_lora_rank"] = rkv
    return "minicpm3", md, p.tensors


@spec("arctic")
def spec_arctic():
    """Snowflake Arctic — dense FFN (n_embd wide) on the attention residual
    plus a PARALLEL MoE branch normed from the pre-attention input
    (src/models/arctic.cpp:66-97; ffn_norm_exps tensor)."""
    E, H, HKV, L = 64, 4, 2, 2
    NE, KE, FE = 4, 2, 96
    p = P("arctic")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * (E // H), E)
        p.w(b + "attn_v.weight", HKV * (E // H), E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", E, E)
        p.w(b + "ffn_up.weight", E, E)
        p.w(b + "ffn_down.weight", E, E)
        p.norm(b + "ffn_norm_exps.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
    md = _base_md(E, H, HKV, FE, L,
                  **{"expert_count": NE, "expert_used_count": KE})
    return "arctic", md, p.tensors


@spec("chameleon")
def spec_chameleon():
    """Chameleon — per-head qk LayerNorm (weight+bias shaped (H, D), applied
    pre-rope) and image-token logit suppression (src/models/chameleon.cpp)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("chameleon")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_q_norm.weight", (H, D))
        p.bias(b + "attn_q_norm.bias", (H, D))
        p.norm(b + "attn_k_norm.weight", (HKV, D))
        p.bias(b + "attn_k_norm.bias", (HKV, D))
    md = _base_md(E, H, HKV, F, L, **{"swin_norm": False})
    return "chameleon", md, p.tensors


@spec("grok")
def spec_grok():
    """Grok-1 — MoE with gelu gating, attention softcap 30 with the 0.0884
    pre-softcap output scale, post-attention/post-FFN norms, ×78.38 embedding
    scale and 0.577 logit scale (all builder defaults for old GGUFs,
    llama-model.cpp:795-813; graph src/models/grok.cpp)."""
    E, H, HKV, L = 64, 4, 2, 2
    NE, KE, FE = 4, 2, 96
    p = P("grok")
    p.w("token_embd.weight", V, E, scale=0.02 / 78.38367176906169)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E, scale=0.02)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * (E // H), E)
        p.w(b + "attn_v.weight", HKV * (E // H), E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "attn_output_norm.weight", E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
        p.norm(b + "post_ffw_norm.weight", E)
    md = _base_md(E, H, HKV, FE, L,
                  **{"expert_count": NE, "expert_used_count": KE})
    return "grok", md, p.tensors


@spec("bailingmoe")
def spec_bailingmoe():
    """BailingMoe (Ling) — all-MoE llama graph, NORM rope with wq width
    n_head·n_rot, softmax gating with KV-driven weight norm, shared experts
    (src/models/bailingmoe.cpp)."""
    E, H, HKV, L = 64, 4, 2, 2
    NE, KE, FE, SH = 4, 2, 48, 1
    p = P("bailingmoe")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * (E // H), E)
        p.w(b + "attn_v.weight", HKV * (E // H), E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
        p.w(b + "ffn_gate_shexp.weight", FE * SH, E)
        p.w(b + "ffn_up_shexp.weight", FE * SH, E)
        p.w(b + "ffn_down_shexp.weight", E, FE * SH)
    md = _base_md(E, H, HKV, 128, L,
                  **{"expert_count": NE, "expert_used_count": KE,
                     "expert_feed_forward_length": FE,
                     "expert_shared_count": SH,
                     "leading_dense_block_count": 0,
                     "expert_weights_scale": 1.0,
                     "expert_weights_norm": True})
    return "bailingmoe", md, p.tensors


@spec("smallthinker")
def spec_smallthinker():
    """SmallThinker — MoE with relu-gated experts, SIGMOID router fed from
    the PRE-NORM layer input (smallthinker.cpp:33), rope everywhere in the
    non-SWA configuration."""
    E, H, HKV, L = 64, 4, 2, 2
    NE, KE, FE = 4, 2, 48
    p = P("smallthinker")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * (E // H), E)
        p.w(b + "attn_v.weight", HKV * (E // H), E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
    md = _base_md(E, H, HKV, 128, L,
                  **{"expert_count": NE, "expert_used_count": KE,
                     "expert_feed_forward_length": FE,
                     "expert_gating_func": 2})
    return "smallthinker", md, p.tensors


@spec("mistral3")
def spec_mistral3():
    """Mistral3 (Mistral-Small-3.x text stack) — plain llama graph, NORM
    rope (src/models/mistral3.cpp with temperature scaling off)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("mistral3")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    return "mistral3", _base_md(E, H, HKV, F, L), p.tensors


@spec("maincoder")
def spec_maincoder():
    """MainCoder — qwen3-like per-head qk RMS norms applied AFTER rope
    (src/models/maincoder.cpp:48-50), NEOX rope."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("maincoder")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(L):
        p.norm(f"blk.{i}.attn_q_norm.weight", D)
        p.norm(f"blk.{i}.attn_k_norm.weight", D)
    return "maincoder", _base_md(E, H, HKV, F, L), p.tensors


@spec("plm")
def spec_plm():
    """PLM — MLA with a direct q projection (no q LoRA), compressed-KV
    latent, relu² no-gate FFN, tied embeddings (src/models/plm.cpp)."""
    E, H, F, L = 64, 4, 128, 2
    d_rope, d_nope, d_v, rkv = 16, 16, 16, 32
    p = P("plm")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * (d_nope + d_rope), E)
        p.w(b + "attn_kv_a_mqa.weight", rkv + d_rope, E)
        p.norm(b + "attn_kv_a_norm.weight", rkv)
        p.w(b + "attn_kv_b.weight", H * (d_nope + d_v), rkv)
        p.w(b + "attn_output.weight", E, H * d_v)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, H, F, L, D=d_nope + d_rope)
    md["attention.value_length"] = d_v
    md["rope.dimension_count"] = d_rope
    md["attention.kv_lora_rank"] = rkv
    return "plm", md, p.tensors


@spec("pangu-embedded")
def spec_pangu():
    """PanGu Embedded — llama graph with q/k/v/o biases, NEOX rope
    (src/models/pangu-embedded.cpp)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("pangu-embedded")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(L):
        b = f"blk.{i}."
        p.bias(b + "attn_q.bias", H * D, scale=0.1)
        p.bias(b + "attn_k.bias", HKV * D, scale=0.1)
        p.bias(b + "attn_v.bias", HKV * D, scale=0.1)
        p.bias(b + "attn_output.bias", E, scale=0.1)
    return "pangu-embedded", _base_md(E, H, HKV, F, L), p.tensors


def _moe_bank(p: P, b: str, NE, FE, E, bank: str = "exps"):
    p.w(b + f"ffn_gate_{bank}.weight", NE, FE, E)
    p.w(b + f"ffn_up_{bank}.weight", NE, FE, E)
    p.w(b + f"ffn_down_{bank}.weight", NE, E, FE)


@spec("deci")
def spec_deci():
    """DeciLM / Nemotron-51B — per-layer head/FFN arrays with three special
    layer kinds: attention-free (n_head==0), "linear attention"
    (n_head_kv==0: wo over the attn-norm output), and FFN-free (the
    reference builder discards the attention output entirely, deci.cpp:96).
    Layers: [linear-attn, attention-free, ffn-free, standard] — standard
    last: the reference's out_ids gather dead-codes (and crashes buffer
    assignment) when the final layer contributes nothing to the graph."""
    E, D, F = 64, 16, 128
    H_arr, HKV_arr, F_arr = [4, 0, 4, 4], [0, 0, 2, 2], [F, F, 0, F]
    p = P("deci")
    _head(p, E)
    for i, (h, hkv, f) in enumerate(zip(H_arr, HKV_arr, F_arr)):
        b = f"blk.{i}."
        if h > 0:
            p.norm(b + "attn_norm.weight", E)
            if hkv > 0:
                p.w(b + "attn_q.weight", h * D, E)
                p.w(b + "attn_k.weight", hkv * D, E)
                p.w(b + "attn_v.weight", hkv * D, E)
                p.w(b + "attn_output.weight", E, h * D)
            else:
                p.w(b + "attn_output.weight", E, E)
        if f > 0:
            p.norm(b + "ffn_norm.weight", E)
            p.w(b + "ffn_gate.weight", f, E)
            p.w(b + "ffn_up.weight", f, E)
            p.w(b + "ffn_down.weight", E, f)
    md = _base_md(E, 4, 2, F, len(H_arr), D=D)
    md["attention.head_count"] = H_arr
    md["attention.head_count_kv"] = HKV_arr
    md["feed_forward_length"] = F_arr
    return "deci", md, p.tensors


@spec("openelm")
def spec_openelm():
    """OpenELM — per-layer head counts and FFN widths, fused wqkv, per-head
    q/k RMS norms pre-rope, NEOX rope, tied lm head (openelm.cpp;
    create_tensors llama-model.cpp:4761)."""
    E, D = 64, 16
    H_arr, HKV_arr, F_arr = [3, 4], [1, 2], [96, 128]
    p = P("openelm")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    for i, (h, hkv, f) in enumerate(zip(H_arr, HKV_arr, F_arr)):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", (h + 2 * hkv) * D, E)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.w(b + "attn_output.weight", E, h * D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", f, E)
        p.w(b + "ffn_up.weight", f, E)
        p.w(b + "ffn_down.weight", E, f)
    md = _base_md(E, 4, 2, 128, len(H_arr), D=D)
    md["attention.head_count"] = H_arr
    md["attention.head_count_kv"] = HKV_arr
    md["feed_forward_length"] = F_arr
    return "openelm", md, p.tensors


@spec("plamo")
def spec_plamo():
    """PLaMo — parallel attention+FFN both fed from the attn-norm output,
    single residual add of both branches, NEOX rope over the full head dim
    (plamo.cpp:78-92)."""
    E, H, HKV, F, L = 64, 4, 4, 128, 2
    p = P("plamo")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * (E // H), E)
        p.w(b + "attn_v.weight", HKV * (E // H), E)
        p.w(b + "attn_output.weight", E, E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    return "plamo", _base_md(E, H, HKV, F, L), p.tensors


@spec("minimax-m2")
def spec_minimax_m2():
    """MiniMax-M2 — full-width q/k RMS norms (over H·D flat, pre-reshape),
    PARTIAL NORM rope (n_rot < head_dim), all-MoE layers with a selection
    probs bias (minimax-m2.cpp; create_tensors llama-model.cpp:6727)."""
    E, H, HKV, L, D = 64, 4, 2, 2, 16
    NE, KE, FE = 4, 2, 48
    p = P("minimax-m2")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", H * D)
        p.norm(b + "attn_k_norm.weight", HKV * D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
        _moe_bank(p, b, NE, FE, E)
    md = _base_md(E, H, HKV, FE, L, D=D)
    md["rope.dimension_count"] = 8           # partial rope
    md["expert_count"] = NE
    md["expert_used_count"] = KE
    md["expert_feed_forward_length"] = FE
    md["expert_gating_func"] = 1             # softmax
    return "minimax-m2", md, p.tensors


@spec("bailingmoe2")
def spec_bailingmoe2():
    """BailingMoe2 (Ling-2) — fused wqkv with per-head q/k RMS norms
    pre-rope (NEOX), dense lead layer, sigmoid-gated MoE with selection
    bias + weight norm/scale, always-on shared experts, NextN tail layers
    trimmed (bailingmoe2.cpp; create_tensors llama-model.cpp:6066)."""
    E, H, HKV, L, D = 64, 4, 2, 2, 16
    NE, KE, FE, SH = 4, 2, 48, 1
    p = P("bailingmoe2")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", (H + 2 * HKV) * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        if i == 0:                            # dense lead
            p.w(b + "ffn_gate.weight", 128, E)
            p.w(b + "ffn_up.weight", 128, E)
            p.w(b + "ffn_down.weight", E, 128)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            _moe_bank(p, b, NE, FE, E)
            p.w(b + "ffn_gate_shexp.weight", FE * SH, E)
            p.w(b + "ffn_up_shexp.weight", FE * SH, E)
            p.w(b + "ffn_down_shexp.weight", E, FE * SH)
    md = _base_md(E, H, HKV, 128, L, D=D)
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE, "expert_shared_count": SH,
               "expert_shared_feed_forward_length": FE,
               "leading_dense_block_count": 1, "expert_weights_scale": 1.5,
               "expert_weights_norm": True, "expert_gating_func": 2,
               # NextN trim itself is exercised by glm4moe; the reference
               # requires NextN layers' tensors present even when skipped
               "nextn_predict_layers": 0})
    return "bailingmoe2", md, p.tensors


@spec("exaone-moe")
def spec_exaone_moe():
    """EXAONE-MoE — iSWA (3-sliding/1-full, window forced on) with rope ONLY
    on the sliding-window layers, per-head q/k norms, dense lead, sigmoid
    MoE + shared experts (exaone-moe.cpp; llama-model.cpp:1946,5557)."""
    E, H, HKV, L, D = 64, 4, 2, 4, 16
    NE, KE, FE, SHF = 4, 2, 48, 96
    p = P("exaone-moe")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        if i == 0:                            # dense lead
            p.w(b + "ffn_gate.weight", 128, E)
            p.w(b + "ffn_up.weight", 128, E)
            p.w(b + "ffn_down.weight", E, 128)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            _moe_bank(p, b, NE, FE, E)
            p.w(b + "ffn_gate_shexp.weight", SHF, E)
            p.w(b + "ffn_up_shexp.weight", SHF, E)
            p.w(b + "ffn_down_shexp.weight", E, SHF)
    md = _base_md(E, H, HKV, 128, L, D=D)
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE, "expert_shared_count": 1,
               "expert_shared_feed_forward_length": SHF,
               "leading_dense_block_count": 1, "expert_weights_scale": 1.0,
               "expert_weights_norm": True, "expert_gating_func": 2,
               "attention.sliding_window": 64})
    return "exaone-moe", md, p.tensors


@spec("grovemoe")
def spec_grovemoe():
    """GroveMoE — per-head q/k norms, then TWO expert passes: the main bank
    (selection on sigmoid(logits), weights from softmax renormalized) and
    the adjugate "chunk" bank applied to the FIRST pass's output, routed by
    big-expert id // n_group_experts and scaled by expert_group_scale
    (grovemoe.cpp:84-120)."""
    E, H, HKV, L, D = 64, 4, 2, 2, 16
    NE, KE, FE, NG, FC = 8, 2, 48, 4, 32     # n_chunk = NE/NG = 2
    p = P("grovemoe")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        _moe_bank(p, b, NE, FE, E)
        _moe_bank(p, b, NE // NG, FC, E, bank="chexps")
    md = _base_md(E, H, HKV, 128, L, D=D)
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE,
               "expert_chunk_feed_forward_length": FC,
               "experts_per_group": NG, "expert_group_scale": 0.05})
    return "grovemoe", md, p.tensors


@spec("afmoe")
def spec_afmoe():
    """AFMoE — MuP sqrt(E) embedding scale, dual pre/post norms around both
    blocks, per-head q/k norms, σ-gated attention output (attn_gate tensor,
    pre-wo), iSWA 3-sliding/1-full, sigmoid MoE with selection bias, scale
    and shared expert (afmoe.cpp; create_tensors llama-model.cpp:6213)."""
    E, H, HKV, L, D = 64, 4, 2, 4, 16
    NE, KE, FE = 4, 2, 48
    p = P("afmoe")
    p.w("token_embd.weight", V, E, scale=0.02 / 8.0)  # builder scales ×√E=8
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.norm(b + "post_attention_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.w(b + "attn_gate.weight", H * D, E)
        p.norm(b + "ffn_norm.weight", E)
        p.norm(b + "post_ffw_norm.weight", E)
        if i == 0:                            # dense lead
            p.w(b + "ffn_gate.weight", 128, E)
            p.w(b + "ffn_up.weight", 128, E)
            p.w(b + "ffn_down.weight", E, 128)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            _moe_bank(p, b, NE, FE, E)
            p.w(b + "ffn_gate_shexp.weight", FE, E)
            p.w(b + "ffn_up_shexp.weight", FE, E)
            p.w(b + "ffn_down_shexp.weight", E, FE)
    md = _base_md(E, H, HKV, 128, L, D=D)
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE, "expert_shared_count": 1,
               "leading_dense_block_count": 1, "expert_weights_scale": 2.0,
               "expert_weights_norm": True, "expert_gating_func": 2,
               "attention.sliding_window": 64})
    return "afmoe", md, p.tensors


@spec("mimo2")
def spec_mimo2():
    """MiMo-2 — per-layer head counts, iSWA via an explicit per-layer
    sliding-window-pattern array with a separate SWA rope base, attention
    sinks, per-layer dense-vs-MoE FFN (mimo2-iswa.cpp; create_tensors
    llama-model.cpp:6906)."""
    E, D = 64, 16
    H_arr, HKV_arr = [4, 3, 4], [2, 1, 2]
    swa_arr = [True, False, True]
    NE, KE, FE = 4, 2, 48
    p = P("mimo2")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i, (h, hkv) in enumerate(zip(H_arr, HKV_arr)):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", h * D, E)
        p.w(b + "attn_k.weight", hkv * D, E)
        p.w(b + "attn_v.weight", hkv * D, E)
        p.w(b + "attn_output.weight", E, h * D)
        p.bias(b + "attn_sinks.weight", h, scale=1.0)
        p.norm(b + "ffn_norm.weight", E)
        if i == 0:                            # dense layer
            p.w(b + "ffn_gate.weight", 128, E)
            p.w(b + "ffn_up.weight", 128, E)
            p.w(b + "ffn_down.weight", E, 128)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            _moe_bank(p, b, NE, FE, E)
    md = _base_md(E, 4, 2, 128, len(H_arr), D=D)
    md["attention.head_count"] = H_arr
    md["attention.head_count_kv"] = HKV_arr
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE,
               "attention.sliding_window": 64,
               "attention.sliding_window_pattern": swa_arr,
               "rope.freq_base_swa": 10000.0})
    return "mimo2", md, p.tensors


@spec("lfm2")
def spec_lfm2():
    """LFM2 — hybrid shortconv/attention stack (per-layer head_count_kv 0 =
    shortconv layer), per-head q/k norms + NEOX rope on attention layers,
    final norm shipped as "token_embd_norm" (lfm2.cpp; llama-arch.cpp:318)."""
    E, H, HKV, F, D, LC = 64, 4, 2, 128, 16, 3
    HKV_arr = [0, 2, 0, 2]
    p = P("lfm2")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("token_embd_norm.weight", E)       # the lfm2 FINAL norm
    for i, hkv in enumerate(HKV_arr):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        if hkv == 0:
            p.w(b + "shortconv.conv.weight", E, LC, scale=0.5)
            p.w(b + "shortconv.in_proj.weight", 3 * E, E)
            p.w(b + "shortconv.out_proj.weight", E, E)
        else:
            p.w(b + "attn_q.weight", H * D, E)
            p.w(b + "attn_k.weight", hkv * D, E)
            p.w(b + "attn_v.weight", hkv * D, E)
            p.w(b + "attn_output.weight", E, H * D)
            p.norm(b + "attn_q_norm.weight", D)
            p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, len(HKV_arr), D=D)
    md["attention.head_count_kv"] = HKV_arr
    md["shortconv.l_cache"] = LC
    return "lfm2", md, p.tensors


@spec("lfm2moe")
def spec_lfm2moe():
    """LFM2-MoE — the lfm2 hybrid with sigmoid-gated MoE (+required probs
    bias) past the dense lead (lfm2.cpp build_moe_feed_forward)."""
    E, H, HKV, F, D, LC = 64, 4, 2, 128, 16, 3
    NE, KE, FE = 4, 2, 48
    HKV_arr = [0, 2, 0]
    p = P("lfm2moe")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("token_embd_norm.weight", E)
    for i, hkv in enumerate(HKV_arr):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        if hkv == 0:
            p.w(b + "shortconv.conv.weight", E, LC, scale=0.5)
            p.w(b + "shortconv.in_proj.weight", 3 * E, E)
            p.w(b + "shortconv.out_proj.weight", E, E)
        else:
            p.w(b + "attn_q.weight", H * D, E)
            p.w(b + "attn_k.weight", hkv * D, E)
            p.w(b + "attn_v.weight", hkv * D, E)
            p.w(b + "attn_output.weight", E, H * D)
            p.norm(b + "attn_q_norm.weight", D)
            p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        if i == 0:                             # dense lead
            p.w(b + "ffn_gate.weight", F, E)
            p.w(b + "ffn_up.weight", F, E)
            p.w(b + "ffn_down.weight", E, F)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            _moe_bank(p, b, NE, FE, E)
    md = _base_md(E, H, HKV, F, len(HKV_arr), D=D)
    md["attention.head_count_kv"] = HKV_arr
    md["shortconv.l_cache"] = LC
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE,
               "leading_dense_block_count": 1, "expert_gating_func": 2})
    return "lfm2moe", md, p.tensors


@spec("plamo3")
def spec_plamo3():
    """PLaMo-3 — fused wqkv (distinct q/v head dims allowed), per-head q/k
    norms pre-rope (NEOX), dual post-norms named WITHOUT the .weight suffix,
    fused swiglu gate_up FFN (plamo3.cpp; create_tensors
    llama-model.cpp:3939)."""
    E, H, HKV, F, L, D = 64, 4, 2, 64, 2, 16
    p = P("plamo3")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", (H + 2 * HKV) * D, E)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "post_attention_norm", E)
        p.norm(b + "ffn_norm.weight", E)
        p.norm(b + "post_ffw_norm", E)
        p.w(b + "ffn_up.weight", 2 * F, E)    # fused gate‖up, swiglu split
        p.w(b + "ffn_down.weight", E, F)
    return "plamo3", _base_md(E, H, HKV, F, L, D=D), p.tensors


@spec("orion")
def spec_orion():
    """Orion-14B (LayerNorm+bias blocks, rope NEOX; src/models/orion.cpp —
    note its build_attn takes no rope permute: HF weights are used as-is)."""
    E, H, HKV, F, L = 64, 4, 4, 128, 2
    p = P("orion")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.bias("output_norm.bias", E)
    p.w("output.weight", V, E)
    _llama_layers(p, L, E, H, HKV, F, ln_bias=True)
    md = _base_md(E, H, HKV, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md["attention.layer_norm_epsilon"] = 1e-5
    return "orion", md, p.tensors


# ---------------------------------------------------------------- encoders
# Specs for the ENCODER oracle (llama-embedding; tests/test_encoder_golden.py).
# All bidirectional, evaluated with mean pooling + L2 normalization.

ENC_SPECS: dict[str, callable] = {}


def enc_spec(name):
    def deco(fn):
        ENC_SPECS[name] = fn
        return fn
    return deco


def _ln(p: P, name: str, dim: int):
    p.norm(name + ".weight", dim)
    p.bias(name + ".bias", dim)


@enc_spec("bert")
def enc_bert():
    """Classic BERT (bert.cpp): learned positions, token types, post-norm
    LayerNorms with biases, GELU(tanh) no-gate FFN with biases."""
    E, H, F, L, CTX = 64, 4, 128, 2, 512  # pos table spans n_ctx_train
    p = P("bert-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.w("token_types.weight", 2, E, scale=0.02)
    p.w("position_embd.weight", CTX, E, scale=0.02)
    _ln(p, "token_embd_norm", E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_q.weight", E, E)
        p.bias(b + "attn_q.bias", E, scale=0.1)
        p.w(b + "attn_k.weight", E, E)
        p.bias(b + "attn_k.bias", E, scale=0.1)
        p.w(b + "attn_v.weight", E, E)
        p.bias(b + "attn_v.bias", E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        p.bias(b + "attn_output.bias", E, scale=0.1)
        _ln(p, b + "attn_output_norm", E)
        p.w(b + "ffn_up.weight", F, E)
        p.bias(b + "ffn_up.bias", F, scale=0.1)
        p.w(b + "ffn_down.weight", E, F)
        p.bias(b + "ffn_down.bias", E, scale=0.1)
        _ln(p, b + "layer_output_norm", E)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1,
               "tokenizer.ggml.token_type_count": 2})
    return "bert", md, p.tensors


@enc_spec("nomic-bert")
def enc_nomic():
    """nomic-bert: fused wqkv+bias, NEOX rope, silu-gated FFN (no biases),
    post-norm LayerNorms."""
    E, H, F, L = 64, 4, 128, 2
    p = P("nomic-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.w("token_types.weight", 2, E, scale=0.02)
    _ln(p, "token_embd_norm", E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.bias(b + "attn_qkv.bias", 3 * E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        _ln(p, b + "attn_output_norm", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
        _ln(p, b + "layer_output_norm", E)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1,
               "tokenizer.ggml.token_type_count": 2})
    return "nomic-bert", md, p.tensors


@enc_spec("nomic-bert-moe")
def enc_nomic_moe():
    """nomic-bert-moe: GELU gate-less MoE on every 2nd layer (il%2==1),
    GELU-seq dense with biases elsewhere (bert.cpp moe_every_n_layers)."""
    E, H, F, L, NE, KE = 64, 4, 128, 2, 4, 2
    p = P("nomic-moe-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.w("token_types.weight", 2, E, scale=0.02)
    _ln(p, "token_embd_norm", E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.bias(b + "attn_qkv.bias", 3 * E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        _ln(p, b + "attn_output_norm", E)
        if i % 2 == 1:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.w(b + "ffn_up_exps.weight", NE, F, E)
            p.w(b + "ffn_down_exps.weight", NE, E, F)
        else:
            p.w(b + "ffn_up.weight", F, E)
            p.bias(b + "ffn_up.bias", F, scale=0.1)
            p.w(b + "ffn_down.weight", E, F)
            p.bias(b + "ffn_down.bias", E, scale=0.1)
        _ln(p, b + "layer_output_norm", E)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1,
               "moe_every_n_layers": 2,
               "tokenizer.ggml.token_type_count": 2,
               "expert_count": NE, "expert_used_count": KE})
    return "nomic-bert-moe", md, p.tensors


@enc_spec("jina-bert-v2")
def enc_jina_v2():
    """jina-bert-v2: ALiBi (no rope/positions), gelu-gated FFN with up/down
    biases, second attention norm with a double residual."""
    E, H, F, L = 64, 4, 128, 2
    p = P("jina2-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.w("token_types.weight", 2, E, scale=0.02)
    _ln(p, "token_embd_norm", E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_q.weight", E, E)
        p.bias(b + "attn_q.bias", E, scale=0.1)
        p.w(b + "attn_k.weight", E, E)
        p.bias(b + "attn_k.bias", E, scale=0.1)
        p.w(b + "attn_v.weight", E, E)
        p.bias(b + "attn_v.bias", E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        p.bias(b + "attn_output.bias", E, scale=0.1)
        _ln(p, b + "attn_output_norm", E)
        _ln(p, b + "attn_norm_2", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.bias(b + "ffn_up.bias", F, scale=0.1)
        p.w(b + "ffn_down.weight", E, F)
        p.bias(b + "ffn_down.bias", E, scale=0.1)
        _ln(p, b + "layer_output_norm", E)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1,
               "tokenizer.ggml.token_type_count": 2})
    return "jina-bert-v2", md, p.tensors


@enc_spec("jina-bert-v3")
def enc_jina_v3():
    """jina-bert-v3: NEOX rope + GELU-seq FFN with biases, post-norm."""
    E, H, F, L = 64, 4, 128, 2
    p = P("jina3-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    _ln(p, "token_embd_norm", E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.bias(b + "attn_qkv.bias", 3 * E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        _ln(p, b + "attn_output_norm", E)
        p.w(b + "ffn_up.weight", F, E)
        p.bias(b + "ffn_up.bias", F, scale=0.1)
        p.w(b + "ffn_down.weight", E, F)
        p.bias(b + "ffn_down.bias", E, scale=0.1)
        _ln(p, b + "layer_output_norm", E)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1})
    return "jina-bert-v3", md, p.tensors


@enc_spec("modern-bert")
def enc_modern_bert():
    """ModernBERT: pre-norm LN (layer 0 ships no attn norm), fused wqkv
    (no bias), NEOX rope with a separate SWA base, SYMMETRIC sliding window
    (every 3rd layer global), fused GEGLU FFN, final output_norm."""
    E, H, F, L = 64, 4, 64, 3
    p = P("modern-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("token_embd_norm.weight", E)
    p.norm("output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        if i > 0:
            p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_up.weight", 2 * F, E)    # fused gate‖up (GEGLU)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-12,
               "attention.causal": False, "pooling_type": 1,
               "attention.sliding_window": 8,
               "attention.sliding_window_pattern": 3,
               "rope.freq_base_swa": 10000.0})
    return "modern-bert", md, p.tensors


@enc_spec("neo-bert")
def enc_neo_bert():
    """NeoBERT: pre-norm RMS, fused wqkv, NORM rope, fused SWIGLU FFN,
    final enc.output_norm."""
    E, H, F, L = 64, 4, 64, 2
    p = P("neo-enc")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("enc.output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_up.weight", 2 * F, E)    # fused gate‖up (SWIGLU)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, H, F, L)
    md.update({"attention.causal": False, "pooling_type": 1})
    return "neo-bert", md, p.tensors


@enc_spec("gemma-embedding")
def enc_gemma_embedding():
    """EmbeddingGemma: gemma3 blocks run bidirectionally — symmetric SWA
    pattern 6, per-head q/k RMS norms, dual post-norms, q × 1/sqrt(D),
    GELU-gated FFN (gemma-embedding.cpp). Six layers so the SWA pattern
    includes one full-attention layer — the reference's no-cache mask input
    dead-codes (and crashes buffer assignment) when never consumed."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 6, 16
    p = P("gemma-emb-enc")
    p.w("token_embd.weight", V, E, scale=0.02 / 8.0)  # ×sqrt(E)=8 in-graph
    p.norm("output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "post_attention_norm.weight", E)
        p.norm(b + "ffn_norm.weight", E)
        p.norm(b + "post_ffw_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, L, D=D)
    md.update({"pooling_type": 1, "attention.sliding_window": 8,
               "rope.freq_base_swa": 10000.0})
    return "gemma-embedding", md, p.tensors


@spec("rwkv6qwen2")
def spec_rwkv6qwen2():
    """RWKV6-in-Qwen2 (rwkv6qwen2.cpp): qrwkv time mix — gated linear
    attention (no bonus / group norm), sigmoid gate, GQA k/v with r/k/v
    biases — between RMS norms with a Qwen2 silu-gated FFN; one token-shift
    stream; fused-lerp tensors."""
    E, HS, HKV, F, L = 64, 16, 2, 128, 2       # head_size 16 → 4 wkv heads
    ED, DD = 16, 16                            # lerp / decay extra dims
    KV = HKV * HS
    p = P("rwkv6qwen2")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "time_mix_w1.weight", ED * 5, E, scale=0.1)
        p.tensors[b + "time_mix_w2.weight"] = (
            p.rng.standard_normal((5, E, ED)).astype(np.float32) * 0.1)
        p.tensors[b + "time_mix_lerp_x.weight"] = (
            p.rng.standard_normal((1, 1, E)).astype(np.float32) * 0.3)
        p.tensors[b + "time_mix_lerp_fused.weight"] = (
            p.rng.standard_normal((5, 1, 1, E)).astype(np.float32) * 0.3)
        p.bias(b + "time_mix_decay.weight", E, scale=0.3)
        p.w(b + "time_mix_decay_w1.weight", DD, E, scale=0.1)
        p.w(b + "time_mix_decay_w2.weight", E, DD, scale=0.1)
        p.w(b + "time_mix_key.weight", KV, E)
        p.bias(b + "time_mix_key.bias", KV, scale=0.1)
        p.w(b + "time_mix_value.weight", KV, E)
        p.bias(b + "time_mix_value.bias", KV, scale=0.1)
        p.w(b + "time_mix_receptance.weight", E, E)
        p.bias(b + "time_mix_receptance.bias", E, scale=0.1)
        p.w(b + "time_mix_gate.weight", E, E)
        p.w(b + "time_mix_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, E // HS, HKV, F, L, D=HS)
    md.update({"wkv.head_size": HS, "time_mix_extra_dim": ED,
               "time_decay_extra_dim": DD, "token_shift_count": 1})
    return "rwkv6qwen2", md, p.tensors


@spec("rwkv6")
def spec_rwkv6():
    """Plain RWKV-6 world (rwkv6.cpp): token-shift lerp stacks, wkv6 linear
    attention with bonus (time_mix_first) + per-head group norm, silu'd gate,
    squared-relu channel mix, 2^(il//rescale_every) weight rescale.
    Shapes per create_tensors llama-model.cpp:5635 (ED/DD = the reference
    converter's E<4096 defaults)."""
    E, HS, F, L = 64, 16, 128, 2
    ED, DD = 32, 64
    H = E // HS
    p = P("rwkv6")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("token_embd_norm.weight", E)
    p.bias("token_embd_norm.bias", E)
    p.norm("output_norm.weight", E)
    p.bias("output_norm.bias", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.bias(b + "attn_norm.bias", E)
        p.norm(b + "attn_norm_2.weight", E)
        p.bias(b + "attn_norm_2.bias", E)
        p.tensors[b + "time_mix_lerp_x.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.1 + 0.5)
        p.tensors[b + "time_mix_lerp_fused.weight"] = (
            p.rng.standard_normal((5, 1, 1, E)).astype(np.float32) * 0.1
            + 0.5)
        p.w(b + "time_mix_w1.weight", 5 * ED, E, scale=0.1)
        p.tensors[b + "time_mix_w2.weight"] = (
            p.rng.standard_normal((5, E, ED)).astype(np.float32) * 0.1)
        p.tensors[b + "time_mix_first.weight"] = (
            p.rng.standard_normal((H, HS)).astype(np.float32))
        p.bias(b + "time_mix_decay.weight", E, scale=0.3)
        p.w(b + "time_mix_decay_w1.weight", DD, E, scale=0.1)
        p.w(b + "time_mix_decay_w2.weight", E, DD, scale=0.1)
        p.w(b + "time_mix_key.weight", E, E)
        p.w(b + "time_mix_value.weight", E, E)
        p.w(b + "time_mix_receptance.weight", E, E)
        p.w(b + "time_mix_gate.weight", E, E)
        p.norm(b + "time_mix_ln.weight", E)
        p.bias(b + "time_mix_ln.bias", E)
        p.w(b + "time_mix_output.weight", E, E)
        p.tensors[b + "channel_mix_lerp_k.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.1 + 0.5)
        p.tensors[b + "channel_mix_lerp_r.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.1 + 0.5)
        p.w(b + "channel_mix_key.weight", F, E)
        p.w(b + "channel_mix_value.weight", E, F)
        p.w(b + "channel_mix_receptance.weight", E, E)
    md = {"context_length": 1048576, "embedding_length": E, "block_count": L,
          "feed_forward_length": F, "attention.layer_norm_epsilon": 1e-5,
          "attention.head_count": 0, "vocab_size": V,
          "wkv.head_size": HS, "rescale_every_n_layers": 2,
          "time_mix_extra_dim": ED, "time_decay_extra_dim": DD}
    return "rwkv6", md, p.tensors


@spec("rwkv7")
def spec_rwkv7():
    """Plain RWKV-7 (rwkv7.cpp): w/a/v/g low-rank stacks, 6-way fused lerp,
    k_k/k_a/r_k vectors, value-residual mixing toward layer 0 (dummy v0/v1/v2
    on layer 0 = copies of a0/a1/a2, reference converter behavior). Shapes
    per create_tensors llama-model.cpp:5750 (v rank differs from iclr rank
    to pin the layer-0-uses-iclr-rank rule). head_size MUST be 64 (the real
    rwkv7 head size): the reference's AVX wkv7 kernel assumes
    head_size % GGML_F32_STEP == 0 (ggml-cpu/ops.cpp:10041 "There shouldn't
    be left-overs") and reads/writes out of bounds for smaller heads."""
    E, HS, F, L = 128, 64, 128, 2
    RD, RA, RV, RG = 16, 16, 32, 16
    p = P("rwkv7")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("token_embd_norm.weight", E)
    p.bias("token_embd_norm.bias", E)
    p.norm("output_norm.weight", E)
    p.bias("output_norm.bias", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.bias(b + "attn_norm.bias", E)
        p.norm(b + "attn_norm_2.weight", E)
        p.bias(b + "attn_norm_2.bias", E)
        p.tensors[b + "time_mix_lerp_fused.weight"] = (
            p.rng.standard_normal((6, 1, 1, E)).astype(np.float32) * 0.1
            + 0.5)
        p.bias(b + "time_mix_w0.weight", E, scale=0.3)
        p.w(b + "time_mix_w1.weight", RD, E, scale=0.1)
        p.w(b + "time_mix_w2.weight", E, RD, scale=0.1)
        p.bias(b + "time_mix_a0.weight", E, scale=0.3)
        p.w(b + "time_mix_a1.weight", RA, E, scale=0.1)
        p.w(b + "time_mix_a2.weight", E, RA, scale=0.1)
        if i == 0:   # dummies: the converter copies a0/a1/a2 (iclr rank)
            p.tensors[b + "time_mix_v0.weight"] = p.tensors[b + "time_mix_a0.weight"]
            p.tensors[b + "time_mix_v1.weight"] = p.tensors[b + "time_mix_a1.weight"]
            p.tensors[b + "time_mix_v2.weight"] = p.tensors[b + "time_mix_a2.weight"]
        else:
            p.bias(b + "time_mix_v0.weight", E, scale=0.3)
            p.w(b + "time_mix_v1.weight", RV, E, scale=0.1)
            p.w(b + "time_mix_v2.weight", E, RV, scale=0.1)
        p.w(b + "time_mix_g1.weight", RG, E, scale=0.1)
        p.w(b + "time_mix_g2.weight", E, RG, scale=0.1)
        p.tensors[b + "time_mix_k_k.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.3 + 1.0)
        p.tensors[b + "time_mix_k_a.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.3)
        p.tensors[b + "time_mix_r_k.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.3)
        p.w(b + "time_mix_key.weight", E, E)
        p.w(b + "time_mix_value.weight", E, E)
        p.w(b + "time_mix_receptance.weight", E, E)
        p.norm(b + "time_mix_ln.weight", E)
        p.bias(b + "time_mix_ln.bias", E)
        p.w(b + "time_mix_output.weight", E, E)
        p.tensors[b + "channel_mix_lerp_k.weight"] = (
            p.rng.standard_normal(E).astype(np.float32) * 0.1 + 0.5)
        p.w(b + "channel_mix_key.weight", F, E)
        p.w(b + "channel_mix_value.weight", E, F)
    md = {"context_length": 1048576, "embedding_length": E, "block_count": L,
          "feed_forward_length": F, "attention.layer_norm_epsilon": 1e-5,
          "attention.head_count": 0, "vocab_size": V,
          "wkv.head_size": HS, "attention.decay_lora_rank": RD,
          "attention.iclr_lora_rank": RA,
          "attention.value_residual_mix_lora_rank": RV,
          "attention.gate_lora_rank": RG}
    return "rwkv7", md, p.tensors


@spec("cogvlm")
def spec_cogvlm():
    """CogVLM text path (cogvlm.cpp): per-UBATCH expert switch between text
    tensors and vision-expert (vis_*) tensors — text ubatches use the plain
    llama graph with fused wqkv and NEOX rope. The vis_* bank must exist for
    the reference to load; it is exercised only by image ubatches."""
    E, H, F, L = 64, 4, 128, 2
    p = P("cogvlm")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.w(b + "attn_output.weight", E, E)
        p.w(b + "vis_attn_qkv.weight", 3 * E, E)
        p.w(b + "vis_attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
        p.w(b + "vis_gate.weight", F, E)
        p.w(b + "vis_up.weight", F, E)
        p.w(b + "vis_down.weight", E, F)
    return "cogvlm", _base_md(E, H, H, F, L), p.tensors


@spec("phimoe")
def spec_phimoe():
    """PhiMoE — the phi3 block with RMS norms THAT CARRY BIASES, separate
    q/k/v with biases, lm-head bias, softmax MoE with renormalized weights
    (phi3.cpp MoE branch; create_tensors llama-model.cpp:3803)."""
    E, H, HKV, L, D = 64, 4, 2, 2, 16
    NE, KE, FE = 4, 2, 48
    p = P("phimoe")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.bias("output_norm.bias", E)
    p.w("output.weight", V, E)
    p.bias("output.bias", V)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.bias(b + "attn_norm.bias", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.bias(b + "attn_q.bias", H * D, scale=0.1)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.bias(b + "attn_k.bias", HKV * D, scale=0.1)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.bias(b + "attn_v.bias", HKV * D, scale=0.1)
        p.w(b + "attn_output.weight", E, H * D)
        p.bias(b + "attn_output.bias", E, scale=0.1)
        p.norm(b + "ffn_norm.weight", E)
        p.bias(b + "ffn_norm.bias", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        _moe_bank(p, b, NE, FE, E)
    md = _base_md(E, H, HKV, FE, L, D=D)
    md.update({"expert_count": NE, "expert_used_count": KE})
    return "phimoe", md, p.tensors


@spec("nemotron_h_moe")
def spec_nemotron_h_moe():
    """Nemotron-H-MoE — the nemotron-h hybrid (per layer one of mamba2 /
    attention / FFN) where FFN layers run a GATE-LESS relu² sigmoid MoE with
    a selection bias plus a gate-less relu² shared expert
    (nemotron-h.cpp build_ffn_layer; create_tensors llama-model.cpp:5408)."""
    E, H, HKV, D = 64, 4, 2, 16
    di, ds, dc, nh, G = 64, 8, 4, 4, 1
    NE, KE, FE, SHF = 4, 2, 48, 64
    pattern = ["M", "*", "-", "M", "-"]
    p = P("nemotron_h_moe")
    _head(p, E)
    conv_dim = di + 2 * G * ds
    for il, kind in enumerate(pattern):
        b = f"blk.{il}."
        p.norm(b + "attn_norm.weight", E)
        if kind == "M":
            p.w(b + "ssm_in.weight", 2 * di + 2 * G * ds + nh, E)
            p.w(b + "ssm_conv1d.weight", conv_dim, dc, scale=0.3)
            p.bias(b + "ssm_conv1d.bias", conv_dim)
            p.bias(b + "ssm_dt.bias", nh, scale=0.3)
            # ssm_a stores A = -exp(A_log) (always negative — positive
            # decay exponents blow up the 128-token state recurrence)
            p.tensors[b + "ssm_a"] = -np.exp(
                p.rng.standard_normal((nh, 1)).astype(np.float32) * 0.5)
            p.bias(b + "ssm_d", (nh, 1), scale=0.5)
            p.norm(b + "ssm_norm.weight", (G, di // G))
            p.w(b + "ssm_out.weight", E, di)
        elif kind == "*":
            p.w(b + "attn_q.weight", H * D, E)
            p.w(b + "attn_k.weight", HKV * D, E)
            p.w(b + "attn_v.weight", HKV * D, E)
            p.w(b + "attn_output.weight", E, H * D)
        else:
            p.w(b + "ffn_gate_inp.weight", NE, E)
            p.bias(b + "exp_probs_b.bias", NE, scale=0.5)
            p.w(b + "ffn_up_exps.weight", NE, FE, E)
            p.w(b + "ffn_down_exps.weight", NE, E, FE)
            p.w(b + "ffn_up_shexp.weight", SHF, E)
            p.w(b + "ffn_down_shexp.weight", E, SHF)
    md = _base_md(E, H, HKV, 0, len(pattern), D=D)
    md["attention.head_count_kv"] = [
        HKV if t == "*" else 0 for t in pattern]
    md["feed_forward_length"] = [128 if t == "-" else 0 for t in pattern]
    md.update({"ssm.conv_kernel": dc, "ssm.inner_size": di,
               "ssm.state_size": ds, "ssm.time_step_rank": nh,
               "ssm.group_count": G,
               "expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE,
               "expert_shared_feed_forward_length": SHF,
               "expert_shared_count": 1,
               "expert_weights_norm": True, "expert_weights_scale": 1.0})
    return "nemotron_h_moe", md, p.tensors


@spec("qwen3vl")
def spec_qwen3vl():
    """Qwen3-VL text stack — qwen3 blocks (per-head q/k RMS norms pre-rope)
    with IMROPE positions (interleaved M-RoPE, qwen3vl.cpp ggml_rope_multi);
    text-only streams carry equal t/h/w positions, which reduces IMROPE to
    plain NEOX — the image path drives the interleaved mapping."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("qwen3vl")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F, D=D)
    for i in range(L):
        p.norm(f"blk.{i}.attn_q_norm.weight", D)
        p.norm(f"blk.{i}.attn_k_norm.weight", D)
    md = _base_md(E, H, HKV, F, L, D=D)
    md["rope.dimension_sections"] = [4, 2, 2, 0]
    md["n_deepstack_layers"] = 0
    return "qwen3vl", md, p.tensors


@spec("qwen3vlmoe")
def spec_qwen3vlmoe():
    """Qwen3-VL-MoE text stack — the qwen3vl attention with the qwen3moe
    softmax-normalized expert FFN (qwen3vl-moe.cpp)."""
    E, H, HKV, L, D = 64, 4, 2, 2, 16
    NE, KE, FE = 4, 2, 48
    p = P("qwen3vlmoe")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        _moe_bank(p, b, NE, FE, E)
    md = _base_md(E, H, HKV, 128, L, D=D)
    md["rope.dimension_sections"] = [4, 2, 2, 0]
    md["n_deepstack_layers"] = 0
    md.update({"expert_count": NE, "expert_used_count": KE,
               "expert_feed_forward_length": FE})
    return "qwen3vlmoe", md, p.tensors


@spec("plamo2")
def spec_plamo2():
    """PLaMo-2 — hybrid of PLaMo-2 mamba layers (per-head-interleaved z|x
    in-proj, conv+silu, [B|C|dt] selection with per-stream RMS norms,
    per-head dt projection, scalar-decay scan) and fused-wqkv attention
    layers with per-head qk norms; pre/post norms around both mixer and
    FFN; fused SWIGLU gate‖up (plamo2.cpp)."""
    E, H, HKV, F, D = 64, 4, 2, 64, 16
    di, ds, dc, nh = 64, 8, 4, 4
    dt_dim = 64                                  # max(64, E/16)
    HKV_arr = [0, 2, 0, 2]
    p = P("plamo2")
    _head(p, E)
    for il, hkv in enumerate(HKV_arr):
        b = f"blk.{il}."
        p.norm(b + "attn_norm.weight", E)
        if hkv == 0:                             # mamba layer
            p.w(b + "ssm_in.weight", 2 * di, E)
            p.w(b + "ssm_conv1d.weight", di, dc, scale=0.3)
            p.w(b + "ssm_x.weight", dt_dim + 2 * ds, di)
            p.w(b + "ssm_dt.weight", nh, dt_dim, scale=0.1)
            p.bias(b + "ssm_dt.bias", nh, scale=0.3)
            p.tensors[b + "ssm_a"] = -np.exp(
                p.rng.standard_normal(nh).astype(np.float32) * 0.5)
            p.bias(b + "ssm_d", nh, scale=0.5)
            p.w(b + "ssm_out.weight", E, di)
            p.norm(b + "ssm_dt_norm", dt_dim)
            p.norm(b + "ssm_b_norm", ds)
            p.norm(b + "ssm_c_norm", ds)
        else:                                    # attention layer
            p.w(b + "attn_qkv.weight", (H + 2 * hkv) * D, E)
            p.norm(b + "attn_q_norm.weight", (H, D))    # per-head weights
            p.norm(b + "attn_k_norm.weight", (hkv, D))
            p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "post_attention_norm", E)
        p.norm(b + "ffn_norm.weight", E)
        p.norm(b + "post_ffw_norm", E)
        p.w(b + "ffn_up.weight", 2 * F, E)       # fused gate‖up
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, len(HKV_arr), D=D)
    md["attention.head_count_kv"] = HKV_arr
    md.update({"ssm.conv_kernel": dc, "ssm.inner_size": di,
               "ssm.state_size": ds, "ssm.time_step_rank": nh,
               "ssm.group_count": 0})
    return "plamo2", md, p.tensors


@spec("gemma3n")
def spec_gemma3n():
    """Gemma3n — AltUp multi-stream hidden state, LAUREL low-rank residual,
    per-layer input embeddings, gated per-layer corrections, activation
    sparsity, iSWA pattern 5 (gemma3n-iswa.cpp). This reference vintage
    IGNORES the altup KVs and uses the hparams.h defaults (n_altup 4,
    n_embd_altup 256, laurel_rank 64, kv_from_start 20 > L here — the
    shared-KV tail is exercised by the structural test instead). Five
    layers so iSWA pattern 5 includes one full-attention layer (the
    reference's unused full-cache inputs crash buffer assignment), and
    tied embeddings (this vintage never requests output.weight)."""
    # F large so ggml's unbiased sparsity std (gemma3n-iswa.cpp:314, /(N-1))
    # and the true biased convention (HF / original JAX, /N) coincide — our
    # forward implements the biased one; the HF parity test pins it exactly.
    E, H, HKV, F, L, D = 64, 4, 2, 2048, 5, 16
    A, EA, RANK = 4, 256, 64
    p = P("gemma3n")
    p.w("token_embd.weight", V, E, scale=0.02 / 8.0)   # ×sqrt(E) in-graph
    p.norm("output_norm.weight", E)
    p.w("per_layer_token_embd.weight", V, EA * L, scale=0.05)
    p.w("per_layer_model_proj.weight", EA * L, E)
    p.norm("per_layer_proj_norm.weight", EA)
    p.w("altup_proj.weight", A - 1, E, E)
    p.w("altup_unembd_proj.weight", A - 1, E, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "post_attention_norm.weight", E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
        p.norm(b + "post_ffw_norm.weight", E)
        p.w(b + "inp_gate.weight", EA, E)
        p.w(b + "proj.weight", E, EA)
        p.norm(b + "post_norm.weight", E)
        p.w(b + "altup_correct_coef.weight", A, A, scale=0.2)
        p.bias(b + "altup_correct_scale.weight", E, scale=0.5)
        p.w(b + "altup_predict_coef.weight", A * A, A, scale=0.1)
        p.w(b + "altup_router.weight", A, E)
        p.norm(b + "altup_router_norm.weight", E)
        p.w(b + "laurel_l.weight", RANK, E)
        p.w(b + "laurel_r.weight", E, RANK)
        p.norm(b + "laurel_post_norm.weight", E)
    md = _base_md(E, H, HKV, F, L, D=D)
    md.update({"attention.sliding_window": 32,
               "rope.freq_base_swa": 10000.0,
               "final_logit_softcapping": 30.0})
    return "gemma3n", md, p.tensors




@spec("qwen2")
def spec_qwen2():
    """Qwen2 (llama graph + qkv biases, NEOX rope; src/models/qwen2.cpp)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("qwen2")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(L):
        b = f"blk.{i}."
        p.bias(b + "attn_q.bias", E, scale=0.1)
        p.bias(b + "attn_k.bias", HKV * 16, scale=0.1)
        p.bias(b + "attn_v.bias", HKV * 16, scale=0.1)
    return "qwen2", _base_md(E, H, HKV, F, L), p.tensors


@spec("qwen3")
def spec_qwen3():
    """Qwen3 (llama graph + per-head q/k RMS norms, NEOX rope;
    src/models/qwen3.cpp)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("qwen3")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F, D=D)
    for i in range(L):
        p.norm(f"blk.{i}.attn_q_norm.weight", D)
        p.norm(f"blk.{i}.attn_k_norm.weight", D)
    return "qwen3", _base_md(E, H, HKV, F, L, D=D), p.tensors


@spec("internlm2")
def spec_internlm2():
    """InternLM2 (split q/k/v llama graph, rope NORM;
    llama-model.cpp:4077 create_tensors)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("internlm2")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    return "internlm2", _base_md(E, H, HKV, F, L), p.tensors


@spec("chatglm")
def spec_chatglm():
    """ChatGLM/GLM-3 (fused wqkv + bias, HALF-dim NEOX rope, fused 2F
    swiglu ffn_up; src/models/chatglm.cpp, create_tensors :5193)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    p = P("chatglm")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_qkv.weight", E + 2 * HKV * D, E)
        p.bias(b + "attn_qkv.bias", E + 2 * HKV * D, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_up.weight", 2 * F, E)          # fused gate‖up swiglu
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, L, D=D)
    md["rope.dimension_count"] = D // 2             # partial rotary
    return "chatglm", md, p.tensors


@spec("jais")
def spec_jais():
    """JAIS (ALiBi, biased LayerNorms everywhere, gated gelu FFN with
    biases; src/models/jais.cpp, create_tensors :5159)."""
    E, H, F, L = 64, 4, 128, 2
    p = P("jais")
    p.w("token_embd.weight", V, E, scale=0.02)
    _ln(p, "output_norm", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        _ln(p, b + "attn_norm", E)
        p.w(b + "attn_qkv.weight", 3 * E, E)
        p.bias(b + "attn_qkv.bias", 3 * E, scale=0.1)
        p.w(b + "attn_output.weight", E, E)
        p.bias(b + "attn_output.bias", E, scale=0.1)
        _ln(p, b + "ffn_norm", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.bias(b + "ffn_gate.bias", F, scale=0.1)
        p.w(b + "ffn_up.weight", F, E)
        p.bias(b + "ffn_up.bias", F, scale=0.1)
        p.w(b + "ffn_down.weight", E, F)
        p.bias(b + "ffn_down.bias", E, scale=0.1)
    md = _base_md(E, H, H, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-5,
               "attention.max_alibi_bias": 8.0})
    return "jais", md, p.tensors


@spec("cohere2")
def spec_cohere2():
    """Command-R7B (cohere2): iSWA pattern 4, rope ONLY on sliding layers,
    parallel attn+ffn residual off one shared LayerNorm, logit scale, tied
    embeddings (src/models/cohere2-iswa.cpp; llama-model.cpp:1534)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 4
    p = P("cohere2")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", HKV * 16, E)
        p.w(b + "attn_v.weight", HKV * 16, E)
        p.w(b + "attn_output.weight", E, E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-5,
               "attention.sliding_window": 16, "logit_scale": 0.25})
    return "cohere2", md, p.tensors


@spec("olmo")
def spec_olmo():
    """OLMo-1 (NON-parametric LayerNorms — no norm weights ship at all;
    optional clamp_kqv; tied output; src/models/olmo.cpp,
    create_tensors llama-model.cpp:4610-ish)."""
    E, H, HKV, F, L = 64, 4, 4, 128, 2
    p = P("olmo")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.w(b + "attn_q.weight", E, E)
        p.w(b + "attn_k.weight", E, E)
        p.w(b + "attn_v.weight", E, E)
        p.w(b + "attn_output.weight", E, E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, H, HKV, F, L)
    del md["attention.layer_norm_rms_epsilon"]
    md.update({"attention.layer_norm_epsilon": 1e-5,
               "attention.clamp_kqv": 8.0})
    return "olmo", md, p.tensors


@spec("minicpm")
def spec_minicpm():
    """MiniCPM (muP: embedding_scale 12, residual 1.4/sqrt(L), logit scale
    256/E — the hparams DEFAULTS when the KVs are absent; tied output;
    llama-model.cpp:761-784)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("minicpm")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    _llama_layers(p, L, E, H, HKV, F)
    return "minicpm", _base_md(E, H, HKV, F, L), p.tensors


@spec("exaone")
def spec_exaone():
    """EXAONE-3 (llama graph, rope NORM w/ optional rope_freqs;
    src/models/exaone.cpp)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("exaone")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    return "exaone", _base_md(E, H, HKV, F, L), p.tensors


@spec("dream")
def spec_dream():
    """Dream 7B diffusion LM — qwen2-shaped tensors with NON-causal
    attention (src/models/dream.cpp:17 causal=false; the perplexity dump
    exercises the bidirectional graph deterministically)."""
    E, H, HKV, F, L = 64, 4, 2, 128, 2
    p = P("dream")
    _head(p, E)
    _llama_layers(p, L, E, H, HKV, F)
    for i in range(L):
        b = f"blk.{i}."
        p.bias(b + "attn_q.bias", E, scale=0.1)
        p.bias(b + "attn_k.bias", HKV * 16, scale=0.1)
        p.bias(b + "attn_v.bias", HKV * 16, scale=0.1)
    md = _base_md(E, H, HKV, F, L)
    md["attention.causal"] = False
    return "dream", md, p.tensors


@spec("llada-moe")
def spec_llada_moe():
    """LLaDA-MoE diffusion LM — qwen3moe-shaped MoE with per-head q/k norms
    and NON-causal attention (src/models/llada-moe.cpp)."""
    E, H, HKV, F, L, D = 64, 4, 2, 128, 2, 16
    NE, KE, FE = 4, 2, 48
    p = P("llada-moe")
    _head(p, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.w(b + "attn_q.weight", H * D, E)
        p.w(b + "attn_k.weight", HKV * D, E)
        p.w(b + "attn_v.weight", HKV * D, E)
        p.w(b + "attn_output.weight", E, H * D)
        p.norm(b + "attn_q_norm.weight", D)
        p.norm(b + "attn_k_norm.weight", D)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate_inp.weight", NE, E)
        p.w(b + "ffn_gate_exps.weight", NE, FE, E)
        p.w(b + "ffn_down_exps.weight", NE, E, FE)
        p.w(b + "ffn_up_exps.weight", NE, FE, E)
    md = _base_md(E, H, HKV, F, L, D=D)
    md.update({"attention.causal": False, "expert_count": NE,
               "expert_used_count": KE, "expert_feed_forward_length": FE})
    return "llada-moe", md, p.tensors


@spec("arwkv7")
def spec_arwkv7():
    """ARWKV-7 (src/models/arwkv7.cpp): rwkv7 time mix (decay/iclr/value-mix
    low-rank stacks, v_first residual, L2-normed kk, per-head r·k bonus)
    between RMS norms with a qwen silu FFN; one token-shift stream; no
    gating (5-slot fused lerp), no time_mix_ln. head_size must be 64: the
    reference's AVX-512 wkv7 kernel strides GGML_F32_STEP=64 floats per
    j-iteration, overreading across heads whenever head_size < 64
    (ggml-cpu/ops.cpp:9996 SIMD loop) — real RWKV7 checkpoints all use 64."""
    E, HS, F, L = 128, 64, 128, 2              # head_size 64 → 2 wkv heads
    DR, IR, VR = 16, 16, 16                    # decay / iclr / v-mix ranks
    p = P("arwkv7")
    p.w("token_embd.weight", V, E, scale=0.02)
    p.norm("output_norm.weight", E)
    p.w("output.weight", V, E)
    for i in range(L):
        b = f"blk.{i}."
        p.norm(b + "attn_norm.weight", E)
        p.bias(b + "time_mix_w0.weight", E, scale=0.3)
        p.w(b + "time_mix_w1.weight", DR, E, scale=0.1)
        p.w(b + "time_mix_w2.weight", E, DR, scale=0.1)
        p.bias(b + "time_mix_a0.weight", E, scale=0.3)
        p.w(b + "time_mix_a1.weight", IR, E, scale=0.1)
        p.w(b + "time_mix_a2.weight", E, IR, scale=0.1)
        p.bias(b + "time_mix_v0.weight", E, scale=0.3)
        p.w(b + "time_mix_v1.weight", (IR if i == 0 else VR), E, scale=0.1)
        p.w(b + "time_mix_v2.weight", E, (IR if i == 0 else VR), scale=0.1)
        p.tensors[b + "time_mix_lerp_fused.weight"] = (
            p.rng.standard_normal((5, 1, 1, E)).astype(np.float32) * 0.3)
        p.bias(b + "time_mix_k_k.weight", E, scale=0.3)
        p.bias(b + "time_mix_k_a.weight", E, scale=0.3)
        p.bias(b + "time_mix_r_k.weight", E, scale=0.3)
        p.w(b + "time_mix_key.weight", E, E)
        p.w(b + "time_mix_value.weight", E, E)
        p.w(b + "time_mix_receptance.weight", E, E)
        p.w(b + "time_mix_output.weight", E, E)
        p.norm(b + "ffn_norm.weight", E)
        p.w(b + "ffn_gate.weight", F, E)
        p.w(b + "ffn_up.weight", F, E)
        p.w(b + "ffn_down.weight", E, F)
    md = _base_md(E, E // HS, E // HS, F, L, D=HS)
    md.update({"wkv.head_size": HS, "attention.decay_lora_rank": DR,
               "attention.iclr_lora_rank": IR,
               "attention.value_residual_mix_lora_rank": VR,
               "token_shift_count": 1})
    return "arwkv7", md, p.tensors
