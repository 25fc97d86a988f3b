"""Architecture registry: GGUF ``general.architecture`` → forward builder.

Counterpart of the LLM_ARCH registry + build_graph dispatch
(src/llama-arch.{h,cpp}, src/llama-model.cpp:7625). Many architectures share
the llama-family forward, differentiated by hparams + optional tensors.
"""

from __future__ import annotations

from typing import Callable

from .deepseek2 import deepseek2_forward
from .llama import llama_forward

ForwardFn = Callable  # (params, hp, tokens, pos, cache) -> (logits, cache)

_REGISTRY: dict[str, ForwardFn] = {}


def register(arch: str, fn: ForwardFn) -> None:
    _REGISTRY[arch] = fn


def get_forward(arch: str) -> ForwardFn:
    fn = _REGISTRY.get(arch)
    if fn is None:
        raise NotImplementedError(
            f"architecture {arch!r} not supported yet; known: {sorted(_REGISTRY)}"
        )
    return fn


def supported_archs() -> list[str]:
    return sorted(_REGISTRY)


# llama-family archs that the shared forward covers via optional tensors
for _arch in (
    "llama", "llama2", "mistral", "mixtral", "tinyllama",
    "qwen2", "qwen2moe", "qwen3", "qwen3moe",
    "stablelm", "olmo", "olmo2", "exaone", "granite", "internlm2", "smollm3",
    # optional-tensor + hparams variants of the same shared forward
    "gemma", "gemma2", "gemma3", "gpt-oss", "gptoss", "phi3",
    # classic GPT family: LayerNorm / parallel residual / learned positions
    "gpt2", "gptneox", "falcon", "starcoder", "starcoder2", "phi2",
    "command-r", "cohere2", "dbrx", "nemotron", "minicpm", "refact", "jais",
    "bloom", "mpt", "glm4", "chatglm",
    "olmoe", "seed_oss", "hunyuan-dense", "ernie4_5", "exaone4", "qwen2vl",
    "llama4", "granitemoe",
    "arcee", "glm4moe", "dots1", "ernie4_5-moe", "hunyuan-moe", "apertus",
    "baichuan", "xverse", "orion", "qwen", "codeshell", "deepseek",
    "arctic", "chameleon", "grok",
    "bailingmoe", "mistral3", "smallthinker", "maincoder", "pangu-embedded",
    "bitnet",
    # wave 3: per-layer head/FFN arrays, adjugate experts, gated attention
    "deci", "openelm", "plamo", "minimax-m2", "bailingmoe2", "exaone-moe",
    "grovemoe", "afmoe", "mimo2",
    "plamo3",   # fused qkv + dual post-norms + fused swiglu gate_up
    "llama-embed",   # llama graph used for embeddings (pooling host-side)
    "cogvlm",        # text path: fused wqkv llama graph (vis_* bank for images)
    "phimoe",        # phi3 blocks with RMS+bias norms and softmax MoE
    # qwen3vl family: qwen3(-moe) text stack; images ride IMROPE positions
    # + deepstack embeddings through the multimodal pipeline
    "qwen3vl", "qwen3vlmoe",
):
    register(_arch, llama_forward)

register("deepseek2", deepseek2_forward)
register("minicpm3", deepseek2_forward)  # MLA + muP scalings via hparams
register("plm", deepseek2_forward)       # MLA (direct q) + relu² no-gate FFN

from .mamba import mamba_forward  # noqa: E402

register("mamba", mamba_forward)
register("mamba2", mamba_forward)  # mixer dispatch on ssm_n_group

from .jamba import jamba_forward  # noqa: E402

register("jamba", jamba_forward)

from .hybrid import hybrid_forward  # noqa: E402

register("granitehybrid", hybrid_forward)   # granite-4 / bamba
register("nemotron_h", hybrid_forward)
register("nemotron_h_moe", hybrid_forward)  # gate-less relu² sigmoid MoE
register("falcon-h1", hybrid_forward)

from .rwkv import arwkv7_forward, rwkv6_forward, rwkv6qwen2_forward, rwkv7_forward  # noqa: E402

register("rwkv6", rwkv6_forward)
register("rwkv7", rwkv7_forward)
register("arwkv7", arwkv7_forward)
register("rwkv6qwen2", rwkv6qwen2_forward)

from .lfm2 import lfm2_forward  # noqa: E402

register("lfm2", lfm2_forward)
register("lfm2moe", lfm2_forward)

from .plamo2 import plamo2_forward  # noqa: E402

register("plamo2", plamo2_forward)

from .gemma3n import gemma3n_forward  # noqa: E402

register("gemma3n", gemma3n_forward)

from .qwen3next import qwen3next_forward  # noqa: E402

register("qwen3next", qwen3next_forward)

from .llada import llada_forward  # noqa: E402

register("llada", llada_forward)
register("llada-moe", llada_forward)
register("dream", llada_forward)
register("rnd1", llada_forward)   # qwen3moe-derived diffusion (rnd1.cpp)
