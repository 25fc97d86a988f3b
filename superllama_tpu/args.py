"""Declarative CLI option table with environment-variable mirrors.

Counterpart of common/arg.cpp (the ~300-flag `common_arg` table): every
option declares its flags, an env-var alias (LLAMA_ARG_*), help text, and
the set of tools it applies to. `add_options(parser, tool)` attaches the
relevant subset to an argparse parser; env values become defaults
(flag > env > default precedence, common_params_parse semantics).
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field
from typing import Any, Callable

ALL = frozenset({"run", "serve", "perplexity", "bench", "imatrix",
                 "diffusion"})
GEN = frozenset({"run", "serve", "diffusion"})          # generation tools
SRV = frozenset({"serve"})
RUN = frozenset({"run", "diffusion"})


@dataclass
class Opt:
    flags: tuple[str, ...]
    help: str
    tools: frozenset = ALL
    env: str | None = None          # explicit env name; auto when None
    type: Callable | None = None
    default: Any = None
    action: str | None = None
    choices: tuple | None = None
    dest: str | None = None
    metavar: str | None = None
    nargs: str | None = None
    repeatable: bool = False

    @property
    def env_name(self) -> str:
        if self.env:
            return self.env
        base = max(self.flags, key=len).lstrip("-").replace("-", "_").upper()
        return f"LLAMA_ARG_{base}"

    @property
    def dest_name(self) -> str:
        return self.dest or max(self.flags, key=len).lstrip("-").replace(
            "-", "_")


def _o(*flags, **kw) -> Opt:
    return Opt(tuple(flags), **kw)


# ----------------------------------------------------------------- the table
# Mirrors the reference option groups (common/arg.cpp): model/load, context,
# rope/yarn, sampling, grammar, speculative, server, enterprise/fork,
# logging. Flag names and env aliases match the reference where a direct
# counterpart exists.

OPTIONS: list[Opt] = [
    # ---- model / load
    _o("-m", "--model", help="GGUF model path", env="LLAMA_ARG_MODEL"),
    _o("--keep-quantized", help="keep repackable weights packed for the "
       "fused dequant-matmul path", action="store_true"),
    _o("--lora", help="LoRA adapter FILE[:SCALE] (repeatable)",
       repeatable=True, metavar="FILE[:SCALE]"),
    _o("--control-vector", help="control vector FILE[:SCALE] (repeatable)",
       repeatable=True, metavar="FILE[:SCALE]"),
    _o("--override-kv", help="override a GGUF metadata key: KEY=TYPE:VALUE "
       "(repeatable)", repeatable=True, metavar="KEY=TYPE:VALUE"),
    _o("--decrypt-key", help="AES-256-GCM key file for encrypted models"),
    # ---- context
    _o("-c", "--ctx-size", help="context window size", type=int,
       default=2048, env="LLAMA_ARG_CTX_SIZE"),
    _o("-b", "--batch-size", help="logical batch size (prompt chunking)",
       type=int, default=512, env="LLAMA_ARG_BATCH"),
    _o("-ub", "--ubatch-size", help="physical batch size per device step",
       type=int, default=512, env="LLAMA_ARG_UBATCH"),
    _o("-n", "--n-predict", help="tokens to generate", type=int,
       default=128, tools=GEN),
    _o("--keep", help="tokens kept from the initial prompt on context "
       "shift", type=int, default=0, tools=GEN),
    _o("--kv-dtype", help="KV cache dtype", default="bfloat16",
       choices=("bfloat16", "float32", "q8_0", "q4_0"),
       env="LLAMA_ARG_CACHE_TYPE_K"),
    _o("--flash-attn", help="flash attention: on/off/auto (auto = Pallas "
       "kernels on TPU)", default="auto", choices=("on", "off", "auto"),
       env="LLAMA_ARG_FLASH_ATTN"),
    # ---- rope / long context
    _o("--rope-scaling", help="rope scaling type",
       choices=("none", "linear", "yarn"), env="LLAMA_ARG_ROPE_SCALING_TYPE"),
    _o("--rope-freq-base", help="rope base frequency override", type=float,
       env="LLAMA_ARG_ROPE_FREQ_BASE"),
    _o("--rope-freq-scale", help="rope frequency scale override",
       type=float, env="LLAMA_ARG_ROPE_FREQ_SCALE"),
    _o("--yarn-orig-ctx", help="YaRN original context size", type=int,
       env="LLAMA_ARG_YARN_ORIG_CTX"),
    _o("--yarn-attn-factor", help="YaRN attention magnitude factor",
       type=float, env="LLAMA_ARG_YARN_ATTN_FACTOR"),
    _o("--grp-attn-n", help="self-extend group size (seq_div factor)",
       type=int, default=1, tools=RUN),
    _o("--grp-attn-w", help="self-extend window width", type=int,
       default=512, tools=RUN),
    # ---- sampling (common_params_sampling)
    _o("-s", "--seed", help="RNG seed", type=int, default=0, tools=GEN),
    _o("--temp", help="temperature (<=0 → greedy)", type=float,
       default=0.8, tools=GEN),
    _o("--top-k", help="top-k", type=int, default=40, tools=GEN),
    _o("--top-p", help="top-p (nucleus)", type=float, default=0.95,
       tools=GEN),
    _o("--min-p", help="min-p", type=float, default=0.05, tools=GEN),
    _o("--typical", help="locally-typical sampling p", type=float,
       default=1.0, dest="typical_p", tools=GEN),
    _o("--xtc-probability", help="XTC removal probability", type=float,
       default=0.0, tools=GEN),
    _o("--xtc-threshold", help="XTC threshold", type=float, default=0.1,
       tools=GEN),
    _o("--top-n-sigma", help="top-n-sigma cutoff (-1 = off)", type=float,
       default=-1.0, tools=GEN),
    _o("--dynatemp-range", help="dynamic temperature range", type=float,
       default=0.0, tools=GEN),
    _o("--dynatemp-exp", help="dynamic temperature exponent", type=float,
       default=1.0, dest="dynatemp_exponent", tools=GEN),
    _o("--repeat-last-n", help="penalty window (tokens)", type=int,
       default=64, dest="penalty_last_n", tools=GEN),
    _o("--repeat-penalty", help="repetition penalty", type=float,
       default=1.0, dest="penalty_repeat", tools=GEN),
    _o("--presence-penalty", help="presence penalty", type=float,
       default=0.0, dest="penalty_present", tools=GEN),
    _o("--frequency-penalty", help="frequency penalty", type=float,
       default=0.0, dest="penalty_freq", tools=GEN),
    _o("--dry-multiplier", help="DRY repetition penalty multiplier",
       type=float, default=0.0, tools=GEN),
    _o("--dry-base", help="DRY base", type=float, default=1.75, tools=GEN),
    _o("--dry-allowed-length", help="DRY allowed repeat length", type=int,
       default=2, tools=GEN),
    _o("--dry-penalty-last-n", help="DRY window (-1 = ctx)", type=int,
       default=-1, tools=GEN),
    _o("--mirostat", help="mirostat version (0/1/2)", type=int, default=0,
       tools=GEN),
    _o("--mirostat-ent", help="mirostat target entropy τ", type=float,
       default=5.0, dest="mirostat_tau", tools=GEN),
    _o("--mirostat-lr", help="mirostat learning rate η", type=float,
       default=0.1, dest="mirostat_eta", tools=GEN),
    _o("--adaptive-p-target", help="adaptive-p target probability "
       "(-1 = off)", type=float, default=-1.0, tools=GEN),
    _o("--adaptive-p-decay", help="adaptive-p EMA decay", type=float,
       default=0.9, tools=GEN),
    _o("-l", "--logit-bias", help="TOKEN_ID(+/-)BIAS (repeatable)",
       repeatable=True, metavar="TOKEN_ID(+/-)BIAS", tools=GEN),
    _o("--ignore-eos", help="never stop at end-of-generation tokens",
       action="store_true", tools=GEN),
    # ---- grammar / structured output
    _o("--grammar", help="GBNF grammar for constrained decoding",
       tools=GEN),
    _o("--grammar-file", help="file with a GBNF grammar", tools=GEN),
    _o("-j", "--json-schema", help="JSON schema to constrain output to",
       tools=GEN),
    # ---- speculative / lookup decoding
    _o("-md", "--draft-model", help="draft model for speculative decoding",
       env="LLAMA_ARG_MODEL_DRAFT", tools=GEN),
    _o("--draft-n", help="draft tokens per round", type=int, default=8,
       env="LLAMA_ARG_DRAFT_MAX", dest="draft_n", tools=GEN),
    _o("--draft-p-min", help="min draft acceptance probability",
       type=float, default=0.0, tools=GEN),
    _o("--lookup-ngram-min", help="enable n-gram lookup decoding with this "
       "min ngram size (0 = off)", type=int, default=0, tools=GEN),
    # ---- server
    _o("--host", help="bind address", default="127.0.0.1",
       env="LLAMA_ARG_HOST", tools=SRV),
    _o("--port", help="bind port", type=int, default=8080,
       env="LLAMA_ARG_PORT", tools=SRV),
    _o("--api-key", help="NAME=KEY api key (repeatable)", repeatable=True,
       env="LLAMA_API_KEY", tools=SRV),
    _o("--slots", help="concurrent generation slots", type=int, default=4,
       env="LLAMA_ARG_N_PARALLEL", tools=SRV),
    _o("--timeout", help="per-request timeout seconds", type=int,
       default=600, tools=SRV),
    _o("--rate-limit", help="requests/min per client (0 = off)", type=int,
       default=0, tools=SRV),
    _o("--ssl-cert-file", help="TLS certificate (PEM)",
       env="LLAMA_ARG_SSL_CERT_FILE", tools=SRV),
    _o("--ssl-key-file", help="TLS private key (PEM)",
       env="LLAMA_ARG_SSL_KEY_FILE", tools=SRV),
    _o("--embed-model", help="encoder GGUF for /embeddings + /rerank",
       tools=SRV),
    _o("--chat-template", help="builtin chat template name override",
       env="LLAMA_ARG_CHAT_TEMPLATE", tools=SRV),
    _o("--router", help="router mode: proxy + dynamic model loading",
       action="store_true", tools=SRV),
    # ---- fork enterprise flags (common/arg.cpp:1301-1401)
    _o("--no-dynamic-layers", help="disable the HBM⇄host layer scheduler",
       action="store_true", tools=SRV | RUN),
    _o("--no-paged-kv", help="disable the paged KV cache",
       action="store_true", dest="no_paged_kv", tools=SRV),
    _o("--paged-kv", help="serve with the paged KV cache (HBM⇄host spill)",
       action="store_true", tools=SRV),
    _o("--kv-page-size", help="tokens per KV page", type=int, default=256,
       tools=SRV),
    _o("--kv-pages", help="device-resident page pool size "
       "(default: slots*ctx/page + 1)", type=int, default=None, tools=SRV),
    _o("--mem-pressure", help="HBM pressure threshold (evict above)",
       type=float, default=0.85, tools=SRV | RUN),
    _o("--mem-pressure-low", help="HBM hysteresis low-water mark",
       type=float, default=0.75, tools=SRV | RUN),
    _o("--pin-layers", help="comma list of layer indices pinned in HBM",
       tools=SRV | RUN),
    _o("--metrics-file", help="JSONL metrics sink path",
       env="LLAMA_METRICS_FILE", tools=SRV),
    _o("--verbose-migration", help="log layer migrations",
       action="store_true", tools=SRV | RUN),
    # ---- misc
    _o("--preset", help="named parameter preset (presets.py)", tools=GEN),
    _o("-v", "--verbose", help="verbose logging", action="store_true"),
    _o("--log-file", help="mirror logs to a file", env="LLAMA_LOG_FILE"),
]

_BY_DEST = {o.dest_name: o for o in OPTIONS}


def add_options(parser: argparse.ArgumentParser, tool: str,
                exclude: set[str] = frozenset()) -> None:
    """Attach every option whose tool mask includes `tool`. Environment
    mirrors become defaults (flag > env > declared default)."""
    for o in OPTIONS:
        if tool not in o.tools or o.dest_name in exclude:
            continue
        kw: dict[str, Any] = {"help": f"{o.help} (env {o.env_name})",
                              "dest": o.dest_name}
        env_val = os.environ.get(o.env_name)
        if o.action:
            kw["action"] = o.action
            kw["default"] = (env_val not in (None, "", "0", "false", "off")
                             if env_val is not None else False)
        else:
            if o.type:
                kw["type"] = o.type
            if o.choices:
                kw["choices"] = o.choices
            if o.metavar:
                kw["metavar"] = o.metavar
            if o.repeatable:
                kw["action"] = "append"
            default = o.default
            if env_val is not None:
                default = ([env_val] if o.repeatable
                           else (o.type(env_val) if o.type else env_val))
            kw["default"] = default
        parser.add_argument(*o.flags, **kw)


def sampling_from_args(args: argparse.Namespace) -> dict:
    """Collect the sampler-chain kwargs (make_chain signature) present on a
    parsed namespace."""
    keys = ("seed", "temp", "top_k", "top_p", "min_p", "typical_p",
            "xtc_probability", "xtc_threshold", "top_n_sigma",
            "dynatemp_range", "dynatemp_exponent", "penalty_last_n",
            "penalty_repeat", "penalty_freq", "penalty_present",
            "dry_multiplier", "dry_base", "dry_allowed_length",
            "dry_penalty_last_n", "mirostat", "mirostat_tau", "mirostat_eta",
            "adaptive_p_target", "adaptive_p_decay")
    out = {k: getattr(args, k) for k in keys if hasattr(args, k)}
    biases = {}
    for spec in getattr(args, "logit_bias", None) or []:
        tok, _, val = spec.replace("+", ":").replace("-", ":-").partition(":")
        try:
            biases[int(tok)] = float(val)
        except ValueError:
            continue
    if biases:
        out["logit_bias"] = biases
    return out
