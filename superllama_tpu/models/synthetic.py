"""Synthetic random-weight models (for benches, entry checks, and tests that
need a model without downloading weights)."""

from __future__ import annotations

import numpy as np

from .hparams import HParams


def synthetic_params(hp: HParams, dtype=np.float32, seed: int = 0,
                     tie_embeddings: bool = False) -> dict:
    rng = np.random.default_rng(seed)
    E, H, Hkv, D, Dv, F, V = (hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, hp.n_ff, hp.n_vocab)

    def w(*shape, scale=None):
        scale = scale or (1.0 / np.sqrt(shape[0]))
        return (rng.normal(0, scale, shape)).astype(dtype)

    params = {
        "token_embd": w(V, E, scale=0.02),
        "output_norm": np.ones(E, dtype),
        "layers": [],
    }
    if not tie_embeddings:
        params["output"] = w(E, V)
    for _ in range(hp.n_layer):
        layer = {
            "attn_norm": np.ones(E, dtype),
            "wq": w(E, H * D),
            "wk": w(E, Hkv * D),
            "wv": w(E, Hkv * Dv),
            "wo": w(H * Dv, E),
            "ffn_norm": np.ones(E, dtype),
        }
        if hp.n_expert > 0:
            ff = hp.n_ff_exp or F
            layer["ffn_gate_inp"] = w(E, hp.n_expert)
            layer["ffn_gate_exps"] = w(hp.n_expert, E, ff, scale=1.0 / np.sqrt(E))
            layer["ffn_up_exps"] = w(hp.n_expert, E, ff, scale=1.0 / np.sqrt(E))
            layer["ffn_down_exps"] = w(hp.n_expert, ff, E, scale=1.0 / np.sqrt(ff))
        else:
            layer["ffn_gate"] = w(E, F)
            layer["ffn_up"] = w(E, F)
            layer["ffn_down"] = w(F, E)
        params["layers"].append(layer)
    return params


def tinyllama_hparams(**kw) -> HParams:
    """TinyLlama-1.1B dims (BASELINE config 1 scale)."""
    d = dict(
        arch="llama", n_vocab=32000, n_ctx_train=2048, n_embd=2048,
        n_layer=22, n_head=32, n_head_kv=4, n_ff=5632, n_rot=64,
        head_dim=64, head_dim_v=64, rms_eps=1e-5, rope_freq_base=10000.0,
    )
    d.update(kw)
    return HParams(**d)


def llama3_8b_hparams(**kw) -> HParams:
    """Llama-3-8B dims (BASELINE config 2)."""
    d = dict(
        arch="llama", n_vocab=128256, n_ctx_train=8192, n_embd=4096,
        n_layer=32, n_head=32, n_head_kv=8, n_ff=14336, n_rot=128,
        head_dim=128, head_dim_v=128, rms_eps=1e-5, rope_freq_base=500000.0,
    )
    d.update(kw)
    return HParams(**d)


def tiny_test_hparams(**kw) -> HParams:
    d = dict(
        arch="llama", n_vocab=256, n_ctx_train=128, n_embd=64,
        n_layer=2, n_head=4, n_head_kv=2, n_ff=128, n_rot=16,
        head_dim=16, head_dim_v=16,
    )
    d.update(kw)
    return HParams(**d)
