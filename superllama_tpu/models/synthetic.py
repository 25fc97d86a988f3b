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


def _rand_q4k_parts(key, N: int, K: int):
    """Random Q4_K-layout QTensor parts (compact wire-bpw form), generated
    on-device (jit per shape).

    Codes are uniform nibbles; sub-scales/mins are 6-bit ints and d/dmin are
    sized so the dequantized weight is zero-mean with std ≈ 0.6/sqrt(K) —
    sane activations through a deep stack. Byte layout identical to repacked
    real weights, so benches on these tensors exercise the exact production
    kernels/HBM traffic."""
    import jax
    import jax.numpy as jnp

    kc, ks, kd = jax.random.split(key, 3)
    codes = jax.random.bits(kc, (K // 2, N), dtype=jnp.uint8)
    # 6-bit ints in [24, 41) — derived from raw bits (randint-to-u8 lowers
    # badly through the remote-compile path)
    sc = (jax.random.bits(ks, (K // 32, N), dtype=jnp.uint8)
          .astype(jnp.int32) % 17 + 24).astype(jnp.uint8)
    s0 = 1.0 / (7.5 * 32.0 * np.sqrt(K))
    d = jax.random.uniform(kd, (K // 256, N), jnp.float32, 0.5 * s0, 1.5 * s0)
    # mn == sc and dmin == 7.5·d ⇒ add = −7.5·scale: zero-mean dequant
    return codes, sc, sc, d, 7.5 * d


def synthetic_qparams_device(hp: HParams, seed: int = 0) -> dict:
    """Q4_K QTensor matmul weights + bf16 embeddings/norms, all generated
    directly on the accelerator (no host→device weight upload — essential
    through the slow axon tunnel). Bench-only: values are random but layouts,
    dtypes, and byte counts match a real Q4_K_M repacked load."""
    import jax
    import jax.numpy as jnp

    from ..gguf.constants import GGMLType
    from ..ops.qtensor import QTensor

    rq = jax.jit(_rand_q4k_parts, static_argnums=(1, 2))
    root = jax.random.PRNGKey(seed)

    def qt(name: str, N: int, K: int) -> QTensor:
        codes, sc, mn, d, dmin = rq(
            jax.random.fold_in(root, hash(name) & 0x7FFFFFFF), N, K)
        return QTensor(codes, None, None, 32, 0, True, K, N, GGMLType.Q4_K,
                       sc=sc, mn=mn, d=d, dmin=dmin, sb=8)

    normal = jax.jit(
        lambda key, sd: (jax.random.normal(key, (hp.n_vocab, hp.n_embd), jnp.float32) * sd
                         ).astype(jnp.bfloat16))
    E, H, Hkv, D, Dv, F = (hp.n_embd, hp.n_head, hp.n_head_kv, hp.head_dim,
                           hp.head_dim_v, hp.n_ff)
    ones = jnp.ones(E, jnp.bfloat16)
    params = {
        "token_embd": normal(jax.random.fold_in(root, 1), 0.02),
        "output_norm": ones,
        "output": qt("output", hp.n_vocab, E),
        "layers": [],
    }
    for il in range(hp.n_layer):
        params["layers"].append({
            "attn_norm": ones,
            "wq": qt(f"l{il}.wq", H * D, E),
            "wk": qt(f"l{il}.wk", Hkv * D, E),
            "wv": qt(f"l{il}.wv", Hkv * Dv, E),
            "wo": qt(f"l{il}.wo", E, H * Dv),
            "ffn_norm": ones,
            "ffn_gate": qt(f"l{il}.ffn_gate", F, E),
            "ffn_up": qt(f"l{il}.ffn_up", F, E),
            "ffn_down": qt(f"l{il}.ffn_down", E, F),
        })
    return params


def tiny_test_hparams(**kw) -> HParams:
    d = dict(
        arch="llama", n_vocab=256, n_ctx_train=128, n_embd=64,
        n_layer=2, n_head=4, n_head_kv=2, n_ff=128, n_rot=16,
        head_dim=16, head_dim_v=16,
    )
    d.update(kw)
    return HParams(**d)
