"""Control vectors: per-layer steering directions added to the residual
stream, plus the PCA generator.

Behavioral references: llama_adapter_cvec (src/llama-adapter.cpp:14-130 —
GGUF tensors "direction.<il>", layer 0 never present, applied as
cur = cur + direction[il] after each layer) and tools/cvector-generator
(hidden-state diffs between positive/negative prompt pairs → top principal
component per layer via power iteration).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter
from .hparams import HParams
from .llama import llama_forward


def load_control_vector(path: str, n_layer: int, n_embd: int,
                        scale: float = 1.0) -> jnp.ndarray:
    """→ (n_layer, E) array for params['cvec']; missing layers are zero."""
    r = GGUFReader(path)
    out = np.zeros((n_layer, n_embd), np.float32)
    for name, ti in r.tensors.items():
        if name.startswith("direction."):
            il = int(name.split(".")[1])
            if 0 <= il - 1 < n_layer:  # file layers are 1-based (cpp:127)
                out[il - 1] = ti.astype_f32().reshape(-1)[:n_embd]
    r.close()
    return jnp.asarray(out * scale)


def save_control_vector(path: str, directions: np.ndarray) -> None:
    """directions: (n_layer, E); written 1-based as direction.<il>."""
    w = GGUFWriter(path, arch="controlvector")
    w.add("controlvector.model_hint", "llama")
    w.add("controlvector.layer_count", int(directions.shape[0]))
    for il in range(directions.shape[0]):
        w.add_tensor(f"direction.{il + 1}",
                     directions[il].astype(np.float32), GGMLType.F32)
    w.write()


def _power_iteration(mat: np.ndarray, iters: int = 100) -> np.ndarray:
    """Top principal component of row-matrix mat (n_samples, E)."""
    cov = mat.T @ mat
    v = np.random.default_rng(0).normal(size=cov.shape[0]).astype(np.float64)
    v /= np.linalg.norm(v)
    for _ in range(iters):
        v = cov @ v
        n = np.linalg.norm(v)
        if n < 1e-12:
            return np.zeros_like(v, dtype=np.float32)
        v /= n
    return v.astype(np.float32)


def generate_control_vector(model, positive: list[str], negative: list[str],
                            n_ctx: int = 256) -> np.ndarray:
    """(n_layer, E) directions from paired prompts: per layer, PCA over the
    mean-hidden-state differences, sign-aligned with the mean diff (the
    cvector-generator pipeline, tools/cvector-generator)."""
    hp: HParams = model.hparams
    tok = model.tokenizer
    from ..runtime.kv_cache import kv_cache_init

    diffs = [[] for _ in range(hp.n_layer)]
    for p_pos, p_neg in zip(positive, negative):
        per_prompt = []
        for text in (p_pos, p_neg):
            ids = np.asarray(tok.encode(text, add_special=True), np.int32)
            cache = kv_cache_init(hp.n_layer, 1, max(len(ids), 8),
                                  hp.n_head_kv, hp.head_dim, hp.head_dim_v,
                                  jnp.float32)
            sink: list = []
            pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
            llama_forward(model.params, hp, jnp.asarray(ids[None]), pos,
                          cache, flash=False, hidden_sink=sink)
            per_prompt.append([np.asarray(h[0], np.float32).mean(axis=0)
                               for h in sink])
        for il in range(hp.n_layer):
            diffs[il].append(per_prompt[0][il] - per_prompt[1][il])

    out = np.zeros((hp.n_layer, hp.n_embd), np.float32)
    for il in range(hp.n_layer):
        mat = np.stack(diffs[il])
        v = _power_iteration(mat)
        if float(mat.mean(axis=0) @ v) < 0:  # align sign with mean diff
            v = -v
        out[il] = v
    return out
