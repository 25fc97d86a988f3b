"""Embeddings / rerank pipeline (tools/server /embeddings + /rerank
counterpart; pooling semantics of llama_pooling_type)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bert import bert_forward, pool, rerank_score
from ..models.loader import LoadedModel

_BUCKETS = (16, 32, 64, 128, 256, 512)


class Embedder:
    """Batched text → embedding (and query/document rerank scoring)."""

    def __init__(self, model: LoadedModel, pooling: str = "mean",
                 normalize: bool = True):
        from ..models.bert import ENCODER_ARCHS

        if model.hparams.arch not in ENCODER_ARCHS:
            raise ValueError(f"not an encoder arch: {model.hparams.arch}")
        self.model = model
        self.pooling = pooling
        self.normalize = normalize
        hp = model.hparams

        def encode(params, tokens, mask):
            hidden = bert_forward(params, hp, tokens, mask)
            return pool(hidden, mask, pooling, normalize)

        def score(params, tokens, mask):
            hidden = bert_forward(params, hp, tokens, mask)
            return rerank_score(params, hidden, mask)

        self._encode = jax.jit(encode)
        self._score = jax.jit(score)

    def _batch(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
        tok = self.model.tokenizer
        ids = [tok.encode(t, add_special=True) for t in texts]
        n = max(len(i) for i in ids)
        T = next((b for b in _BUCKETS if n <= b), n)
        tokens = np.zeros((len(ids), T), np.int32)
        mask = np.zeros((len(ids), T), np.int32)
        for r, seq in enumerate(ids):
            tokens[r, :len(seq)] = seq[:T]
            mask[r, :len(seq)] = 1
        return tokens, mask, sum(len(i) for i in ids)

    def embed(self, texts: list[str]) -> tuple[np.ndarray, int]:
        tokens, mask, n_tok = self._batch(texts)
        out = self._encode(self.model.params, jnp.asarray(tokens), jnp.asarray(mask))
        return np.asarray(out, np.float32), n_tok

    def rerank(self, query: str, documents: list[str]) -> tuple[list[float], int]:
        """Score each document against the query. Uses the classification
        head when present ([CLS] q [SEP] d), else embedding cosine."""
        if self.model.params.get("cls_out") is not None:
            pairs = [f"{query} {d}" for d in documents]
            tokens, mask, n_tok = self._batch(pairs)
            s = self._score(self.model.params, jnp.asarray(tokens), jnp.asarray(mask))
            return [float(x) for x in np.asarray(s)], n_tok
        embs, n_tok = self.embed([query] + list(documents))
        qe, de = embs[0], embs[1:]
        return [float(x) for x in de @ qe], n_tok
