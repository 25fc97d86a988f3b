"""Toy retrieval (examples/retrieval counterpart): embed chunks, rank by
cosine vs a query. Usage: python examples/retrieval.py encoder.gguf query chunk1 chunk2 ..."""

import sys

import numpy as np

from superllama_tpu.models import load_model
from superllama_tpu.runtime.embedder import Embedder


def main(model_path: str, query: str, chunks):
    emb = Embedder(load_model(model_path))
    doc_vecs, _ = emb.embed(list(chunks))
    doc_vecs = np.asarray(doc_vecs)
    q = np.asarray(emb.embed([query])[0])[0]
    scores = doc_vecs @ q
    order = np.argsort(-scores)
    for rank, i in enumerate(order):
        print(f"#{rank + 1} ({scores[i]:.3f}): {chunks[i][:60]!r}")
    return [int(i) for i in order]


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
