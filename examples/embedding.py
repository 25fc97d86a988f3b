"""Sentence embeddings from an encoder GGUF (examples/embedding).
Usage: python examples/embedding.py encoder.gguf "some text" ..."""

import sys

import numpy as np

from superllama_tpu.models import load_model
from superllama_tpu.runtime.embedder import Embedder


def main(model_path: str, texts):
    emb = Embedder(load_model(model_path))
    vecs, _n_tok = emb.embed(list(texts))
    for t, v in zip(texts, vecs):
        print(f"{t[:40]!r}: dim={len(v)} norm={np.linalg.norm(v):.3f}")
    return vecs


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:] or ["hello world"])
