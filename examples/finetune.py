"""Tiny full finetune (examples/training/finetune counterpart): AdamW over
a text corpus through the jitted donated train step.
Usage: python examples/finetune.py model.gguf corpus.txt [out.gguf]"""

import sys

import numpy as np

from superllama_tpu.models import load_model
from superllama_tpu.training.train import Trainer


def main(model_path: str, corpus_path: str, out_path: str | None = None,
         n_ctx: int = 64, epochs: int = 1):
    model = load_model(model_path)
    ids = model.tokenizer.encode(open(corpus_path).read(), add_special=False)
    ids = np.asarray(ids, np.int32)
    n = (len(ids) - 1) // n_ctx
    tokens = ids[: n * n_ctx].reshape(n, n_ctx)
    targets = ids[1 : n * n_ctx + 1].reshape(n, n_ctx)
    tr = Trainer(model.hparams, model.params, optimizer="adamw", lr=1e-4)
    for e in range(epochs):
        loss = tr.epoch([(tokens[i : i + 1], targets[i : i + 1]) for i in range(n)])
        print(f"epoch {e}: loss {loss:.4f}")
    if out_path:
        from superllama_tpu.models.saver import save_model_gguf

        model.params = tr.params
        save_model_gguf(model, out_path)
        print("saved", out_path)
    return tr


if __name__ == "__main__":
    main(*sys.argv[1:])
