"""Minimal generation (examples/simple counterpart): load a GGUF, greedy
decode N tokens. Usage: python examples/simple.py model.gguf [prompt] [n]"""

import sys

import numpy as np

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine


def main(model_path: str, prompt: str = "Hello my name is", n: int = 32):
    model = load_model(model_path)
    ids = model.tokenizer.encode(prompt, add_special=True)
    eng = Engine(model, n_slots=1, n_ctx=max(256, len(ids) + n + 8))
    out = eng.generate(ids, max_tokens=n, sampling={"temp": 0.0})
    print(prompt + out["text"])
    return out


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or ["Hello my name is"]),
         *map(int, sys.argv[3:4] or [32]))
