"""Prompt n-gram lookup decoding (examples/lookup): repetitive prompts
let the engine draft from its own n-gram cache — no draft model.
Usage: python examples/lookup.py model.gguf"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine


def main(model_path: str, n: int = 32):
    model = load_model(model_path)
    text = "A B C D E F G H. " * 6 + "A B C D"
    ids = model.tokenizer.encode(text, add_special=True)
    base = Engine(model, n_slots=1, n_ctx=512)
    r0 = base.generate(ids, max_tokens=n, sampling={"temp": 0.0}, stop_eog=False)
    eng = Engine(model, n_slots=1, n_ctx=512, lookup_ngrams=4)
    r1 = eng.generate(ids, max_tokens=n, sampling={"temp": 0.0}, stop_eog=False)
    assert r0["tokens"] == r1["tokens"]
    m = eng.metrics
    print(f"identical output; {m['n_spec_accepted']} tokens drafted from "
          f"prompt n-grams across {m['n_decode_steps']} steps")
    return r1


if __name__ == "__main__":
    main(sys.argv[1])
