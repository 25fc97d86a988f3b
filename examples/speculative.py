"""Speculative decoding with a draft model (examples/speculative-simple):
identical output, fewer target forward passes.
Usage: python examples/speculative.py target.gguf draft.gguf"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine


def main(target_path: str, draft_path: str, n: int = 32):
    target = load_model(target_path)
    draft = load_model(draft_path)
    ids = target.tokenizer.encode("Once upon a time", add_special=True)

    plain = Engine(target, n_slots=1, n_ctx=256)
    r0 = plain.generate(ids, max_tokens=n, stop_eog=False)

    spec = Engine(target, n_slots=1, n_ctx=256, draft_model=draft, n_draft=6)
    r1 = spec.generate(ids, max_tokens=n, stop_eog=False)
    assert r0["tokens"] == r1["tokens"], "speculation changed the output!"
    m = spec.metrics
    acc = m["n_spec_accepted"] / max(m["n_spec_drafted"], 1)
    print(f"identical output; draft acceptance {acc:.0%}, "
          f"{m['n_decode_steps']} verify steps for {r1['n_generated']} tokens")
    return r1


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
