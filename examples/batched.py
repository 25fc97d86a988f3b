"""N parallel completions of one prompt (examples/batched counterpart) via
engine slots. Usage: python examples/batched.py model.gguf [n_parallel]"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine, GenRequest


def main(model_path: str, n_parallel: int = 4, n_tokens: int = 24):
    model = load_model(model_path)
    ids = model.tokenizer.encode("The quick brown fox", add_special=True)
    eng = Engine(model, n_slots=n_parallel, n_ctx=256)
    reqs = [GenRequest(prompt_ids=ids, max_tokens=n_tokens, stop_eog=False,
                       sampling={"temp": 0.8, "seed": 1000 + i})
            for i in range(n_parallel)]
    for r in reqs:
        eng.submit(r)
    eng.run_until_drained()
    outs = [r.result(timeout=300)["text"] for r in reqs]
    for i, t in enumerate(outs):
        print(f"[{i}] ...{t!r}")
    return outs


if __name__ == "__main__":
    main(sys.argv[1], *map(int, sys.argv[2:3] or [4]))
