"""Multi-client serving simulation (examples/parallel counterpart):
clients with different prompts/lengths share the continuous-batching
engine. Usage: python examples/parallel.py model.gguf [n_clients]"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine, GenRequest

QUESTIONS = [
    "What is the capital of France?",
    "Write a haiku about TPUs.",
    "Explain attention in one sentence.",
    "List three prime numbers.",
    "What color is the sky?",
]


def main(model_path: str, n_clients: int = 5):
    model = load_model(model_path)
    eng = Engine(model, n_slots=min(4, n_clients), n_ctx=512)
    reqs = []
    for i in range(n_clients):
        q = QUESTIONS[i % len(QUESTIONS)]
        ids = model.tokenizer.encode(q, add_special=True)
        reqs.append(eng.submit(GenRequest(
            prompt_ids=ids, max_tokens=16 + 8 * (i % 3), stop_eog=False)))
    eng.run_until_drained()
    outs = [r.result(timeout=300) for r in reqs]
    for i, o in enumerate(outs):
        print(f"client {i}: {o['n_generated']} tokens")
    return outs


if __name__ == "__main__":
    main(sys.argv[1], *map(int, sys.argv[2:3] or [5]))
