"""Interactive chat with the model's template (examples/simple-chat).
Usage: python examples/simple_chat.py model.gguf"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine
from superllama_tpu.server.chat import template_for_model


def main(model_path: str, turns=None):
    model = load_model(model_path)
    tmpl = template_for_model(model)
    eng = Engine(model, n_slots=1, n_ctx=2048)
    messages = []
    source = iter(turns) if turns is not None else None
    while True:
        try:
            user = next(source) if source else input("> ")
        except (StopIteration, EOFError):
            break
        messages.append({"role": "user", "content": user})
        text = tmpl.apply(messages, add_generation_prompt=True)
        ids = model.tokenizer.encode(text, add_special=True, parse_special=True)
        out = eng.generate(ids, max_tokens=128)
        print(out["text"])
        messages.append({"role": "assistant", "content": out["text"]})
    return messages


if __name__ == "__main__":
    main(sys.argv[1])
