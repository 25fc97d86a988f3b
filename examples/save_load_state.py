"""Per-sequence state snapshot determinism (examples/save-load-state):
generate, save the slot, keep generating, restore, regenerate — the two
continuations must be identical. Usage: python examples/save_load_state.py model.gguf"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.engine import Engine


def main(model_path: str):
    model = load_model(model_path)
    ids = model.tokenizer.encode("The first rule of", add_special=True)
    eng = Engine(model, n_slots=1, n_ctx=256)
    eng.generate(ids, max_tokens=8, sampling={"temp": 0.0}, stop_eog=False)
    snap = eng.slot_save(0)

    a = eng.generate(ids, max_tokens=8, sampling={"temp": 0.0}, stop_eog=False)
    eng.slot_restore(0, snap)
    b = eng.generate(ids, max_tokens=8, sampling={"temp": 0.0}, stop_eog=False)
    assert a["tokens"] == b["tokens"], "restore changed the distribution!"
    print("deterministic across save/restore:", a["tokens"])
    return a, b


if __name__ == "__main__":
    main(sys.argv[1])
