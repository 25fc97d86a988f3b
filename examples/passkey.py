"""Passkey retrieval with self-extend grouped attention (examples/passkey):
hide a number in filler text far past the training context, retrieve it
with seq_div position compression. Usage: python examples/passkey.py model.gguf [n_junk]"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.context import Context
from superllama_tpu.runtime.self_extend import SelfExtend


def main(model_path: str, ga_n: int = 4, ga_w: int = 64):
    model = load_model(model_path)
    ctx = Context(model, n_ctx=1024)
    se = SelfExtend(ctx, ga_n=ga_n, ga_w=ga_w)
    prompt = ("There is a pass key hidden. " * 40
              + "The pass key is 7412. Remember it. "
              + "The grass is green. " * 40
              + "What is the pass key? The pass key is")
    ids = model.tokenizer.encode(prompt, add_special=True)
    out = se.generate(ids, n_gen=6)[len(ids):]
    text = b"".join(model.tokenizer.token_to_piece(int(t)) for t in out)
    print("retrieved:", text.decode(errors="replace"))
    return text


if __name__ == "__main__":
    main(sys.argv[1])
