"""Lookahead decoding (examples/lookahead counterpart): Jacobi window +
n-gram pool, no draft model. Usage: python examples/lookahead.py model.gguf"""

import sys

from superllama_tpu.models import load_model
from superllama_tpu.runtime.lookahead import LookaheadDecoder


def main(model_path: str, n: int = 48):
    model = load_model(model_path)
    text = "One two three four. " * 5 + "One two"
    ids = model.tokenizer.encode(text, add_special=True)
    la = LookaheadDecoder(model, W=8, N=4, G=8, n_ctx=1024)
    out = la.generate(ids, n)
    gen = b"".join(model.tokenizer.token_to_piece(int(t)) for t in out[len(ids):])
    print(gen.decode(errors="replace"))
    print(f"\n{n} tokens in {la.n_steps} passes "
          f"({la.n_accept} accepted from n-grams)")
    return la


if __name__ == "__main__":
    main(sys.argv[1])
