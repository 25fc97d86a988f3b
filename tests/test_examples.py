"""Smoke tests for examples/ (reference examples/ parity): each driver runs
end-to-end on a tiny synthetic GGUF."""

import pathlib
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(21)


def _mk(tmp, name, n_layer=2, hidden=64, seed=1):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=n_layer, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp / f"{name}.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return str(path)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return _mk(tmp_path_factory.mktemp("ex"), "m")


def test_simple(model_path):
    import simple

    out = simple.main(model_path, "Hello", 6)
    assert out["n_generated"] >= 1


def test_simple_chat(model_path):
    import simple_chat

    msgs = simple_chat.main(model_path, turns=["Hi there"])
    assert msgs[-1]["role"] == "assistant"


def test_batched(model_path):
    import batched

    outs = batched.main(model_path, n_parallel=3, n_tokens=6)
    assert len(outs) == 3


def test_parallel(model_path):
    import parallel

    outs = parallel.main(model_path, n_clients=4)
    assert len(outs) == 4 and all(o["n_generated"] >= 1 for o in outs)


def test_save_load_state(model_path):
    import save_load_state

    a, b = save_load_state.main(model_path)
    assert a["tokens"] == b["tokens"]


def test_passkey(model_path):
    import passkey

    text = passkey.main(model_path)
    assert isinstance(text, bytes)


def test_speculative(model_path, tmp_path):
    import speculative

    draft = _mk(tmp_path, "draft", n_layer=1, hidden=32, seed=2)
    out = speculative.main(model_path, draft, n=10)
    assert out["n_generated"] >= 1


def test_lookup(model_path):
    import lookup

    out = lookup.main(model_path, n=10)
    assert out["n_generated"] >= 1


def test_eval_callback(model_path):
    import eval_callback

    stats = eval_callback.main(model_path)
    assert len(stats) == 2


def test_finetune(model_path, tmp_path):
    import finetune

    corpus = tmp_path / "c.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog. " * 20)
    tr = finetune.main(model_path, str(corpus), n_ctx=16, epochs=1)
    assert tr is not None


def test_gguf_demo(tmp_path):
    import gguf_demo

    gguf_demo.main(str(tmp_path / "demo.gguf"))


def test_lookahead_example(model_path):
    import lookahead

    la = lookahead.main(model_path, n=12)
    assert la.n_steps > 0
