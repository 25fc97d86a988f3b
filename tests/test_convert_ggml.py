"""Legacy GGJT v3 → GGUF conversion (convert_llama_ggml_to_gguf.py
counterpart): synthesize an old-format file with old tensor names, convert,
and check logits equal a directly-written GGUF of the same weights."""

import struct

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from superllama_tpu.gguf import GGMLType, GGUFWriter
from superllama_tpu.gguf.quants import quantize
from superllama_tpu.models import load_model
from superllama_tpu.runtime import Context
from superllama_tpu.tools.convert_ggml import convert_ggml_to_gguf

V, E, NH, NL, MULT = 64, 32, 4, 2, 16


def _legacy_names(il):
    return [
        (f"layers.{il}.attention.wq.weight", "wq", (E, E)),
        (f"layers.{il}.attention.wk.weight", "wk", (E, E)),
        (f"layers.{il}.attention.wv.weight", "wv", (E, E)),
        (f"layers.{il}.attention.wo.weight", "wo", (E, E)),
        (f"layers.{il}.attention_norm.weight", "an", (E,)),
        (f"layers.{il}.feed_forward.w1.weight", "w1", (96, E)),
        (f"layers.{il}.feed_forward.w2.weight", "w2", (E, 96)),
        (f"layers.{il}.feed_forward.w3.weight", "w3", (96, E)),
        (f"layers.{il}.ffn_norm.weight", "fn", (E,)),
    ]
    # n_ff from n_mult: ((2*4*32//3 + 15)//16)*16 = 96


def test_ggjt_v3_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    tensors = [("tok_embeddings.weight", (V, E)),
               ("norm.weight", (E,)), ("output.weight", (V, E))]
    for il in range(NL):
        tensors += [(n, shape) for n, _, shape in _legacy_names(il)]
    weights = {n: (np.ones(s, np.float32) if len(s) == 1
                   else rng.normal(0, 0.05, s).astype(np.float32))
               for n, s in tensors}

    # --- write GGJT v3
    legacy = tmp_path / "old.ggjt"
    with open(legacy, "wb") as f:
        f.write(b"tjgg")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<7I", V, E, MULT, NH, NL, E // NH, 1))  # f16
        for i in range(V):
            tok = f"<t{i}>".encode()
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)
            f.write(struct.pack("<f", -float(i)))
        for name, arr in weights.items():
            t = GGMLType.F32 if arr.ndim == 1 else GGMLType.F16
            nb = name.encode()
            dims = tuple(reversed(arr.shape))       # ne order
            f.write(struct.pack("<3I", len(dims), len(nb), int(t)))
            f.write(struct.pack(f"<{len(dims)}I", *dims))
            f.write(nb)
            pos = f.tell()
            f.write(b"\0" * (((pos + 31) & ~31) - pos))
            f.write(quantize(arr, t).tobytes())

    out = tmp_path / "new.gguf"
    convert_ggml_to_gguf(str(legacy), str(out))
    model = load_model(str(out))
    assert model.hparams.n_ff == 96 and model.hparams.n_layer == NL
    assert model.tokenizer is not None

    # --- reference GGUF written directly from the same weights
    direct = tmp_path / "direct.gguf"
    w = GGUFWriter(str(direct), arch="llama")
    for k, v in (("llama.context_length", 2048), ("llama.embedding_length", E),
                 ("llama.block_count", NL), ("llama.feed_forward_length", 96),
                 ("llama.attention.head_count", NH),
                 ("llama.attention.head_count_kv", NH),
                 ("llama.rope.dimension_count", E // NH),
                 ("llama.attention.key_length", E // NH),
                 ("llama.attention.value_length", E // NH),
                 ("llama.attention.layer_norm_rms_epsilon", 1e-5),
                 ("llama.rope.freq_base", 10000.0),
                 ("llama.vocab_size", V)):
        w.add(k, v)
    gg_map = {"tok_embeddings.weight": "token_embd.weight",
              "norm.weight": "output_norm.weight",
              "output.weight": "output.weight"}
    sub = {"attention.wq": "attn_q", "attention.wk": "attn_k",
           "attention.wv": "attn_v", "attention.wo": "attn_output",
           "attention_norm": "attn_norm", "feed_forward.w1": "ffn_gate",
           "feed_forward.w2": "ffn_down", "feed_forward.w3": "ffn_up",
           "ffn_norm": "ffn_norm"}
    for name, arr in weights.items():
        if name in gg_map:
            gg = gg_map[name]
        else:
            il = name.split(".")[1]
            key = ".".join(name.split(".")[2:-1])
            gg = f"blk.{il}.{sub[key]}.weight"
        w.add_tensor(gg, arr, GGMLType.F32 if arr.ndim == 1 else GGMLType.F16)
    w.write()
    ref = load_model(str(direct))

    ids = np.arange(1, 9, dtype=np.int32)
    got = np.asarray(Context(model, n_batch=1, n_ctx=32,
                             kv_dtype=np.float32).forward(ids)[0])
    want = np.asarray(Context(ref, n_batch=1, n_ctx=32,
                              kv_dtype=np.float32).forward(ids)[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
