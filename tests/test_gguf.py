"""GGUF container round-trip + conformance vs reference vocab fixtures.

Mirrors the reference's test-gguf.cpp read/write coverage (SURVEY.md §4).
"""

import os
from pathlib import Path

import numpy as np
import pytest

from superllama_tpu.gguf import GGMLType, GGUFReader, GGUFWriter

REF_MODELS = Path(os.environ.get("SLT_REFERENCE_PATH", "/root/reference")) / "models"


def test_roundtrip(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(str(path), arch="llama")
    w.add("general.name", "test model")
    w.add("llama.block_count", 2)
    w.add("llama.rope.freq_base", 10000.0)
    w.add("test.bool_true", True)
    w.add("test.bool_false", False)
    w.add("test.neg", -5)
    w.add("test.big", 1 << 40)
    w.add("test.strings", ["a", "bb", "ccc"])
    w.add("test.floats", np.arange(4, dtype=np.float32))
    w.add("test.ints", np.arange(5, dtype=np.int32))

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(64, 128)).astype(np.float32)
    qw = rng.normal(size=(32, 256)).astype(np.float32)
    w.add_tensor("token_embd.weight", emb, GGMLType.F32)
    w.add_tensor("blk.0.attn_q.weight", qw, GGMLType.Q4_K)
    w.add_tensor("blk.0.attn_k.weight", qw.astype(np.float16).astype(np.float32), GGMLType.F16)
    w.write()

    r = GGUFReader(str(path))
    assert r.version == 3
    assert r.arch() == "llama"
    assert r.metadata["general.name"] == "test model"
    assert r.metadata["llama.block_count"] == 2
    assert r.metadata["llama.rope.freq_base"] == pytest.approx(10000.0)
    assert r.metadata["test.bool_true"] is True
    assert r.metadata["test.bool_false"] is False
    assert r.metadata["test.neg"] == -5
    assert r.metadata["test.big"] == 1 << 40
    assert r.metadata["test.strings"] == ["a", "bb", "ccc"]
    np.testing.assert_array_equal(r.metadata["test.floats"], np.arange(4, dtype=np.float32))
    np.testing.assert_array_equal(r.metadata["test.ints"], np.arange(5, dtype=np.int32))

    t = r.tensors["token_embd.weight"]
    assert t.shape == (64, 128)
    assert t.ne == (128, 64)
    np.testing.assert_array_equal(t.astype_f32(), emb)

    tq = r.tensors["blk.0.attn_q.weight"]
    assert tq.ggml_type == GGMLType.Q4_K
    deq = tq.astype_f32()
    assert deq.shape == (32, 256)
    assert np.sqrt(np.mean((deq - qw) ** 2)) < 0.15  # quantized, lossy

    tk = r.tensors["blk.0.attn_k.weight"]
    np.testing.assert_array_equal(tk.astype_f32(), qw.astype(np.float16).astype(np.float32))
    r.close()


def test_alignment(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(str(path))
    w.add_tensor("a", np.ones((3,), dtype=np.float32))  # 12 bytes, forces padding
    w.add_tensor("b", np.full((8,), 2.0, dtype=np.float32))
    w.write()
    r = GGUFReader(str(path))
    assert r.data_offset % 32 == 0
    assert r.tensors["b"].offset % 32 == 0
    np.testing.assert_array_equal(r.tensors["b"].astype_f32(), np.full(8, 2.0, dtype=np.float32))
    r.close()


@pytest.mark.skipif(not REF_MODELS.exists(), reason="reference fixtures unavailable")
def test_read_ecosystem_file():
    """Parse a GGUF produced by the ecosystem's own writer (vocab fixture)."""
    r = GGUFReader(REF_MODELS / "ggml-vocab-llama-spm.gguf")
    assert r.metadata["general.architecture"] == "llama"
    assert r.metadata["tokenizer.ggml.model"] == "llama"
    toks = r.metadata["tokenizer.ggml.tokens"]
    assert len(toks) == 32000
    assert toks[1] == "<s>"
    scores = r.metadata["tokenizer.ggml.scores"]
    assert len(scores) == 32000
    r.close()


def test_gguf_split_and_merge(tmp_path):
    """Shard/merge round trip + transparent sharded loading
    (tools/gguf-split counterpart)."""
    import numpy as np
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.models import load_model
    from superllama_tpu.runtime import Context
    from superllama_tpu.tools.convert_hf import convert_state_dict
    from superllama_tpu.tools.gguf_split import merge_gguf, shard_paths, split_gguf

    torch.manual_seed(123)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      architectures=["LlamaForCausalLM"], tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    src = tmp_path / "m.gguf"
    convert_state_dict(str(src), cfg, sd, GGMLType.F32)

    shards = split_gguf(str(src), str(tmp_path / "m"), n_split=3)
    assert len(shards) == 3 and shards[0].endswith("-00001-of-00003.gguf")
    assert shard_paths(shards[1]) == shards

    ids = np.arange(1, 13, dtype=np.int32)
    ref = np.asarray(Context(load_model(str(src)), n_ctx=32,
                             kv_dtype=np.float32).forward(ids)[0])
    got = np.asarray(Context(load_model(shards[0]), n_ctx=32,
                             kv_dtype=np.float32).forward(ids)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    merged = tmp_path / "merged.gguf"
    merge_gguf(shards[0], str(merged))
    got2 = np.asarray(Context(load_model(str(merged)), n_ctx=32,
                              kv_dtype=np.float32).forward(ids)[0])
    np.testing.assert_allclose(got2, ref, rtol=1e-6)
