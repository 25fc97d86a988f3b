"""GGUF maintenance tools (gguf-py scripts counterparts): metadata editor,
endian converter, hasher."""

import numpy as np
import pytest

from superllama_tpu.gguf import GGMLType, GGUFReader, GGUFWriter
from superllama_tpu.gguf.quants import quantize
from superllama_tpu.tools.gguf_edit import (convert_endian, edit_metadata,
                                            hash_gguf, main)


@pytest.fixture()
def model_file(tmp_path):
    w = GGUFWriter(str(tmp_path / "m.gguf"), arch="llama")
    w.add("general.name", "tiny")
    w.add("llama.block_count", 2)
    w.add("tokenizer.ggml.model", "gpt2")
    rng = np.random.default_rng(0)
    w.add_tensor("a.weight", rng.normal(0, 1, (8, 256)).astype(np.float32),
                 GGMLType.F32)
    for t in (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0):
        x = rng.normal(0, 1, (4, 256)).astype(np.float32)
        w.add_tensor(f"b.{t.name}", quantize(x, t), t, raw_ne=(256, 4))
    w.write()
    return str(tmp_path / "m.gguf")


def test_edit_set_remove_passthrough(model_file, tmp_path):
    out = str(tmp_path / "edited.gguf")
    stats = edit_metadata(model_file, out,
                          {"general.name": "renamed", "custom.k": 7},
                          remove=["llama.block_count"])
    assert stats["set"] == 2 and stats["removed"] == 1
    r0, r1 = GGUFReader(model_file), GGUFReader(out)
    assert r1.metadata["general.name"] == "renamed"
    assert int(r1.metadata["custom.k"]) == 7
    assert "llama.block_count" not in r1.metadata
    # tensor payloads byte-identical (no re-encode)
    for name in r0.tensors:
        assert r0.tensors[name].raw().tobytes() == \
            r1.tensors[name].raw().tobytes()
    r0.close(); r1.close()


def test_convert_endian_roundtrip(model_file, tmp_path):
    big = str(tmp_path / "be.gguf")
    back = str(tmp_path / "le.gguf")
    n = convert_endian(model_file, big, "big")
    assert n == 4
    # f32 tensor actually swapped
    r0, rb = GGUFReader(model_file), GGUFReader(big)
    a0 = np.frombuffer(r0.tensors["a.weight"].raw().tobytes(), np.uint8)
    ab = np.frombuffer(rb.tensors["a.weight"].raw().tobytes(), np.uint8)
    assert (a0 != ab).any()
    np.testing.assert_array_equal(a0.reshape(-1, 4)[:, ::-1].reshape(-1), ab)
    r0.close(); rb.close()
    convert_endian(big, back, "little")
    r0, r2 = GGUFReader(model_file), GGUFReader(back)
    for name in r0.tensors:
        assert r0.tensors[name].raw().tobytes() == \
            r2.tensors[name].raw().tobytes(), name
    r0.close(); r2.close()


def test_hash_stable_and_sensitive(model_file, tmp_path):
    h1 = hash_gguf(model_file)
    h2 = hash_gguf(model_file)
    assert h1 == h2
    assert len(h1["tensors"]) == 4 and len(h1["sha256"]) == 64
    # metadata-only edits don't change tensor hashes
    out = str(tmp_path / "e.gguf")
    edit_metadata(model_file, out, {"general.name": "x"})
    assert hash_gguf(out)["sha256"] == h1["sha256"]


def test_cli(model_file, tmp_path, capsys):
    out = str(tmp_path / "c.gguf")
    assert main(["edit", model_file, out, "--set", "a.b=3",
                 "--remove", "general.name"]) == 0
    assert main(["hash", out]) == 0
    assert "sha256" in capsys.readouterr().out
