"""Encoder-family reference-oracle parity via committed embedding goldens.

For each spec in ref_arch_specs.ENC_SPECS: rebuild the deterministic tiny
GGUF, embed a fixed prompt set with OUR Embedder (mean pooling + L2
normalization), and compare against embeddings produced by the reference's
compiled `llama-embedding` (examples/embedding/embedding.cpp) — committed as
tests/goldens/enc_embeddings/<arch>.npz so the check runs without the C++
toolchain. Regenerate: `python tests/test_encoder_golden.py [arch ...]`.
"""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ref_arch_specs import ENC_SPECS, build_gguf

GOLDEN_DIR = Path(__file__).parent / "goldens" / "enc_embeddings"
REF_BUILD = Path(os.environ.get("SLT_REF_BUILD", "/tmp/refbuild"))
EMBEDDING_BIN = REF_BUILD / "bin" / "llama-embedding"

PROMPTS = [
    "The quick brown fox jumps over the lazy dog.",
    "Machine translation quality improves with scale.",
    "Seven red apples",
    "Attention is all you need — encoders pool token states.",
]
SEP = "<#sep#>"


def generate_golden(name: str, out_dir: Path = GOLDEN_DIR) -> Path:
    import tempfile

    assert EMBEDDING_BIN.exists(), "reference build missing llama-embedding"
    arch, md, tensors = ENC_SPECS[name]()
    with tempfile.TemporaryDirectory() as d:
        gguf = Path(d) / f"{name}.gguf"
        build_gguf(gguf, arch, md, tensors)
        cmd = [str(EMBEDDING_BIN), "-m", str(gguf), "-p", SEP.join(PROMPTS),
               "--embd-separator", SEP, "--pooling", "mean",
               "--embd-normalize", "2", "--embd-output-format", "array",
               "-c", "128", "-b", "128", "-t", "1", "--no-warmup"]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, f"{name}: {(r.stdout + r.stderr)[-3000:]}"
        # stdout ends with the JSON array block
        start = r.stdout.index("[")
        embs = np.asarray(json.loads(r.stdout[start:]), np.float32)
    assert embs.shape[0] == len(PROMPTS)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{name}.npz"
    np.savez_compressed(path, embeddings=embs)
    return path


@pytest.mark.parametrize("name", sorted(ENC_SPECS))
def test_encoder_golden_parity(name, tmp_path):
    golden_path = GOLDEN_DIR / f"{name}.npz"
    if not golden_path.exists():
        if not EMBEDDING_BIN.exists():
            pytest.skip(f"golden missing and no reference build: {name}")
        golden_path = generate_golden(name)
    ref = np.load(golden_path)["embeddings"].astype(np.float64)

    from superllama_tpu.models.loader import load_model
    from superllama_tpu.runtime.embedder import Embedder

    arch, md, tensors = ENC_SPECS[name]()
    gguf = tmp_path / f"{name}.gguf"
    build_gguf(gguf, arch, md, tensors)
    model = load_model(str(gguf))
    ours, _ = Embedder(model, pooling="mean", normalize=True).embed(PROMPTS)
    ours = ours.astype(np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    cos = (ours * ref).sum(-1)               # both L2-normalized
    max_abs = np.abs(ours - ref).max()
    assert cos.min() > 0.9999, (name, cos.tolist(), float(max_abs))
    assert max_abs < 5e-3, (name, float(max_abs))


if __name__ == "__main__":  # golden (re)generation entry
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    names = sys.argv[1:] or sorted(ENC_SPECS)
    for n in names:
        print(f"golden[{n}] →", generate_golden(n))
