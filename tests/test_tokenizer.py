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


def test_ugm_viterbi_optimal():
    """UGM segmentation must equal the brute-force best-scoring segmentation
    (unigram-LM semantics, llm_tokenizer_ugm counterpart)."""
    import itertools

    from superllama_tpu.tokenizer.tokenizer import Tokenizer
    from superllama_tpu.tokenizer.vocab import Vocab

    tokens = ["<unk>", "<s>", "</s>", "▁", "▁he", "▁hello", "he", "hello",
              "l", "lo", "o", "▁w", "▁world", "wor", "world", "ld", "d", "r", "w"]
    scores = [-10.0, 0.0, 0.0, -3.0, -4.0, -5.5, -4.5, -6.0,
              -2.0, -3.5, -2.5, -4.0, -6.5, -5.0, -7.5, -3.0, -2.2, -2.4, -2.6]
    from superllama_tpu.tokenizer.vocab import TokenAttr
    attrs = [TokenAttr.UNKNOWN, TokenAttr.CONTROL, TokenAttr.CONTROL] + \
            [TokenAttr.NORMAL] * (len(tokens) - 3)
    v = Vocab(model="t5", pre="", tokens=tokens, scores=scores, attrs=attrs,
              bos_id=-1, eos_id=2, unk_id=0, add_bos=False, add_eos=False,
              add_space_prefix=True)
    tok = Tokenizer(v)

    def brute_best(text):
        n = len(text)
        best_score, best_seg = float("-inf"), None
        def rec(i, seg, score):
            nonlocal best_score, best_seg
            if i == n:
                if score > best_score:
                    best_score, best_seg = score, list(seg)
                return
            for j in range(i + 1, n + 1):
                tid = v.token_to_id.get(text[i:j])
                if tid is not None:
                    seg.append(tid)
                    rec(j, seg, score + scores[tid])
                    seg.pop()
            # unk single char
            seg.append(0)
            rec(i + 1, seg, score + min(s for s in scores) - 10.0)
            seg.pop()
        rec(0, [], 0.0)
        # fuse consecutive unks like the tokenizer does
        fused = [t for k, t in enumerate(best_seg)
                 if not (t == 0 and k > 0 and best_seg[k - 1] == 0)]
        return fused

    for text in ("hello world", "world", "he lo", "hellox", "xyz he"):
        got = tok.encode(text, add_special=False)
        norm = "▁" + text.replace(" ", "▁")
        assert got == brute_best(norm), (text, got, brute_best(norm))


def test_ugm_specials_and_eos():
    from superllama_tpu.tokenizer.tokenizer import Tokenizer
    from superllama_tpu.tokenizer.vocab import Vocab

    tokens = ["<unk>", "<s>", "</s>", "▁a", "b", "▁", "a"]
    scores = [0.0, 0.0, 0.0, -1.0, -1.0, -2.0, -1.5]
    from superllama_tpu.tokenizer.vocab import TokenAttr
    attrs = [TokenAttr.UNKNOWN, TokenAttr.CONTROL, TokenAttr.CONTROL,
             TokenAttr.NORMAL, TokenAttr.NORMAL, TokenAttr.NORMAL, TokenAttr.NORMAL]
    v = Vocab(model="t5", pre="", tokens=tokens, scores=scores, attrs=attrs,
              bos_id=-1, eos_id=2, unk_id=0, add_bos=False, add_eos=True,
              add_space_prefix=True)
    tok = Tokenizer(v)
    ids = tok.encode("a b", add_special=True)
    assert ids[-1] == 2            # </s> appended (T5 convention)
    assert ids[:-1] == [3, 5, 4]   # ▁a ▁ b


def test_rwkv_trie_tokenizer():
    """RWKV world tokenizer: greedy longest byte match over an unescaped-token
    trie (llm_tokenizer_rwkv, src/llama-vocab.cpp:1190-1244)."""
    from superllama_tpu.tokenizer.tokenizer import Tokenizer, _rwkv_unescape
    from superllama_tpu.tokenizer.vocab import TokenAttr, Vocab

    assert _rwkv_unescape(r"\x41\x42") == b"AB"
    assert _rwkv_unescape(r"a\tb\nc\\d") == b"a\tb\nc\\d"

    # world-style vocab: all single bytes (escaped) + a few merged words
    tokens = ["<s>"] + [f"\\x{b:02x}" for b in range(256)] + [
        "hello", " world", "hell", "▁",
    ]
    n = len(tokens)
    attrs = [TokenAttr.CONTROL] + [TokenAttr.NORMAL] * (n - 1)
    v = Vocab(model="rwkv", pre="", tokens=tokens, scores=[0.0] * n,
              attrs=attrs, add_bos=False, add_eos=False, add_space_prefix=False)
    tok = Tokenizer(v)

    hello, world, hell = n - 4, n - 3, n - 2
    ids = tok.encode("hello world", add_special=False)
    assert ids == [hello, world]
    # longest match wins over prefix token
    ids = tok.encode("hellx", add_special=False)
    assert ids == [hell, 1 + ord("x")]
    # arbitrary bytes fall back to byte tokens; decode roundtrips
    text = "hello \tworld\x00é"
    ids = tok.encode(text, add_special=False)
    assert tok.decode(ids) == text


def test_native_tokenizer_bitexact():
    """Native C++ SPM/BPE cores must match the python reference token-for-
    token on every ecosystem golden fixture + random fuzz strings."""
    import glob
    import os
    import random

    from superllama_tpu import native
    from superllama_tpu.gguf import GGUFReader
    from superllama_tpu.tokenizer import Tokenizer, vocab_from_gguf

    if native._load_tok() is None:
        pytest.skip("native toolchain unavailable")

    rng = random.Random(0)
    fuzz = []
    for _ in range(60):
        n = rng.randint(0, 40)
        fuzz.append("".join(chr(rng.choice(
            [rng.randint(32, 126), rng.randint(0xA0, 0x2FF),
             rng.randint(0x4E00, 0x4FFF), 0x1F600 + rng.randint(0, 60)]))
            for _ in range(n)))
    fuzz += ["", " ", "  leading", "trail  ", "a\nb\tc", "ő﷽🦙🦙", "\x00ab"]

    for path in sorted(glob.glob("/root/reference/models/ggml-vocab-*.gguf")):
        r = GGUFReader(path)
        try:
            v = vocab_from_gguf(r)
        finally:
            r.close()
        if v.model not in ("llama", "gpt2"):
            continue
        tok_nat = Tokenizer(v)
        if tok_nat._native() is None:
            pytest.skip("native tokenizer failed to build")
        tok_py = Tokenizer(v)
        tok_py._nat_tried = True  # force python path

        inp_file = path + ".inp"
        cases = list(fuzz)
        if os.path.exists(inp_file):
            cases += open(inp_file, encoding="utf-8").read().split(
                "\n__ggml_vocab_test__\n")
        for text in cases:
            a = tok_nat.encode(text, add_special=False)
            b = tok_py.encode(text, add_special=False)
            assert a == b, (os.path.basename(path), text[:40], a[:20], b[:20])


def test_plamo2_tokenizer():
    """PLaMo-2 Viterbi (llm_tokenizer_plamo2 semantics): minimize Σ(−score·1e4)
    with an unknown penalty; byte fallback for uncovered codepoints."""
    from superllama_tpu.tokenizer.tokenizer import Tokenizer
    from superllama_tpu.tokenizer.vocab import TokenAttr, Vocab

    tokens = (["<|plamo:unk|>", "<|plamo:bos|>", "<|plamo:eos|>",
               "<|plamo:pad|>"]
              + [f"<0x{b:02X}>" for b in range(256)]
              + ["a", "b", "ab", "abc", "c", "hello", "hell", "o"])
    n = len(tokens)
    scores = [0.0] * 4 + [0.0] * 256 + [-3.0, -3.0, -2.0, -10.0, -3.5,
                                        -4.0, -6.0, -3.0]
    attrs = ([TokenAttr.UNKNOWN, TokenAttr.CONTROL, TokenAttr.CONTROL,
              TokenAttr.CONTROL] + [TokenAttr.BYTE] * 256
             + [TokenAttr.NORMAL] * 8)
    v = Vocab(model="plamo2", pre="", tokens=tokens, scores=scores,
              attrs=attrs, bos_id=1, eos_id=2, unk_id=0, add_bos=False,
              add_eos=False, add_space_prefix=False)
    tok = Tokenizer(v)
    A, AB, ABC, C = n - 8, n - 6, n - 5, n - 4
    HELLO = n - 3
    # "abc" as one token (-10) loses to ab+c (-2 + -3.5 = -5.5): minimizing
    # -score means choosing the SMALLER total cost = larger score sum
    assert tok.encode("abc", add_special=False) == [AB, C]
    assert tok.encode("hello", add_special=False) == [HELLO]
    # uncovered codepoint → UTF-8 byte fallback tokens
    ids = tok.encode("aé", add_special=False)
    assert ids[0] == A and ids[1:] == [4 + b for b in "é".encode("utf-8")]
    # BOM skipped
    assert tok.encode("﻿a", add_special=False) == [A]
