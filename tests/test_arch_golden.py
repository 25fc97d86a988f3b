"""Reference-oracle architecture parity via committed goldens.

For each spec in tests/ref_arch_specs.py: rebuild the deterministic tiny GGUF,
run OUR stack over the golden's token stream, and assert log-prob parity
against logits produced by the reference's compiled CPU engine
(`llama-perplexity --save-all-logits`, tools/perplexity/perplexity.cpp:466).

Goldens are generated once where the reference build exists
(`python tests/test_arch_golden.py [arch ...]` regenerates) and committed as
tests/goldens/arch_logits/<arch>.npz, so the parity check itself needs no
C++ toolchain — the same pattern as the tokenizer golden fixtures.
"""

from __future__ import annotations

import os
import re
import subprocess
from pathlib import Path

import numpy as np
import pytest

from ref_arch_specs import SPECS, build_gguf

GOLDEN_DIR = Path(__file__).parent / "goldens" / "arch_logits"
CORPUS = Path(__file__).parent / "goldens" / "parity_corpus.txt"
REF_BUILD = Path(os.environ.get("SLT_REF_BUILD", "/tmp/refbuild"))
PERPLEXITY_BIN = REF_BUILD / "bin" / "llama-perplexity"
N_CTX = 128
N_CHUNK = 2
TOP_K = 64
SKIP_FIRST_RECORD = {"chameleon"}
SKIP_PPL = {"chameleon"}   # suppressed rows poison the reference PPL
# cogvlm's builder ignores inp_out_ids (cogvlm.cpp has no gather), so the
# reference runtime slices the FIRST n_outputs logit rows: its kld records
# hold positions 0..n_rec-1, not first..n_ctx-2 (verified vs eval-callback,
# which matches our forward row-for-row). Its PPL is wrong the same way.
REF_ROWS_FROM_ZERO = {"cogvlm"}
# the reference's own CPU flash-attention kernel asserts on plm's MLA
# head shapes (ggml.c:3830) — evaluate its golden with FA off
EXTRA_REF_ARGS = {"plm": ["-fa", "off"]}


def _parse_kld(path: str):
    """Parse --save-all-logits output (perplexity.cpp:77-104,466-532):
    header, tokens, then per-chunk uint16-quantized log-prob rows for
    positions first..n_ctx-2 (first = n_ctx/2)."""
    raw = open(path, "rb").read()
    assert raw[:8] == b"_logits_"
    n_ctx, n_vocab, n_chunk = np.frombuffer(raw[8:20], np.int32)
    off = 20
    toks = np.frombuffer(raw[off:off + 4 * n_chunk * n_ctx], np.int32)
    toks = toks.reshape(n_chunk, n_ctx)
    off += toks.nbytes
    first = n_ctx // 2
    n_rec = n_ctx - 1 - first
    nv = 2 * ((n_vocab + 1) // 2) + 4
    recs = np.frombuffer(raw[off:], np.uint16).reshape(n_chunk, n_rec, nv)
    hdr = recs[:, :, :4].copy().view(np.float32)
    scale, min_lp = hdr[..., 0], hdr[..., 1]
    q = recs[:, :, 4:4 + n_vocab].astype(np.float32)
    logp = min_lp[..., None] + scale[..., None] * q    # (chunk, rec, V)
    return toks, first, logp


def generate_golden(name: str, out_dir: Path = GOLDEN_DIR) -> Path:
    """Run the reference CPU engine on the spec's GGUF; store a compressed
    summary (top-K token log-probs per position + argmax + PPL)."""
    import tempfile

    assert PERPLEXITY_BIN.exists(), "reference CPU build missing"
    arch, md, tensors = SPECS[name]()
    with tempfile.TemporaryDirectory() as d:
        gguf = Path(d) / f"{name}.gguf"
        build_gguf(gguf, arch, md, tensors)
        kld = Path(d) / f"{name}.kld"
        cmd = [str(PERPLEXITY_BIN), "-m", str(gguf), "-f", str(CORPUS),
               "-c", str(N_CTX), "-b", str(N_CTX), "--chunks", str(N_CHUNK),
               "--save-all-logits", str(kld), "-t", "1", "--no-warmup",
               *EXTRA_REF_ARGS.get(name, [])]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
        out = r.stdout + r.stderr
        assert r.returncode == 0, f"{name}: {out[-3000:]}"
        m = re.search(r"Final estimate: PPL = ([0-9.]+)", out)
        toks, first, logp = _parse_kld(str(kld))
    order = np.argsort(-logp, axis=-1)[..., :TOP_K]
    top_logp = np.take_along_axis(logp, order, axis=-1)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"{name}.npz"
    np.savez_compressed(
        path, tokens=toks.astype(np.int32), first=np.int32(first),
        top_ids=order.astype(np.int32), top_logp=top_logp.astype(np.float32),
        ppl=np.float32(float(m.group(1)) if m else np.nan))
    return path


def _our_logprobs(gguf_path: str, toks: np.ndarray, first: int,
                  n_rec: int | None = None):
    from superllama_tpu.models.loader import load_model
    from superllama_tpu.tools.perplexity import compute_perplexity

    model = load_model(gguf_path)
    n_chunk, n_ctx = toks.shape
    sink: list[np.ndarray] = []
    res = compute_perplexity(model, toks.reshape(-1), n_ctx=n_ctx,
                             logits_sink=sink)
    n_rec = n_rec if n_rec is not None else n_ctx - 1 - first
    rows = np.stack([s[first:first + n_rec] for s in sink]).astype(np.float64)
    logz = np.log(np.exp(rows - rows.max(-1, keepdims=True)).sum(-1))
    logp = rows - rows.max(-1, keepdims=True) - logz[..., None]
    return logp, res.ppl


@pytest.mark.parametrize("name", sorted(SPECS))
def test_arch_golden_parity(name, tmp_path):
    golden_path = GOLDEN_DIR / f"{name}.npz"
    if not golden_path.exists():
        if not PERPLEXITY_BIN.exists():
            pytest.skip(f"golden missing and no reference build: {name}")
        golden_path = generate_golden(name)
    g = np.load(golden_path)
    arch, md, tensors = SPECS[name]()
    gguf = tmp_path / f"{name}.gguf"
    build_gguf(gguf, arch, md, tensors)
    n_rec = g["top_ids"].shape[1]
    first = 0 if name in REF_ROWS_FROM_ZERO else int(g["first"])
    ours, our_ppl = _our_logprobs(str(gguf), g["tokens"], first, n_rec)
    top_ids = g["top_ids"]
    ref_top = g["top_logp"].astype(np.float64)       # (chunk, rec, K)
    our_top = np.take_along_axis(ours, top_ids, axis=-1)
    if name in SKIP_FIRST_RECORD:
        # chameleon: the reference's image-token suppression hack
        # (chameleon.cpp:147 ggml_set_1d) rewrites logits row 0 of each
        # ubatch, which lands on the first saved record — not a graph
        # property, so it is excluded from comparison
        ours, our_top, ref_top = ours[:, 1:], our_top[:, 1:], ref_top[:, 1:]
        top_ids = top_ids[:, 1:]
    # the golden's uint16 log-prob quantization floors precision at ~1e-3.
    # A handful of positions may legitimately diverge on MoE archs: when two
    # experts' router logits land within the cross-engine f32 noise the
    # engines select different experts (both orderings are "correct") — so
    # the gate is mean + 98th-percentile rather than max, which still fails
    # loudly on any systematic graph deviation (a wrong norm/rope/scale
    # shifts EVERY position, cf. the minicpm3 muP bug: mean 0.018)
    diff = np.abs(our_top - ref_top)
    assert diff.mean() < 2e-3 and np.quantile(diff, 0.98) < 1e-2, (
        name, float(diff.max()), float(diff.mean()),
        float(np.quantile(diff, 0.98)))
    # same threshold as the HF-parity tests (_parity): tiny random models
    # have near-flat next-token distributions, so argmax is the noisiest stat
    agree = (ours.argmax(-1) == top_ids[..., 0]).mean()
    assert agree > 0.95, (name, float(agree))
    ref_ppl = float(g["ppl"])
    if (np.isfinite(ref_ppl) and name not in SKIP_PPL
            and name not in REF_ROWS_FROM_ZERO):
        assert abs(our_ppl - ref_ppl) / ref_ppl < 5e-3, (our_ppl, ref_ppl)


if __name__ == "__main__":  # golden (re)generation entry
    import sys

    names = sys.argv[1:] or sorted(SPECS)
    for n in names:
        print(f"golden[{n}] →", generate_golden(n))


# aliases of covered archs (same builder, different GGUF arch string) or
# fixture-covered elsewhere — exempt from the oracle/golden requirement
_COVERAGE_ALIASES = {
    "gptoss": "gpt-oss", "tinyllama": "llama", "llama2": "llama",
    "llama-embed": "llama", "mistral": "llama",
}


def test_every_registered_arch_is_covered():
    """Every registered decoder arch must have a reference golden, an
    HF-parity test, or a documented alias — prevents silently-untested
    architectures from accruing (the round-2 audit found 4 real bugs in
    exactly such archs: exaone rope, jais scale, minicpm muP, cohere2
    rope-swa-only)."""
    import glob
    import re as _re

    from superllama_tpu.models.registry import supported_archs
    from superllama_tpu.tools.convert_hf import _ARCH_MAP

    tests = "".join(open(f).read()
                    for f in glob.glob(str(Path(__file__).parent / "test_*.py")))
    arch2cls: dict = {}
    for cls, arch in _ARCH_MAP.items():
        arch2cls.setdefault(arch, []).append(cls)
    uncovered = []
    for a in supported_archs():
        if a in SPECS or a in _COVERAGE_ALIASES:
            continue
        if _re.search(rf'["\']{_re.escape(a)}["\']', tests):
            continue
        if any(c in tests for c in arch2cls.get(a, [])):
            continue
        uncovered.append(a)
    assert not uncovered, f"archs with no oracle/HF coverage: {uncovered}"
