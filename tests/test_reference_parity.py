"""Cross-engine parity gate vs the COMPILED reference (VERDICT r1 item 4).

The reference's own CPU stack (built from /root/reference via cmake) evaluates
a tiny llama GGUF — written by OUR writer — over the committed corpus with
`llama-perplexity --save-all-logits`, and we assert token-level distribution
parity (KL < 1e-4) plus PPL parity against our tools/perplexity.py on the
same file. This is the gate SURVEY §7 stage 1 calls the hard correctness bar:
tokenizer + numerics + quant codecs + methodology all have to agree at once.

Reference pieces exercised: tools/perplexity/perplexity.cpp:440-640 (chunking,
BOS substitution, eval window first..n_ctx-2, logits-file format with f16-ish
uint16 log-prob quantization at :77-104).

Requires the reference CPU build at $SLT_REF_BUILD (default /tmp/refbuild):
    cmake /root/reference -B /tmp/refbuild -DCMAKE_BUILD_TYPE=Release \
        -DLLAMA_CURL=OFF -DLLAMA_BUILD_TESTS=OFF -DLLAMA_BUILD_EXAMPLES=OFF \
        -DLLAMA_BUILD_SERVER=OFF
    cmake --build /tmp/refbuild --target llama-perplexity llama-cli
Skipped when the binary is absent (build takes ~40 min single-core; it is not
rebuilt inside the test run).
"""

import math
import os
import re
import subprocess
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models.loader import load_model
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.tools.perplexity import compute_perplexity

REF_BUILD = Path(os.environ.get("SLT_REF_BUILD", "/tmp/refbuild"))
PERPLEXITY_BIN = REF_BUILD / "bin" / "llama-perplexity"
CLI_BIN = next((p for p in (REF_BUILD / "bin" / "llama-completion",
                            REF_BUILD / "bin" / "llama-cli") if p.exists()),
               REF_BUILD / "bin" / "llama-completion")
CORPUS = Path(__file__).parent / "goldens" / "parity_corpus.txt"
N_CTX = 128

pytestmark = pytest.mark.skipif(
    not PERPLEXITY_BIN.exists(),
    reason="reference CPU build missing (see module docstring)")


@pytest.fixture(scope="module")
def tiny_ggufs(tmp_path_factory):
    """Tiny llama GGUFs (real SPM vocab + deterministic random weights) in
    F32 and quantized variants, written by OUR writer/encoders."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1234)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items()
                  if k.startswith("tokenizer.")}
    r.close()
    d = tmp_path_factory.mktemp("parity")
    paths = {}
    for name, ttype in (("f32", GGMLType.F32), ("q8_0", GGMLType.Q8_0),
                        ("q4_k", GGMLType.Q4_K)):
        p = d / f"m-{name}.gguf"
        convert_state_dict(str(p), cfg, sd, ttype, tokenizer_fields=tok_fields)
        paths[name] = str(p)
    return paths


def _run_reference(gguf_path: str, kld_out: str) -> float:
    """Run the reference llama-perplexity; returns its final PPL."""
    cmd = [str(PERPLEXITY_BIN), "-m", gguf_path, "-f", str(CORPUS),
           "-c", str(N_CTX), "-b", str(N_CTX), "--chunks", "4",
           "--save-all-logits", kld_out, "-t", "1", "--no-warmup"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    m = re.search(r"Final estimate: PPL = ([0-9.]+)", out)
    assert m, out[-3000:]
    return float(m.group(1))


def _parse_kld(path: str):
    """Parse the --save-all-logits file (perplexity.cpp:466-532,77-104):
    magic, n_ctx, n_vocab, n_chunk, tokens[n_chunk·n_ctx]; then per chunk
    (n_ctx-1-first) records of nv uint16: [f32 scale, f32 min_log_prob] + a
    uint16-quantized log-prob row (logp_i = min_log_prob + scale·q_i)."""
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
    hdr = recs[:, :, :4].copy().view(np.float32)      # (chunk, rec, 2)
    scale, min_lp = hdr[..., 0], hdr[..., 1]
    q = recs[:, :, 4:4 + n_vocab].astype(np.float32)
    logp = min_lp[..., None] + scale[..., None] * q   # (chunk, rec, V)
    return int(n_ctx), int(n_vocab), toks, first, logp


def _our_eval(gguf_path: str, toks: np.ndarray, first: int):
    """Forward each chunk through our stack; returns (logp rows aligned with
    the reference records, ppl)."""
    model = load_model(gguf_path, keep_quantized=True)
    n_chunk, n_ctx = toks.shape
    flat = toks.reshape(-1)
    sink: list[np.ndarray] = []
    res = compute_perplexity(model, flat, n_ctx=n_ctx, logits_sink=sink)
    ours = np.stack([s[first:n_ctx - 1] for s in sink])   # (chunk, rec, V)
    return ours, res.ppl


@pytest.mark.parametrize("name,kl_tol,ppl_tol", [
    ("f32", 1e-4, 2e-3), ("q8_0", 2e-4, 2e-3), ("q4_k", 2e-4, 2e-3)])
def test_logits_and_ppl_parity(tiny_ggufs, tmp_path, name, kl_tol, ppl_tol):
    kld = str(tmp_path / f"{name}.kld")
    ref_ppl = _run_reference(tiny_ggufs[name], kld)
    n_ctx, n_vocab, toks, first, ref_logp = _parse_kld(kld)
    assert n_ctx == N_CTX and n_vocab == 32000
    our_logp, our_ppl = _our_eval(tiny_ggufs[name], toks, first)
    assert our_logp.shape == ref_logp.shape
    # KL(ref ‖ ours) per token over the full vocab; the uint16 quantization
    # of the saved reference logits bounds the floor at ~1e-6
    p_ref = np.exp(ref_logp)
    kl = (p_ref * (ref_logp - our_logp)).sum(-1)
    assert kl.mean() < kl_tol, (name, float(kl.mean()), float(kl.max()))
    rel = abs(our_ppl - ref_ppl) / ref_ppl
    assert rel < ppl_tol, (name, our_ppl, ref_ppl)


def test_greedy_token_parity(tiny_ggufs, tmp_path):
    """End-to-end greedy continuation: reference llama-cli vs our DecodeLoop
    must emit the same token text for the same prompt at temp 0."""
    if not CLI_BIN.exists():
        pytest.skip("llama-completion/llama-cli not built")
    prompt = "The state of the world and the people"
    r = subprocess.run(
        [str(CLI_BIN), "-m", tiny_ggufs["f32"], "-p", prompt, "-n", "12",
         "--temp", "0", "-c", "128", "-t", "1", "--no-warmup",
         "--no-display-prompt", "-no-cnv", "--seed", "1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    ref_text = r.stdout.strip()
    model = load_model(tiny_ggufs["f32"])
    from superllama_tpu.runtime.decode_loop import DecodeLoop

    import jax.numpy as jnp

    ids = model.tokenizer.encode(prompt, add_special=True)
    out = DecodeLoop(model, n_ctx=128, kv_dtype=jnp.float32).generate(
        ids, 12, stop_eog=False)
    our_text = model.tokenizer.decode(out[len(ids):])
    assert our_text.strip() == ref_text.strip(), (our_text, ref_text)
