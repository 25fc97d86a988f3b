"""Real-checkpoint validation harness (BASELINE config 1 staging).

One command runs the wikitext-2 perplexity gate on a REAL quantized
checkpoint and (optionally) diffs it against a llama.cpp binary's own
number — the validation that tiny-synthetic goldens cannot provide:

    python -m superllama_tpu.tools.validate_real \\
        [--model PATH.gguf] [--corpus wiki.test.raw] \\
        [--llama-cpp-bin /path/to/llama-perplexity] \\
        [--n-ctx 512] [--n-chunks N] [--greedy-tokens 64]

With no --model/--corpus it attempts the documented downloads (TinyLlama
1.1B Q4_0 + wikitext-2-raw, the exact pair the reference's
scripts/get-wikitext-2.sh + quantize pipeline produces) and fails with a
CLEAR error in zero-egress environments — pass local paths there.

Checks:
 1. perplexity over the corpus (tools/perplexity methodology, which
    replicates tools/perplexity/perplexity.cpp chunking/BOS/window rules);
 2. greedy decode determinism (two runs, token-identical);
 3. when --llama-cpp-bin is given: runs the reference binary on the same
    model/corpus/n-ctx and requires |ΔPPL|/PPL ≤ 1% (quantized kernels on
    different hardware legitimately differ in low-order bits).

Exit code 0 = all gates pass; the JSON report prints on stdout.
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

MODEL_URL = ("https://huggingface.co/TheBloke/TinyLlama-1.1B-Chat-v1.0-GGUF/"
             "resolve/main/tinyllama-1.1b-chat-v1.0.Q4_0.gguf")
CORPUS_URL = ("https://huggingface.co/datasets/Salesforce/wikitext/resolve/"
              "main/wikitext-2-raw-v1/test-00000-of-00001.parquet")


def _download(url: str, dest: Path) -> Path:
    import urllib.error
    import urllib.request

    if dest.exists():
        return dest
    print(f"downloading {url} -> {dest}", file=sys.stderr)
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(dest, "wb") as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        dest.unlink(missing_ok=True)
        raise SystemExit(
            f"download failed ({e}) — this environment likely has no "
            f"egress.\nFetch manually and pass --model/--corpus:\n"
            f"  {MODEL_URL}\n  {CORPUS_URL}") from e
    return dest


def _load_corpus_text(path: Path) -> str:
    if path.suffix == ".parquet":
        import pandas as pd

        return "\n".join(pd.read_parquet(path)["text"].tolist())
    return path.read_text(errors="replace")


def _reference_ppl(bin_path: str, model: str, corpus_file: str,
                   n_ctx: int) -> float:
    """Run the llama.cpp perplexity binary and parse its final PPL."""
    out = subprocess.run(
        [bin_path, "-m", model, "-f", corpus_file, "-c", str(n_ctx),
         "--ppl-stride", "0"],
        capture_output=True, text=True, timeout=7200)
    text = out.stdout + out.stderr
    m = re.findall(r"PPL = ([0-9.]+)", text) or \
        re.findall(r"perplexity:\s*([0-9.]+)", text)
    if not m:
        raise RuntimeError(f"could not parse PPL from reference output:\n"
                           f"{text[-2000:]}")
    return float(m[-1])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="local GGUF (downloads TinyLlama Q4_0 "
                                    "otherwise)")
    ap.add_argument("--corpus", help="local text/parquet corpus (downloads "
                                     "wikitext-2 test otherwise)")
    ap.add_argument("--llama-cpp-bin", help="path to llama-perplexity for "
                                            "a side-by-side reference run")
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--n-chunks", type=int, default=0,
                    help="cap evaluated chunks (0 = all)")
    ap.add_argument("--greedy-tokens", type=int, default=64)
    ap.add_argument("--cache", default="~/.cache/superllama_tpu/real")
    args = ap.parse_args(argv)

    cache = Path(args.cache).expanduser()
    cache.mkdir(parents=True, exist_ok=True)
    model_path = Path(args.model) if args.model else _download(
        MODEL_URL, cache / "tinyllama-q4_0.gguf")
    corpus_path = Path(args.corpus) if args.corpus else _download(
        CORPUS_URL, cache / "wikitext2-test.parquet")

    from ..models import load_model
    from .perplexity import compute_perplexity

    model = load_model(str(model_path))
    text = _load_corpus_text(corpus_path)
    ids = model.tokenizer.encode(text, add_special=False)
    if args.n_chunks:
        ids = ids[: args.n_chunks * args.n_ctx + 1]
    print(f"corpus: {len(ids)} tokens, n_ctx={args.n_ctx}", file=sys.stderr)

    report: dict = {"model": str(model_path), "n_tokens": len(ids),
                    "n_ctx": args.n_ctx}
    res = compute_perplexity(model, ids, n_ctx=args.n_ctx)
    report["ppl"] = round(res.ppl, 4)
    ok = True

    # greedy determinism gate
    from ..runtime.context import Context

    prompt = model.tokenizer.encode("The meaning of life is",
                                    add_special=True)
    runs = []
    for _ in range(2):
        ctx = Context(model, n_ctx=args.n_ctx)
        runs.append(ctx.greedy_generate(list(prompt), args.greedy_tokens,
                                        stop_eog=False))
    report["greedy_deterministic"] = runs[0] == runs[1]
    ok &= report["greedy_deterministic"]

    if args.llama_cpp_bin:
        # the reference binary wants a plain-text file
        if corpus_path.suffix == ".parquet":
            txt = cache / "wikitext2-test.raw"
            txt.write_text(text)
            corpus_file = str(txt)
        else:
            corpus_file = str(corpus_path)
        ref = _reference_ppl(args.llama_cpp_bin, str(model_path),
                             corpus_file, args.n_ctx)
        report["ppl_reference"] = round(ref, 4)
        report["ppl_rel_delta"] = round(abs(res.ppl - ref) / ref, 5)
        report["ppl_parity"] = report["ppl_rel_delta"] <= 0.01
        ok &= report["ppl_parity"]

    report["ok"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
