"""Model download / HF fetch (common/download.cpp counterpart).

The reference resolves `-hf user/model[:QUANT]` through the HuggingFace API,
downloads with resume + ETag revalidation into a cache directory, and loads
from there; `-mu URL` fetches a direct URL. This is the TPU-native port of
that machinery over urllib (no extra deps), with the same behaviors:

 - cache dir ``~/.cache/superllama_tpu/models`` (override: SLT_MODEL_CACHE)
 - atomic downloads (``.tmp`` + rename), Range-based resume of partials
 - ETag sidecar files; a cached file re-downloads only when the server
   reports a different ETag (offline: the cache is served as-is)
 - ``user/model[:QUANT]`` resolution via the HF tree API: picks the .gguf
   whose name contains the quant tag (case-insensitive); bare repos with
   exactly one .gguf need no tag
 - multi-shard models: downloading a ``*-00001-of-000NN.gguf`` fetches all
   sibling shards

Zero-egress environments get a clear actionable error, never a stack trace.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.error
import urllib.request
from pathlib import Path

HF_BASE = os.environ.get("SLT_HF_ENDPOINT", "https://huggingface.co")


class DownloadError(RuntimeError):
    pass


def cache_dir() -> Path:
    d = Path(os.environ.get(
        "SLT_MODEL_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "superllama_tpu",
                     "models")))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _open(url: str, token: str | None = None, headers: dict | None = None,
          method: str = "GET"):
    h = dict(headers or {})
    if token:
        h["Authorization"] = f"Bearer {token}"
    req = urllib.request.Request(url, headers=h, method=method)
    return urllib.request.urlopen(req, timeout=60)


def _head_etag(url: str, token: str | None) -> str | None:
    try:
        with _open(url, token, method="HEAD") as r:
            return r.headers.get("ETag")
    except (urllib.error.URLError, OSError, TimeoutError):
        return None


def download_file(url: str, dest: Path | None = None,
                  token: str | None = None, quiet: bool = False) -> Path:
    """Fetch ``url`` into the cache (or ``dest``) with resume + ETag reuse."""
    dest = dest or (cache_dir() / url.rstrip("/").rsplit("/", 1)[-1])
    etag_f = dest.with_suffix(dest.suffix + ".etag")
    if dest.exists():
        etag = _head_etag(url, token)
        if etag is None or (etag_f.exists()
                            and etag_f.read_text().strip() == etag.strip()):
            return dest                     # offline or unchanged: reuse
        dest.unlink()                       # stale: re-fetch
    tmp = dest.with_suffix(dest.suffix + ".tmp")
    tmp_etag_f = dest.with_suffix(dest.suffix + ".tmp.etag")
    start = tmp.stat().st_size if tmp.exists() else 0
    if start:
        # a partial may only be resumed against the SAME remote content:
        # if the server's current ETag differs from the one recorded when
        # the partial started (or none was recorded), splicing would mix
        # bytes of two versions — discard and restart (download.cpp does
        # the same ETag revalidation before resuming).
        cur = _head_etag(url, token)
        rec = (tmp_etag_f.read_text().strip()
               if tmp_etag_f.exists() else None)
        if cur is not None and (rec is None or rec != cur.strip()):
            tmp.unlink()
            if tmp_etag_f.exists():
                tmp_etag_f.unlink()
            start = 0
    headers = {"Range": f"bytes={start}-"} if start else {}
    try:
        r = _open(url, token, headers)
    except urllib.error.HTTPError as e:
        if e.code == 416 and start:         # partial is already the whole file
            os.replace(tmp, dest)
            if tmp_etag_f.exists():
                os.replace(tmp_etag_f, etag_f)
            return dest
        raise DownloadError(
            f"download failed: HTTP {e.code} for {url}\n"
            f"(check the repo/file name; gated repos need --hf-token)") from e
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        raise DownloadError(
            f"download failed ({e}) — no egress from this environment?\n"
            f"Fetch manually and pass the local path:\n  {url}") from e
    with r:
        if start and r.status != 206:       # server ignored Range: restart
            start = 0
        if not start:                       # fresh stream: pin its version
            resp_etag = r.headers.get("ETag")
            if resp_etag:
                tmp_etag_f.write_text(resp_etag)
            elif tmp_etag_f.exists():
                tmp_etag_f.unlink()
        mode = "ab" if start else "wb"
        total = r.headers.get("Content-Length")
        total = (int(total) + start) if total else None
        done = start
        with open(tmp, mode) as f:
            while True:
                buf = r.read(1 << 20)
                if not buf:
                    break
                f.write(buf)
                done += len(buf)
                if not quiet and total:
                    pct = 100.0 * done / max(total, 1)
                    print(f"\r{dest.name}: {done >> 20} MiB ({pct:.0f}%)",
                          end="", file=sys.stderr, flush=True)
        if not quiet:
            print(file=sys.stderr)
        etag = r.headers.get("ETag")
    os.replace(tmp, dest)
    if tmp_etag_f.exists():
        tmp_etag_f.unlink()
    if etag:
        etag_f.write_text(etag)
    return dest


def _hf_tree(repo: str, token: str | None) -> list[str]:
    url = f"{HF_BASE}/api/models/{repo}/tree/main?recursive=true"
    try:
        with _open(url, token) as r:
            tree = json.load(r)
    except urllib.error.HTTPError as e:
        raise DownloadError(
            f"HF repo listing failed: HTTP {e.code} for {repo}\n"
            f"(private/gated repos need --hf-token)") from e
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        raise DownloadError(
            f"cannot reach {HF_BASE} ({e}) — no egress? Pass an explicit "
            f"file with -hff, or download manually and use -m PATH") from e
    return [t["path"] for t in tree if t.get("type") == "file"]


def resolve_hf(repo: str, file: str | None = None,
               token: str | None = None) -> list[str]:
    """``user/model[:QUANT]`` (+ optional explicit file) → download URLs."""
    tag = None
    if ":" in repo:
        repo, tag = repo.split(":", 1)
    if file is None:
        ggufs = [p for p in _hf_tree(repo, token) if p.endswith(".gguf")]
        if tag:
            ggufs = [p for p in ggufs if tag.lower() in p.lower()]
        # shard sets count once (their first shard)
        firsts = [p for p in ggufs
                  if not re.search(r"-\d{5}-of-\d{5}\.gguf$", p)
                  or re.search(r"-00001-of-\d{5}\.gguf$", p)]
        if len(firsts) != 1:
            raise DownloadError(
                f"{repo}: {'no' if not firsts else len(firsts)} matching "
                f".gguf files{' for tag ' + tag if tag else ''} — pass -hff "
                f"FILE. Available: {', '.join(ggufs[:20]) or '(none)'}")
        file = firsts[0]
    m = re.search(r"-(\d{5})-of-(\d{5})\.gguf$", file)
    files = ([re.sub(r"-\d{5}-of-", f"-{i:05d}-of-", file)
              for i in range(1, int(m.group(2)) + 1)] if m else [file])
    return [f"{HF_BASE}/{repo}/resolve/main/{f}" for f in files]


def fetch_model(model_url: str | None = None, hf_repo: str | None = None,
                hf_file: str | None = None, token: str | None = None,
                quiet: bool = False) -> str:
    """CLI entry glue: returns a local model path for -mu/-hf args."""
    if model_url:
        return str(download_file(model_url, token=token, quiet=quiet))
    if hf_repo:
        urls = resolve_hf(hf_repo, hf_file, token)
        paths = [download_file(u, token=token, quiet=quiet) for u in urls]
        return str(paths[0])
    raise DownloadError("no --model-url or --hf-repo given")


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        description="download a GGUF model into the cache")
    ap.add_argument("spec", help="URL or user/model[:QUANT]")
    ap.add_argument("--file", help="explicit file inside the repo")
    ap.add_argument("--token", default=os.environ.get("HF_TOKEN"))
    args = ap.parse_args(argv)
    try:
        if args.spec.startswith(("http://", "https://")):
            p = fetch_model(model_url=args.spec, token=args.token)
        else:
            p = fetch_model(hf_repo=args.spec, hf_file=args.file,
                            token=args.token)
    except DownloadError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
