"""Model download machinery (common/download.cpp counterpart): resume, ETag
reuse, HF repo/quant-tag resolution, shard expansion — driven against a
local HTTP server (the zero-egress environment never touches the network)."""

import http.server
import json
import threading

import pytest

from superllama_tpu.tools import download as dl
from superllama_tpu.tools.download import (DownloadError, download_file,
                                           fetch_model, resolve_hf)

PAYLOAD = b"GGUF" + bytes(range(256)) * 64          # 16.4 KB fake model


class _Handler(http.server.BaseHTTPRequestHandler):
    etag = '"v1"'
    fail_first_range = False

    def log_message(self, *a):
        pass

    def _serve_bytes(self, data, code=200, extra=None):
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.send_header("ETag", self.etag)
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(data)

    def do_HEAD(self):
        self.do_GET()

    def do_GET(self):
        p = self.path
        if p.startswith("/api/models/"):
            tree = [{"type": "file", "path": f}
                    for f in self.server.repo_files]
            return self._serve_bytes(json.dumps(tree).encode())
        if p.endswith(".gguf"):
            rng = self.headers.get("Range")
            if rng:
                start = int(rng.split("=")[1].rstrip("-"))
                return self._serve_bytes(
                    PAYLOAD[start:], code=206,
                    extra={"Content-Range":
                           f"bytes {start}-{len(PAYLOAD)-1}/{len(PAYLOAD)}"})
            return self._serve_bytes(PAYLOAD)
        self._serve_bytes(b"nope", code=404)


@pytest.fixture()
def hf(tmp_path, monkeypatch):
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.repo_files = ["README.md", "model.Q4_0.gguf", "model.Q8_0.gguf"]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    monkeypatch.setattr(dl, "HF_BASE", base)
    monkeypatch.setenv("SLT_MODEL_CACHE", str(tmp_path / "cache"))
    yield srv, base
    srv.shutdown()


def test_download_and_etag_reuse(hf, tmp_path):
    srv, base = hf
    p = download_file(f"{base}/r/m/resolve/main/model.Q4_0.gguf", quiet=True)
    assert p.read_bytes() == PAYLOAD
    mtime = p.stat().st_mtime_ns
    # unchanged ETag: second call reuses the cached file untouched
    p2 = download_file(f"{base}/r/m/resolve/main/model.Q4_0.gguf", quiet=True)
    assert p2 == p and p.stat().st_mtime_ns == mtime


def test_resume_from_partial(hf, tmp_path):
    srv, base = hf
    dest = dl.cache_dir() / "model.Q4_0.gguf"
    tmp = dest.with_suffix(dest.suffix + ".tmp")
    tmp.write_bytes(PAYLOAD[:1000])                 # interrupted download
    # the partial's version sidecar matches the server → resume is legal
    tmp.with_suffix(tmp.suffix + ".etag").write_text(_Handler.etag)
    p = download_file(f"{base}/r/m/resolve/main/model.Q4_0.gguf", quiet=True)
    assert p.read_bytes() == PAYLOAD                # Range resume completed
    assert not tmp.with_suffix(tmp.suffix + ".etag").exists()


def test_stale_partial_discarded_on_etag_change(hf, tmp_path):
    """A partial recorded under a DIFFERENT remote version must be thrown
    away, not spliced with bytes of the new version (download.cpp ETag
    revalidation; ADVICE r4)."""
    srv, base = hf
    dest = dl.cache_dir() / "model.Q4_0.gguf"
    tmp = dest.with_suffix(dest.suffix + ".tmp")
    tmp.write_bytes(b"\xff" * 1000)                 # bytes of an OLD version
    tmp.with_suffix(tmp.suffix + ".etag").write_text('"v0-old"')
    p = download_file(f"{base}/r/m/resolve/main/model.Q4_0.gguf", quiet=True)
    assert p.read_bytes() == PAYLOAD                # clean re-download

    # a partial with NO recorded version is equally untrustworthy
    p.unlink()
    tmp.write_bytes(b"\xff" * 1000)
    p = download_file(f"{base}/r/m/resolve/main/model.Q4_0.gguf", quiet=True)
    assert p.read_bytes() == PAYLOAD


def test_resolve_quant_tag(hf):
    srv, base = hf
    urls = resolve_hf("user/model:q8_0")
    assert len(urls) == 1 and urls[0].endswith("model.Q8_0.gguf")
    with pytest.raises(DownloadError, match="2 matching"):
        resolve_hf("user/model")                    # ambiguous: two ggufs


def test_resolve_shards(hf):
    srv, base = hf
    srv.repo_files = ["m-00001-of-00003.gguf", "m-00002-of-00003.gguf",
                      "m-00003-of-00003.gguf"]
    urls = resolve_hf("user/model")
    assert len(urls) == 3
    assert [u.rsplit("/", 1)[1] for u in urls] == srv.repo_files


def test_fetch_model_end_to_end(hf):
    srv, base = hf
    p = fetch_model(hf_repo="user/model:q4_0", quiet=True)
    assert p.endswith("model.Q4_0.gguf")


def test_no_egress_error_is_clear(monkeypatch, tmp_path):
    monkeypatch.setattr(dl, "HF_BASE", "http://127.0.0.1:9")   # closed port
    monkeypatch.setenv("SLT_MODEL_CACHE", str(tmp_path))
    with pytest.raises(DownloadError, match="egress"):
        resolve_hf("user/model")
    with pytest.raises(DownloadError, match="egress"):
        download_file("http://127.0.0.1:9/m.gguf", quiet=True)
