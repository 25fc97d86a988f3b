"""Model encryption (real AES-256-GCM vs the reference's XOR placeholder,
src/llama-security.h:72-76) and TLS server wiring."""

import os

import numpy as np
import pytest

from superllama_tpu.server import security


pytestmark = pytest.mark.skipif(not security.available(),
                                reason="libcrypto unavailable")


def test_encrypt_decrypt_roundtrip(tmp_path):
    src = tmp_path / "model.bin"
    data = np.random.default_rng(0).integers(0, 256, 9_000_000,
                                             dtype=np.uint8).tobytes()
    src.write_bytes(data)                      # spans multiple 4MiB chunks
    enc = security.ModelEncryptor("a" * 64)    # hex key
    out = tmp_path / "model.enc"
    dec = tmp_path / "model.dec"
    enc.encrypt_file(str(src), str(out))
    assert security.ModelEncryptor.is_encrypted(str(out))
    assert not security.ModelEncryptor.is_encrypted(str(src))
    assert out.read_bytes()[:8] != data[:8]
    enc.decrypt_file(str(out), str(dec))
    assert dec.read_bytes() == data


def test_wrong_key_fails_auth(tmp_path):
    src = tmp_path / "m.bin"
    src.write_bytes(b"secret weights" * 1000)
    out = tmp_path / "m.enc"
    security.ModelEncryptor("passphrase-1").encrypt_file(str(src), str(out))
    with pytest.raises(ValueError, match="authentication failed"):
        security.ModelEncryptor("passphrase-2").decrypt_file(
            str(out), str(tmp_path / "m.dec"))


def test_tamper_detected(tmp_path):
    src = tmp_path / "m.bin"
    src.write_bytes(os.urandom(1024))
    out = tmp_path / "m.enc"
    enc = security.ModelEncryptor(b"\x01" * 32)
    enc.encrypt_file(str(src), str(out))
    raw = bytearray(out.read_bytes())
    raw[-1] ^= 0xFF
    out.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        enc.decrypt_file(str(out), str(tmp_path / "m.dec"))


def test_loader_transparent_decrypt(tmp_path, monkeypatch):
    """An encrypted GGUF loads transparently with SLT_MODEL_KEY set."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.models import load_model
    from superllama_tpu.tools.convert_hf import convert_state_dict

    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=2, max_position_embeddings=64,
                      architectures=["LlamaForCausalLM"],
                      tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    plain = tmp_path / "m.gguf"
    convert_state_dict(str(plain), cfg, sd, GGMLType.F32)
    enc_path = tmp_path / "m.gguf.enc"
    security.ModelEncryptor("deploy-key").encrypt_file(str(plain), str(enc_path))
    monkeypatch.setenv("SLT_MODEL_KEY", "deploy-key")
    model = load_model(str(enc_path))
    assert model.hparams.n_embd == 32


def test_tls_server(tmp_path):
    """Server speaks real TLS when given a cert (reference stub parity+)."""
    import http.client
    import ssl
    import subprocess

    cert = tmp_path / "cert.pem"
    rc = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(tmp_path / "key.pem"), "-out", str(cert),
         "-days", "1", "-subj", "/CN=localhost"],
        capture_output=True)
    if rc.returncode != 0:
        pytest.skip("openssl CLI unavailable")

    from superllama_tpu.server.http import Server

    class _App:                                 # minimal transport test app
        model_name = "tls-test"
        t_start = 0.0

        def models(self):
            return []

    srv = Server(_App(), port=0, tls_cert=str(cert),
                 tls_key=str(tmp_path / "key.pem"))
    srv.start()
    try:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        conn = http.client.HTTPSConnection("127.0.0.1", srv.port,
                                           context=ctx, timeout=10)
        conn.request("GET", "/v1/models")
        resp = conn.getresponse()
        assert resp.status == 200
        conn.close()
    finally:
        srv.stop()
