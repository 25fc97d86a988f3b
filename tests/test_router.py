"""Router-mode tests: multi-model front door with per-request routing and
runtime /models/load + /models/unload (server router mode counterpart,
tools/server/server.cpp:124-164 + server-models.cpp)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.server.http import Server
from superllama_tpu.server.router import ModelRouter
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(101)


def _mk_gguf(tmp, name, hidden, seed):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=hidden, intermediate_size=hidden * 2,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=128, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False,
    )
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp / f"{name}.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return str(path)


@pytest.fixture(scope="module")
def router_srv(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("router")
    p1 = _mk_gguf(tmp, "alpha", 32, 1)
    p2 = _mk_gguf(tmp, "beta", 48, 2)
    router = ModelRouter(n_slots=1, n_ctx=64, kv_dtype=np.float32)
    router.load("alpha", p1)
    srv = Server(router, port=0)
    srv.start()
    yield srv, router, p2
    srv.stop()


def _req(port, path, body=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data,
                               method=method or ("POST" if data else "GET"),
                               headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(r, timeout=120) as resp:
        return json.loads(resp.read())


def test_router_default_model(router_srv):
    srv, router, _ = router_srv
    out = _req(srv.port, "/v1/completions", {"prompt": "hi", "max_tokens": 3})
    assert out["model"] == "alpha"
    assert out["usage"]["completion_tokens"] == 3


def test_router_load_route_unload(router_srv):
    srv, router, p2 = router_srv
    out = _req(srv.port, "/models/load", {"model": "beta", "path": p2})
    assert out["success"]
    models = _req(srv.port, "/v1/models")["data"]
    assert {m["id"] for m in models} == {"alpha", "beta"}

    out = _req(srv.port, "/v1/completions",
               {"model": "beta", "prompt": "hi", "max_tokens": 3})
    assert out["model"] == "beta"
    # alpha still routes
    out = _req(srv.port, "/v1/completions",
               {"model": "alpha", "prompt": "hi", "max_tokens": 2})
    assert out["model"] == "alpha"

    out = _req(srv.port, "/models/unload", {"model": "beta"})
    assert out["success"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv.port, "/v1/completions",
             {"model": "beta", "prompt": "x", "max_tokens": 1})
    assert ei.value.code == 404


def test_router_unknown_model_404(router_srv):
    srv, _, _ = router_srv
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(srv.port, "/v1/completions",
             {"model": "nope", "prompt": "x", "max_tokens": 1})
    assert ei.value.code == 404


def test_router_health_and_chat(router_srv):
    srv, _, _ = router_srv
    h = _req(srv.port, "/health")
    assert "alpha" in h["models"]
    out = _req(srv.port, "/v1/chat/completions",
               {"model": "alpha", "max_tokens": 3,
                "messages": [{"role": "user", "content": "hey"}]})
    assert out["choices"][0]["message"]["role"] == "assistant"
