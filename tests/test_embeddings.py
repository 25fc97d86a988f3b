"""BERT encoder + embeddings/rerank pipeline tests: hidden-state parity vs
HF transformers, pooling math, and the server /embeddings + /rerank
endpoints (tools/server test_embedding.py / rerank counterparts)."""

import json
import urllib.request

import numpy as np
import pytest
import torch

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.models.bert import bert_forward, pool
from superllama_tpu.runtime.embedder import Embedder
from superllama_tpu.tools.convert_hf import convert_state_dict

torch.manual_seed(55)


def _bert_cfg(**kw):
    from transformers import BertConfig

    return BertConfig(
        vocab_size=30522, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, architectures=["BertModel"], **kw,
    )


@pytest.fixture(scope="module")
def bert_model(tmp_path_factory):
    from transformers import BertModel

    cfg = _bert_cfg()
    hf = BertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-bert-bge.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    path = tmp_path_factory.mktemp("bert") / "bert.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    return hf, load_model(str(path))


def test_bert_hidden_parity(bert_model):
    import jax.numpy as jnp

    hf, model = bert_model
    rng = np.random.default_rng(0)
    ids = rng.integers(100, 5000, size=(2, 12)).astype(np.int64)
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()
    got = np.asarray(bert_forward(model.params, model.hparams,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32)), np.float32)
    # positions under the padding mask are unconstrained; compare valid ones
    err = np.abs((got - ref) * mask[..., None]).max()
    assert err < 2e-4, err


def test_pooling_modes(bert_model):
    import jax.numpy as jnp

    _, model = bert_model
    hidden = jnp.asarray(np.random.default_rng(1).normal(0, 1, (2, 6, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.int32)
    mean = np.asarray(pool(hidden, mask, "mean", normalize=False))
    np.testing.assert_allclose(mean[0], np.asarray(hidden)[0, :3].mean(0), rtol=1e-5)
    cls = np.asarray(pool(hidden, mask, "cls", normalize=False))
    np.testing.assert_allclose(cls, np.asarray(hidden)[:, 0], rtol=1e-6)
    last = np.asarray(pool(hidden, mask, "last", normalize=False))
    np.testing.assert_allclose(last[0], np.asarray(hidden)[0, 2], rtol=1e-6)
    np.testing.assert_allclose(last[1], np.asarray(hidden)[1, 5], rtol=1e-6)
    normed = np.asarray(pool(hidden, mask, "mean", normalize=True))
    np.testing.assert_allclose(np.linalg.norm(normed, axis=-1), 1.0, rtol=1e-5)


def test_embedder_pipeline(bert_model):
    _, model = bert_model
    emb = Embedder(model)
    out, n_tok = emb.embed(["hello world", "the quick brown fox"])
    assert out.shape[0] == 2 and n_tok > 4
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-4)
    # same text twice → identical embedding; different text → different
    out2, _ = emb.embed(["hello world", "hello world"])
    np.testing.assert_allclose(out2[0], out2[1], rtol=1e-5)
    assert np.abs(out[0] - out[1]).max() > 1e-3


def test_embedder_rerank_cosine(bert_model):
    _, model = bert_model
    emb = Embedder(model)
    scores, _ = emb.rerank("hello world", ["hello world", "entirely different"])
    assert len(scores) == 2
    assert scores[0] > scores[1]  # identical text must score highest


def test_server_embeddings_and_rerank(bert_model, tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    from superllama_tpu.server.http import Server, ServerApp

    _, embed_model = bert_model
    cfg = LlamaConfig(vocab_size=32000, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=1, max_position_embeddings=64,
                      architectures=["LlamaForCausalLM"], tie_word_embeddings=False)
    hf = LlamaForCausalLM(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tok_fields = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    mpath = tmp_path / "m.gguf"
    convert_state_dict(str(mpath), cfg, sd, GGMLType.F32, tokenizer_fields=tok_fields)
    app = ServerApp(load_model(str(mpath)), n_slots=1, n_ctx=64,
                    kv_dtype=np.float32, embed_model=embed_model)
    srv = Server(app, port=0)
    srv.start()
    try:
        def req(path, body):
            r = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            return json.loads(urllib.request.urlopen(r, timeout=120).read())

        out = req("/v1/embeddings", {"input": ["alpha beta", "gamma"]})
        assert len(out["data"]) == 2
        assert len(out["data"][0]["embedding"]) == 64
        assert out["usage"]["prompt_tokens"] > 0

        out = req("/rerank", {"query": "alpha beta",
                              "documents": ["alpha beta", "unrelated words here"],
                              "return_documents": True})
        assert out["results"][0]["index"] == 0
        assert out["results"][0]["document"]["text"] == "alpha beta"
    finally:
        srv.stop()


def test_roberta_hidden_parity(tmp_path):
    """RobertaModel rides the bert graph; HF position ids start at
    pad_token_id+1 — the converter slices those rows off the position table
    (convert_hf_to_gguf XLMRobertaModel._position_offset counterpart)."""
    import jax.numpy as jnp
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(41)
    cfg = RobertaConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, pad_token_id=1, type_vocab_size=1,
        architectures=["XLMRobertaModel"],
    )
    hf = RobertaModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "roberta.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    rng = np.random.default_rng(2)
    ids = rng.integers(5, 290, size=(2, 10)).astype(np.int64)  # avoids pad=1
    mask = np.ones((2, 10), np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()
    got = np.asarray(bert_forward(model.params, model.hparams,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32)), np.float32)
    assert np.abs(got - ref).max() < 2e-4


def test_distilbert_hidden_parity(tmp_path):
    """DistilBertModel → bert graph without token types
    (convert_hf_to_gguf DistilBertModel counterpart)."""
    import jax.numpy as jnp
    from transformers import DistilBertConfig, DistilBertModel

    torch.manual_seed(42)
    cfg = DistilBertConfig(
        vocab_size=300, dim=64, n_layers=2, n_heads=4, hidden_dim=128,
        max_position_embeddings=128, architectures=["DistilBertModel"],
    )
    hf = DistilBertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "distilbert.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    rng = np.random.default_rng(3)
    ids = rng.integers(5, 290, size=(1, 9)).astype(np.int64)
    mask = np.ones((1, 9), np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()
    got = np.asarray(bert_forward(model.params, model.hparams,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32)), np.float32)
    assert np.abs(got - ref).max() < 2e-4


def test_modernbert_hidden_parity(tmp_path):
    """ModernBERT → modern-bert graph: fused Wqkv, GEGLU, alternating
    global/local (HF global at il % n == 0 — converter writes the explicit
    per-layer array; the reference's scalar pattern flags il % n == n-1)."""
    import jax.numpy as jnp
    from transformers import ModernBertConfig, ModernBertModel

    torch.manual_seed(43)
    cfg = ModernBertConfig(
        vocab_size=300, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64, pad_token_id=0,
        global_attn_every_n_layers=2, local_attention=8,
        max_position_embeddings=128, global_rope_theta=160000.0,
        local_rope_theta=10000.0, architectures=["ModernBertModel"],
        attn_implementation="eager", reference_compile=False,
    )
    hf = ModernBertModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "modernbert.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    hp = model.hparams
    assert [hp.is_swa_layer(i) for i in range(4)] == [False, True] * 2
    rng = np.random.default_rng(4)
    ids = rng.integers(5, 290, size=(1, 12)).astype(np.int64)
    mask = np.ones((1, 12), np.int64)
    with torch.no_grad():
        ref = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)
                 ).last_hidden_state.numpy()
    got = np.asarray(bert_forward(model.params, model.hparams,
                                  jnp.asarray(ids, jnp.int32),
                                  jnp.asarray(mask, jnp.int32)), np.float32)
    assert np.abs(got - ref).max() < 2e-4
