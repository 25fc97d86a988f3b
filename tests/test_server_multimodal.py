"""Server-side multimodal (VERDICT r4 item 5): image_url content parts on
/v1/chat/completions run through the mmproj tower and reach the Engine as
embedding-prefix requests — the reference's tools/mtmd + server vision path
(mtmd.cpp chunk injection, tools/server vision tests)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from superllama_tpu.gguf import GGMLType, GGUFReader
from superllama_tpu.models import load_model
from superllama_tpu.models.clip import convert_clip_vision
from superllama_tpu.server.http import Server, ServerApp
from superllama_tpu.tools.convert_hf import convert_state_dict
from superllama_tpu.tools.mtmd import build_embed_prompt, decode_image


@pytest.fixture(scope="module")
def mm_server(tmp_path_factory):
    from transformers import CLIPVisionConfig, LlamaConfig, LlamaForCausalLM

    tmp = tmp_path_factory.mktemp("mm")
    txt = LlamaConfig(
        vocab_size=32000, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, architectures=["LlamaForCausalLM"],
        tie_word_embeddings=False)
    torch.manual_seed(0)
    lm = LlamaForCausalLM(txt).eval()
    sd = {k: v.detach().numpy() for k, v in lm.state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tokf = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    lm_path = tmp / "lm.gguf"
    convert_state_dict(str(lm_path), txt, sd, GGMLType.F32,
                       tokenizer_fields=tokf)

    vis = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)
    from transformers import CLIPVisionModel

    vt = CLIPVisionModel(vis).eval()
    vt_sd = {k: v.detach().numpy() for k, v in vt.state_dict().items()}
    mm_path = tmp / "mmproj.gguf"
    convert_clip_vision(str(mm_path), vis, vt_sd, proj_out=48)

    model = load_model(str(lm_path))
    app = ServerApp(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                    mmproj_path=str(mm_path))
    srv = Server(app, port=0)
    srv.start()
    yield srv, app
    srv.stop()


def _png_data_url(seed=0, size=16) -> tuple[str, bytes]:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    raw = buf.getvalue()
    return "data:image/png;base64," + base64.b64encode(raw).decode(), raw


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", json.dumps(body).encode(),
        {"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req, timeout=600).read())


def test_chat_image_roundtrip_matches_offline(mm_server):
    """Server reply == offline mtmd pipeline + solo greedy decode."""
    srv, app = mm_server
    url, raw = _png_data_url(seed=1)
    messages = [{"role": "user", "content": [
        {"type": "text", "text": "Describe this:"},
        {"type": "image_url", "image_url": {"url": url}},
    ]}]
    out = _post(srv.port, "/v1/chat/completions",
                {"messages": messages, "max_tokens": 6, "temperature": 0})
    text = out["choices"][0]["message"]["content"]
    assert out["usage"]["completion_tokens"] == 6

    # offline reference: same marker prompt → embed pair → scratch Engine
    from superllama_tpu.runtime.engine import Engine, GenRequest
    from superllama_tpu.tools.mtmd import MEDIA_MARKER

    msg2 = [{"role": "user", "content": f"Describe this:{MEDIA_MARKER}"}]
    prompt = app.chat_template.apply(msg2, add_generation_prompt=True)
    size = app.mtmd.clip["hp"]["image_size"]
    ids, embeds = build_embed_prompt(app.mtmd, app.model.tokenizer, prompt,
                                     [decode_image(raw, size)])
    eng = Engine(app.model, n_slots=1, n_ctx=256, kv_dtype=np.float32,
                 prefill_buckets=(16, 64))
    ref = eng.generate(ids, prompt_embeds=embeds, max_tokens=6,
                       stop_eog=False, sampling={"greedy": True})
    tok = app.model.tokenizer
    ref_text = "".join(
        tok.token_to_piece(t).decode("utf-8", "replace") for t in ref["tokens"])
    assert text == ref_text


def test_image_changes_output(mm_server):
    srv, app = mm_server
    outs = []
    for seed in (3, 4):
        url, _ = _png_data_url(seed=seed)
        messages = [{"role": "user", "content": [
            {"type": "text", "text": "What is this?"},
            {"type": "image_url", "image_url": {"url": url}},
        ]}]
        out = _post(srv.port, "/v1/chat/completions",
                    {"messages": messages, "max_tokens": 8,
                     "temperature": 0})
        outs.append(out["choices"][0]["message"]["content"])
    # an untrained model still must CONDITION on the pixels
    assert outs[0] != outs[1]


def test_text_only_chat_still_works(mm_server):
    srv, app = mm_server
    out = _post(srv.port, "/v1/chat/completions",
                {"messages": [{"role": "user", "content": "hi"}],
                 "max_tokens": 4, "temperature": 0})
    assert out["usage"]["completion_tokens"] >= 1


def test_concurrent_image_and_text(mm_server):
    """A vision request and a text request served concurrently (the engine
    mixes embed-prefix scratch prefill with normal slots)."""
    srv, app = mm_server
    url, _ = _png_data_url(seed=5)
    results = {}

    def vision():
        results["v"] = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": url}},
                {"type": "text", "text": "caption"}]}],
            "max_tokens": 5, "temperature": 0})

    def text():
        results["t"] = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 5, "temperature": 0})

    ts = [threading.Thread(target=vision), threading.Thread(target=text)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert results["v"]["usage"]["completion_tokens"] == 5
    assert results["t"]["usage"]["completion_tokens"] == 5


def test_remote_url_rejected(mm_server):
    srv, app = mm_server
    with pytest.raises(urllib.error.HTTPError):
        _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "http://example.com/x.png"}}]}],
            "max_tokens": 4})


def test_chat_audio_input(tmp_path):
    """input_audio content parts (OpenAI audio format): base64 WAV through
    the whisper/ultravox tower into an embedding-prefix request."""
    import wave

    from transformers import (LlamaConfig, LlamaForCausalLM, WhisperConfig,
                              WhisperModel)

    from superllama_tpu.models.whisper import write_audio_mmproj

    wcfg = WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=1,
        encoder_attention_heads=2, decoder_layers=1,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_mel_bins=80, max_source_positions=120, max_target_positions=32,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    torch.manual_seed(0)
    wsd = {k: v.detach().numpy()
           for k, v in WhisperModel(wcfg).eval().state_dict().items()}
    rng = np.random.default_rng(6)
    E_txt = 48
    proj = {
        "norm_pre": rng.normal(1, 0.05, (32 * 8,)).astype(np.float32),
        "norm_mid": rng.normal(1, 0.05, (32,)).astype(np.float32),
        "mm_1": rng.normal(0, 0.05, (64, 32 * 8)).astype(np.float32),
        "mm_2": rng.normal(0, 0.05, (E_txt, 32)).astype(np.float32),
    }
    mmp = tmp_path / "audio_mmproj.gguf"
    write_audio_mmproj(str(mmp), wsd, n_head=2, projector=proj)

    lcfg = LlamaConfig(vocab_size=32000, hidden_size=E_txt,
                       intermediate_size=64, num_hidden_layers=1,
                       num_attention_heads=4, num_key_value_heads=2,
                       max_position_embeddings=512,
                       architectures=["LlamaForCausalLM"],
                       tie_word_embeddings=False)
    lsd = {k: v.detach().numpy()
           for k, v in LlamaForCausalLM(lcfg).eval().state_dict().items()}
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    tokf = {k: v for k, v in r.metadata.items()
            if k.startswith("tokenizer.")}
    r.close()
    mpath = tmp_path / "llm.gguf"
    convert_state_dict(str(mpath), lcfg, lsd, GGMLType.F32,
                       tokenizer_fields=tokf)
    model = load_model(str(mpath))

    app = ServerApp(model, n_slots=2, n_ctx=256, kv_dtype=np.float32,
                    mmproj_path=str(mmp))
    assert app.mtmd_audio is not None and app.mtmd is None
    srv = Server(app, port=0)
    srv.start()
    try:
        # 0.5 s 16 kHz sine as 16-bit PCM wav
        samples = (0.2 * np.sin(np.arange(8000) * 0.05) * 32767).astype(
            np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(samples.tobytes())
        b64 = base64.b64encode(buf.getvalue()).decode()
        out = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "Transcribe:"},
                {"type": "input_audio",
                 "input_audio": {"data": b64, "format": "wav"}}]}],
            "max_tokens": 5, "temperature": 0})
        assert out["usage"]["completion_tokens"] == 5
        assert out["usage"]["prompt_tokens"] > 10   # audio chunk included
    finally:
        srv.stop()
