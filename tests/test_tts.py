"""TTS pipeline: WavTokenizer decoder + embd_to_audio ISTFT + WAV writer
(tools/tts/tts.cpp + src/models/wavtokenizer-dec.cpp counterparts)."""

import struct
import wave

import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.hparams import HParams
from superllama_tpu.models.wavtokenizer import wavtokenizer_decode
from superllama_tpu.tools.tts import (
    embd_to_audio,
    extract_codes,
    hann_window,
    process_text,
    save_wav,
)

FEAT, PE, CE, NFF, V = 12, 16, 16, 32, 64  # features, posnet E, convnext E


def _oracle_embd_to_audio(embd, n_fft, n_hop):
    """Direct transcription of tts.cpp:201-280 scalar loops."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    hann = np.array([0.5 * (1 - np.cos(2 * np.pi * i / n_fft))
                     for i in range(n_fft)], np.float32)
    frames = np.zeros((n_codes, n_fft), np.float32)
    for l in range(n_codes):
        spec = np.zeros(half, np.complex128)
        for k in range(half):
            mag = min(np.exp(embd[l, k]), 1e2)
            phi = embd[l, k + half]
            spec[k] = mag * (np.cos(phi) + 1j * np.sin(phi))
        for k in range(n_fft):
            acc = 0.0
            for m in range(half):
                tw = np.exp(2j * np.pi * k * m / n_fft)
                acc += (spec[m] * tw).real
            frames[l, k] = acc / half
    frames *= hann
    n_pad = (n_fft - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_fft
    audio = np.zeros(n_out, np.float32)
    env = np.zeros(n_out, np.float32)
    for l in range(n_codes):
        for j in range(n_fft):
            w = l * n_hop - n_pad + j
            if 0 <= w < n_out:
                audio[w] += frames[l, j]
                env[w] += hann[j] * hann[j]
    audio = audio[: n_out - 2 * n_pad]
    env = env[: n_out - 2 * n_pad]
    return audio / np.maximum(env, 1e-8)


def test_embd_to_audio_vs_oracle():
    rng = np.random.default_rng(0)
    n_fft, n_hop = 16, 4
    embd = rng.normal(0, 0.5, (5, 2 * (n_fft // 2 + 1))).astype(np.float32)
    got = embd_to_audio(embd, n_fft=n_fft, n_hop=n_hop)
    ref = _oracle_embd_to_audio(embd, n_fft, n_hop)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_hann_periodic():
    h = hann_window(8)
    np.testing.assert_allclose(h[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(h[4], 1.0, atol=1e-7)


def test_save_wav(tmp_path):
    path = tmp_path / "t.wav"
    audio = np.sin(np.linspace(0, 40 * np.pi, 2400)).astype(np.float32)
    save_wav(str(path), audio)
    with wave.open(str(path)) as w:
        assert w.getframerate() == 24000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 2400


def test_process_text_and_codes():
    assert process_text("Hello, World! 123") == "hello<|text_sep|>world<|text_sep|>123"
    toks = [5, 151671, 151672, 151675, 155767, 155768, 9]
    assert extract_codes(toks) == [0, 3, 4095]


def _wav_params():
    rng = np.random.default_rng(7)
    r = lambda *s: jnp.asarray(rng.normal(0, 0.2, s).astype(np.float32))
    resnet = lambda: {
        "norm1_w": jnp.ones((PE, 1)), "norm1_b": jnp.zeros((PE, 1)),
        "conv1": r(PE, PE, 3), "conv1_b": r(PE, 1),
        "norm2_w": jnp.ones((PE, 1)), "norm2_b": jnp.zeros((PE, 1)),
        "conv2": r(PE, PE, 3), "conv2_b": r(PE, 1),
    }
    attn = {
        "attn_norm_w": jnp.ones((PE, 1)), "attn_norm_b": jnp.zeros((PE, 1)),
        "attn_q": r(PE, PE, 1), "attn_q_b": r(PE, 1),
        "attn_k": r(PE, PE, 1), "attn_k_b": r(PE, 1),
        "attn_v": r(PE, PE, 1), "attn_v_b": r(PE, 1),
        "attn_o": r(PE, PE, 1), "attn_o_b": r(PE, 1),
    }
    final = {"norm_w": jnp.ones((PE, 1)), "norm_b": jnp.zeros((PE, 1))}
    convnext = lambda: {
        "dw": r(CE, 1, 7), "dw_b": r(CE, 1),
        "norm": jnp.ones(CE), "norm_b": jnp.zeros(CE),
        "pw1": r(CE, NFF), "pw1_b": r(NFF),
        "pw2": r(NFF, CE), "pw2_b": r(CE),
        "gamma": jnp.full(CE, 0.9),
    }
    n_out = 2 * (16 // 2 + 1)  # tiny n_fft=16 head
    return {
        "token_embd": r(V, FEAT),
        "conv1d": r(PE, FEAT, 7), "conv1d_b": r(PE, 1),
        "token_embd_norm": jnp.ones(PE), "token_embd_norm_b": jnp.zeros(PE),
        "output_norm": jnp.ones(CE), "output_norm_b": jnp.zeros(CE),
        "output": r(CE, n_out), "output_b": r(n_out),
        "posnet": [resnet(), resnet(), attn, resnet(), resnet(), final],
        "convnext": [convnext(), convnext()],
    }


def test_wavtokenizer_decode_and_pipeline(tmp_path):
    hp = HParams(arch="wavtokenizer-dec", n_vocab=V, n_ctx_train=0,
                 n_embd=CE, n_layer=0, n_head=1, n_head_kv=1, n_ff=NFF,
                 n_rot=0, head_dim=0, head_dim_v=0, n_embd_features=FEAT,
                 posnet_n_embd=PE, posnet_n_layer=6, convnext_n_embd=CE,
                 convnext_n_layer=2, n_norm_groups=4, f_norm_group_eps=1e-6)
    params = _wav_params()
    codes = jnp.asarray([[1, 5, 9, 20, 33, 2, 7, 40]], jnp.int32)
    embd = wavtokenizer_decode(params, hp, codes)
    assert embd.shape == (1, 8, 2 * (16 // 2 + 1))
    assert np.isfinite(np.asarray(embd)).all()
    audio = embd_to_audio(np.asarray(embd[0]), n_fft=16, n_hop=4)
    assert audio.size == 7 * 4 + 16 - 2 * 6
    assert np.isfinite(audio).all()
    save_wav(str(tmp_path / "o.wav"), audio)


def test_wavtokenizer_gguf_roundtrip(tmp_path):
    """Save synthetic wavtokenizer GGUF → load_model → decode (loader +
    hparams wiring)."""
    from superllama_tpu.gguf import GGMLType, GGUFWriter
    from superllama_tpu.models import load_model

    params = _wav_params()
    w = GGUFWriter(str(tmp_path / "wt.gguf"), arch="wavtokenizer-dec")
    a = "wavtokenizer-dec"
    for k, v in {
        f"{a}.embedding_length": CE, f"{a}.features_length": FEAT,
        f"{a}.posnet.embedding_length": PE, f"{a}.posnet.block_count": 6,
        f"{a}.convnext.embedding_length": CE, f"{a}.convnext.block_count": 2,
        f"{a}.attention.group_norm_groups": 4,
        f"{a}.attention.group_norm_epsilon": 1e-6,
        f"{a}.feed_forward_length": NFF, f"{a}.vocab_size": V,
        f"{a}.attention.layer_norm_epsilon": 1e-5,
    }.items():
        w.add(k, v)

    def put(name, arr, transpose=False):
        x = np.asarray(arr, np.float32)
        if transpose and x.ndim == 2:
            x = x.T
        w.add_tensor(name, x, GGMLType.F32)

    put("token_embd.weight", params["token_embd"])
    put("conv1d.weight", params["conv1d"])
    put("conv1d.bias", params["conv1d_b"])
    put("token_embd_norm.weight", params["token_embd_norm"])
    put("token_embd_norm.bias", params["token_embd_norm_b"])
    put("output_norm.weight", params["output_norm"])
    put("output_norm.bias", params["output_norm_b"])
    put("output.weight", params["output"], transpose=True)
    put("output.bias", params["output_b"])
    pos_names = [
        ("norm1_w", "norm1.weight"), ("norm1_b", "norm1.bias"),
        ("conv1", "conv1.weight"), ("conv1_b", "conv1.bias"),
        ("norm2_w", "norm2.weight"), ("norm2_b", "norm2.bias"),
        ("conv2", "conv2.weight"), ("conv2_b", "conv2.bias"),
        ("attn_norm_w", "attn_norm.weight"), ("attn_norm_b", "attn_norm.bias"),
        ("attn_q", "attn_q.weight"), ("attn_q_b", "attn_q.bias"),
        ("attn_k", "attn_k.weight"), ("attn_k_b", "attn_k.bias"),
        ("attn_v", "attn_v.weight"), ("attn_v_b", "attn_v.bias"),
        ("attn_o", "attn_output.weight"), ("attn_o_b", "attn_output.bias"),
        ("norm_w", "norm.weight"), ("norm_b", "norm.bias"),
    ]
    for il, layer in enumerate(params["posnet"]):
        for key, gname in pos_names:
            if key in layer:
                put(f"posnet.{il}.{gname}", layer[key])
    cn_names = [("dw", "dw.weight", False), ("dw_b", "dw.bias", False),
                ("norm", "norm.weight", False), ("norm_b", "norm.bias", False),
                ("pw1", "pw1.weight", True), ("pw1_b", "pw1.bias", False),
                ("pw2", "pw2.weight", True), ("pw2_b", "pw2.bias", False),
                ("gamma", "gamma.weight", False)]
    for il, layer in enumerate(params["convnext"]):
        for key, gname, tr in cn_names:
            put(f"convnext.{il}.{gname}", layer[key], transpose=tr)
    w.write()

    model = load_model(str(tmp_path / "wt.gguf"))
    codes = jnp.asarray([[3, 8, 1, 60]], jnp.int32)
    got = wavtokenizer_decode(model.params, model.hparams, codes)
    ref = wavtokenizer_decode(
        params,
        HParams(arch="wavtokenizer-dec", n_vocab=V, n_ctx_train=0, n_embd=CE,
                n_layer=0, n_head=1, n_head_kv=1, n_ff=NFF, n_rot=0,
                head_dim=0, head_dim_v=0, n_embd_features=FEAT,
                posnet_n_embd=PE, posnet_n_layer=6, convnext_n_embd=CE,
                convnext_n_layer=2, n_norm_groups=4, f_norm_group_eps=1e-6),
        codes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
