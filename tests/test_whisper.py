"""Whisper audio encoder parity (mtmd whisper-enc.cpp counterpart) vs HF
transformers: mel frontend vs WhisperFeatureExtractor, encoder vs
WhisperModel.encoder."""

import numpy as np
import pytest
import torch

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.models.whisper import (log_mel_spectrogram,
                                           mel_filter_bank,
                                           params_from_hf_state_dict,
                                           whisper_encoder)

torch.manual_seed(41)


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_bank

    ref = hf_bank(num_frequency_bins=201, num_mel_filters=80,
                  min_frequency=0.0, max_frequency=8000.0,
                  sampling_rate=16000, norm="slaney", mel_scale="slaney")
    got = mel_filter_bank()
    np.testing.assert_allclose(got, ref.T, rtol=1e-4, atol=1e-6)


def test_log_mel_matches_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (0.1 * np.sin(np.arange(32000) * 0.03)
             + 0.02 * rng.normal(size=32000)).astype(np.float32)
    ref = fe(audio, sampling_rate=16000, return_tensors="np",
             padding="max_length").input_features[0]
    got = log_mel_spectrogram(audio)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_encoder_parity_vs_hf():
    from transformers import WhisperConfig, WhisperModel

    cfg = WhisperConfig(
        vocab_size=128, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=1, decoder_attention_heads=4, encoder_ffn_dim=128,
        decoder_ffn_dim=128, num_mel_bins=80, max_source_positions=150,
        max_target_positions=64, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1,
    )
    hf = WhisperModel(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_state_dict(sd, n_head=4)
    assert len(params["layers"]) == 2

    rng = np.random.default_rng(1)
    mel = rng.normal(0, 1, (1, 80, 300)).astype(np.float32)
    with torch.no_grad():
        ref = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    got = np.asarray(whisper_encoder(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(mel)))
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 2e-4, err


def test_ultravox_projector_formula():
    from superllama_tpu.models.whisper import audio_project_ultravox

    rng = np.random.default_rng(3)
    d, k, dm, dt = 16, 4, 24, 32
    proj = {
        "stack_factor": k,
        "norm_pre": jnp.asarray(rng.normal(1, 0.1, (d * k,)), jnp.float32),
        "norm_mid": jnp.asarray(rng.normal(1, 0.1, (dm // 2,)), jnp.float32),
        "mm_1": jnp.asarray(rng.normal(0, 0.1, (d * k, dm)), jnp.float32),
        "mm_2": jnp.asarray(rng.normal(0, 0.1, (dm // 2, dt)), jnp.float32),
    }
    x = jnp.asarray(rng.normal(0, 1, (1, 7, d)), jnp.float32)  # T=7 pads to 8
    out = np.asarray(audio_project_ultravox(proj, x))
    assert out.shape == (1, 2, dt)

    # numpy reference of the exact formula
    xr = np.zeros((8, d), np.float32)
    xr[:7] = np.asarray(x[0])
    s = xr.reshape(2, k * d)
    s = s / np.sqrt((s ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(proj["norm_pre"])
    s = s @ np.asarray(proj["mm_1"])
    h1, h2 = np.split(s, 2, axis=-1)
    s = h1 * (h2 / (1 + np.exp(-h2)))
    s = s / np.sqrt((s ** 2).mean(-1, keepdims=True) + 1e-6) * np.asarray(proj["norm_mid"])
    ref = s @ np.asarray(proj["mm_2"])
    np.testing.assert_allclose(out[0], ref, rtol=2e-5, atol=2e-5)


def test_audio_mmproj_roundtrip_and_prefill(tmp_path):
    """Write an ultravox-style audio mmproj GGUF from HF whisper weights,
    load it back, and run an audio-conditioned prefill on a tiny llama."""
    from transformers import LlamaConfig, LlamaForCausalLM, WhisperConfig, WhisperModel

    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.models import load_model
    from superllama_tpu.models.whisper import write_audio_mmproj
    from superllama_tpu.tools.convert_hf import convert_state_dict
    from superllama_tpu.tools.mtmd import AudioMultimodal

    wcfg = WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2, encoder_ffn_dim=64,
        decoder_ffn_dim=64, num_mel_bins=80, max_source_positions=120,
        max_target_positions=32, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1)
    wsd = {k: v.detach().numpy() for k, v in WhisperModel(wcfg).eval().state_dict().items()}
    rng = np.random.default_rng(5)
    E_txt = 48
    proj = {
        "norm_pre": rng.normal(1, 0.05, (32 * 8,)).astype(np.float32),
        "norm_mid": rng.normal(1, 0.05, (32,)).astype(np.float32),
        "mm_1": rng.normal(0, 0.05, (64, 32 * 8)).astype(np.float32),  # (out=2*mid, in)
        "mm_2": rng.normal(0, 0.05, (E_txt, 32)).astype(np.float32),
    }
    mmp = tmp_path / "audio_mmproj.gguf"
    write_audio_mmproj(str(mmp), wsd, n_head=2, projector=proj)

    lcfg = LlamaConfig(vocab_size=64, hidden_size=E_txt, intermediate_size=64,
                       num_hidden_layers=1, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=512,
                       architectures=["LlamaForCausalLM"],
                       tie_word_embeddings=False)
    lsd = {k: v.detach().numpy() for k, v in LlamaForCausalLM(lcfg).eval().state_dict().items()}
    mpath = tmp_path / "llm.gguf"
    convert_state_dict(str(mpath), lcfg, lsd, GGMLType.F32)
    model = load_model(str(mpath))

    am = AudioMultimodal(model, str(mmp))
    audio = (0.1 * np.sin(np.arange(16000) * 0.02)).astype(np.float32)
    logits, cache, n_past = am.prefill([1, 5, 9], audio, n_ctx=256)
    assert logits.shape[1] == n_past and n_past > 3
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_audio_projector_glma_and_music_flamingo():
    """GLMA (LN → stack → GELU MLP → BOI/EOI) and music_flamingo (biased
    GELU MLP) projector branches (whisper-enc.cpp:88-105)."""
    import jax.numpy as jnp

    from superllama_tpu.models.whisper import audio_project

    rng = np.random.default_rng(3)
    D, E = 16, 12
    x = jnp.asarray(rng.normal(0, 1, (1, 8, D)), jnp.float32)

    mf = {"type": "music_flamingo",
          "mm_1": jnp.asarray(rng.normal(0, .3, (D, E)), jnp.float32),
          "mm_1_b": jnp.asarray(rng.normal(0, .1, E), jnp.float32),
          "mm_2": jnp.asarray(rng.normal(0, .3, (E, E)), jnp.float32),
          "mm_2_b": jnp.asarray(rng.normal(0, .1, E), jnp.float32)}
    out = np.asarray(audio_project(mf, x))
    assert out.shape == (1, 8, E)
    # replay
    import math
    ge = lambda v: 0.5 * v * (1 + np.vectorize(math.erf)(v / np.sqrt(2)))
    h = ge(np.asarray(x)[0] @ np.asarray(mf["mm_1"]) + np.asarray(mf["mm_1_b"]))
    ref = h @ np.asarray(mf["mm_2"]) + np.asarray(mf["mm_2_b"])
    np.testing.assert_allclose(out[0], ref, rtol=2e-4, atol=2e-5)

    gl = {"type": "glma", "stack_factor": 2,
          "norm_pre": jnp.ones(D), "norm_pre_b": jnp.zeros(D),
          "mm_1": jnp.asarray(rng.normal(0, .3, (2 * D, E)), jnp.float32),
          "mm_1_b": jnp.zeros(E),
          "mm_2": jnp.asarray(rng.normal(0, .3, (E, E)), jnp.float32),
          "mm_2_b": jnp.zeros(E),
          "boi": jnp.asarray(rng.normal(0, 1, E), jnp.float32),
          "eoi": jnp.asarray(rng.normal(0, 1, E), jnp.float32)}
    out = np.asarray(audio_project(gl, x))
    assert out.shape == (1, 1 + 4 + 1, E)        # stacked halves + BOI/EOI
    np.testing.assert_allclose(out[0, 0], np.asarray(gl["boi"]), rtol=1e-6)
    np.testing.assert_allclose(out[0, -1], np.asarray(gl["eoi"]), rtol=1e-6)
