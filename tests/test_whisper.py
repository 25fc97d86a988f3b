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
