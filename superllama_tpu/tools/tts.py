"""Text-to-speech pipeline (OuteTTS voice LM + WavTokenizer decoder).

Behavioral reference: tools/tts/tts.cpp — prompt formatting (:436,676-693),
audio-code extraction (generated ids ≥ code offset 151672), then
embd_to_audio (:201-280): per-frame mag∥phase spectrum → reference-style
inverse DFT (out[k] = Re Σ X_m e^{i2πkm/n} / N, :133-163) → hann-windowed
overlap-add fold (:176-199) with envelope normalization → 24 kHz mono WAV.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

N_FFT = 1280
N_HOP = 320
SAMPLE_RATE = 24000
CODE_OFFSET = 151672  # OuteTTS audio-code vocab base (tts.cpp:753 region)


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    off = 0 if periodic else -1
    i = np.arange(n)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (n + off)))).astype(np.float32)


def embd_to_audio(embd: np.ndarray, n_fft: int = N_FFT,
                  n_hop: int = N_HOP) -> np.ndarray:
    """(n_codes, n_embd) mag∥phase frames → mono float32 audio."""
    embd = np.asarray(embd, np.float32)
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    assert half == n_fft // 2 + 1, (half, n_fft)

    mag = np.exp(embd[:, :half])
    mag = np.minimum(mag, 1e2)                     # clamp (tts.cpp:235)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # (n_codes, half)

    # reference irfft: out[k] = Re(Σ_m X_m e^{+i2πkm/n}) / N  — no hermitian
    # doubling; equals n·ifft(zero-padded X).real / N
    pad = np.zeros((n_codes, n_fft - half), np.complex64)
    frames = (n_fft * np.fft.ifft(np.concatenate([spec, pad], axis=1),
                                  axis=1).real / half).astype(np.float32)

    hann = hann_window(n_fft)
    frames *= hann
    n_pad = (n_fft - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_fft

    audio = np.zeros(n_out, np.float32)
    env = np.zeros(n_out, np.float32)
    h2 = hann * hann
    for l in range(n_codes):  # overlap-add fold (offset −pad, trimmed below)
        start = l * n_hop - n_pad
        lo = max(0, -start)
        hi = min(n_fft, n_out - start)
        audio[start + lo:start + hi] += frames[l, lo:hi]
        env[start + lo:start + hi] += h2[lo:hi]
    audio = audio[: n_out - 2 * n_pad]
    env = env[: n_out - 2 * n_pad]
    return audio / np.maximum(env, 1e-8)


def save_wav(path: str, audio: np.ndarray, sample_rate: int = SAMPLE_RATE):
    """16-bit PCM mono WAV (tts.cpp save_wav16 counterpart)."""
    pcm = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    data = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                            sample_rate * 2, 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def process_text(text: str) -> str:
    """OuteTTS text preprocessing (tts.cpp process_text): lowercase, strip
    non-alphanumerics, collapse whitespace, join with <|text_sep|>."""
    import re

    t = text.lower()
    t = re.sub(r"[-_/,\.\\]", " ", t)
    t = re.sub(r"[^a-z0-9 ]", "", t)
    t = re.sub(r"\s+", " ", t).strip()
    return "<|text_sep|>".join(t.split(" "))


def extract_codes(tokens: list[int], code_offset: int = CODE_OFFSET,
                  n_codebook: int = 4096) -> list[int]:
    """Generated LM ids → wavtokenizer codebook indices."""
    return [t - code_offset for t in tokens
            if code_offset <= t < code_offset + n_codebook]


def tts_generate(ttc_model, cts_model, text: str, n_predict: int = 1024,
                 greedy: bool = True, seed: int = 0) -> np.ndarray:
    """Full pipeline: voice LM → audio codes → wavtokenizer → audio."""
    from ..models.wavtokenizer import wavtokenizer_decode
    from ..runtime.context import Context

    tok = ttc_model.tokenizer
    prompt = ("<|im_start|>\n<|text_start|>" + process_text(text)
              + "<|text_end|>\n<|audio_start|>\n")
    ids = tok.encode(prompt, add_special=True, parse_special=True)
    ctx = Context(ttc_model, n_ctx=len(ids) + n_predict + 8)
    out = ctx.greedy_generate(ids, n_predict)
    codes = extract_codes(out[len(ids):])
    if not codes:
        return np.zeros(0, np.float32)
    embd = wavtokenizer_decode(
        cts_model.params, cts_model.hparams,
        jnp.asarray([codes], jnp.int32))
    return embd_to_audio(np.asarray(embd[0], np.float32))
