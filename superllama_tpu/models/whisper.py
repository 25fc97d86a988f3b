"""Whisper-style audio encoder (tools/mtmd/models/whisper-enc.cpp
counterpart): log-mel frontend + conv downsampling + transformer encoder.
Feeds audio tokens into the mtmd injection path the way the vision tower
feeds image tokens (ultravox-style audio input).

Parity-tested against transformers' WhisperModel encoder.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80


def _hz_to_mel(f):
    """Slaney mel scale (librosa/HF default for Whisper filters)."""
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                   * (27.0 / np.log(6.4)), mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
    return f


def mel_filter_bank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                    sr: int = SAMPLE_RATE) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) slaney-normalized triangular filters."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0),
                                     n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)                      # slaney norm
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = N_MELS,
                        pad_to: int | None = 3000) -> np.ndarray:
    """Whisper's log-mel features: hann STFT (400/160), slaney mel bank,
    log10, dynamic-range clamp, (x+4)/4 — matches WhisperFeatureExtractor.
    Returns (n_mels, T_frames)."""
    audio = np.asarray(audio, np.float32)
    if pad_to is not None:
        want = pad_to * HOP_LENGTH
        audio = np.pad(audio[:want], (0, max(0, want - audio.size)))
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    frames = []
    padded = np.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (padded.size - N_FFT) // HOP_LENGTH
    idx = np.arange(N_FFT)[None, :] + HOP_LENGTH * np.arange(n_frames)[:, None]
    stft = np.fft.rfft(padded[idx] * window[None, :], axis=1)
    power = (np.abs(stft[:-1]) ** 2).T                 # drop last frame (HF)
    mel = mel_filter_bank(n_mels) @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x (B, C_in, T) * w (C_out, C_in, K) + b, 'same'-style pad 1."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + b[None, :, None]


def whisper_encoder(params: dict, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T) → hidden states (B, T//2, d)."""
    x = ops.gelu(_conv1d(mel, params["conv1_w"], params["conv1_b"], 1))
    x = ops.gelu(_conv1d(x, params["conv2_w"], params["conv2_b"], 2))
    x = x.transpose(0, 2, 1)                           # (B, T/2, d)
    x = x + params["pos_embd"][None, : x.shape[1]]
    for layer in params["layers"]:
        h = ops.layer_norm(x, layer["attn_ln_w"], layer["attn_ln_b"])
        B, T, D = h.shape
        nh = layer["n_head"]
        hd = D // nh
        q = (h @ layer["wq"] + layer["bq"]).reshape(B, T, nh, hd)
        k = (h @ layer["wk"]).reshape(B, T, nh, hd)    # whisper k has no bias
        v = (h @ layer["wv"] + layer["bv"]).reshape(B, T, nh, hd)
        qf = q.transpose(0, 2, 1, 3).astype(jnp.float32)
        kf = k.transpose(0, 2, 1, 3).astype(jnp.float32)
        vf = v.transpose(0, 2, 1, 3).astype(jnp.float32)
        logits = jnp.einsum("bhtd,bhsd->bhts", qf, kf) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1)        # bidirectional: no mask
        attn = jnp.einsum("bhts,bhsd->bhtd", probs, vf)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, D).astype(x.dtype)
        x = x + (attn @ layer["wo"] + layer["bo"])
        h = ops.layer_norm(x, layer["mlp_ln_w"], layer["mlp_ln_b"])
        h = ops.gelu_erf(h @ layer["fc1"] + layer["fc1_b"])
        x = x + (h @ layer["fc2"] + layer["fc2_b"])
    return ops.layer_norm(x, params["ln_post_w"], params["ln_post_b"])


def params_from_hf_state_dict(sd: dict, n_head: int) -> dict:
    """Map a transformers WhisperModel (or WhisperEncoder) state dict."""
    g = lambda k: np.asarray(sd[k], np.float32)

    def pick(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], np.float32)
        raise KeyError(names[0])

    pre = "model.encoder." if "model.encoder.conv1.weight" in sd else "encoder."
    params = {
        "conv1_w": pick(pre + "conv1.weight"),
        "conv1_b": pick(pre + "conv1.bias"),
        "conv2_w": pick(pre + "conv2.weight"),
        "conv2_b": pick(pre + "conv2.bias"),
        "pos_embd": pick(pre + "embed_positions.weight"),
        "ln_post_w": pick(pre + "layer_norm.weight"),
        "ln_post_b": pick(pre + "layer_norm.bias"),
        "layers": [],
    }
    il = 0
    while f"{pre}layers.{il}.self_attn.q_proj.weight" in sd:
        p = f"{pre}layers.{il}."
        params["layers"].append({
            "n_head": n_head,
            "attn_ln_w": g(p + "self_attn_layer_norm.weight"),
            "attn_ln_b": g(p + "self_attn_layer_norm.bias"),
            "wq": g(p + "self_attn.q_proj.weight").T,
            "bq": g(p + "self_attn.q_proj.bias"),
            "wk": g(p + "self_attn.k_proj.weight").T,
            "wv": g(p + "self_attn.v_proj.weight").T,
            "bv": g(p + "self_attn.v_proj.bias"),
            "wo": g(p + "self_attn.out_proj.weight").T,
            "bo": g(p + "self_attn.out_proj.bias"),
            "mlp_ln_w": g(p + "final_layer_norm.weight"),
            "mlp_ln_b": g(p + "final_layer_norm.bias"),
            "fc1": g(p + "fc1.weight").T,
            "fc1_b": g(p + "fc1.bias"),
            "fc2": g(p + "fc2.weight").T,
            "fc2_b": g(p + "fc2.bias"),
        })
        il += 1
    return params


def stack_audio_frames(x: jax.Array, stack_factor: int) -> jax.Array:
    """Ultravox StackAudioFrames: pad T to a multiple of k, reshape to
    (B, T/k, k·d) (whisper-enc.cpp build_stack)."""
    B, T, D = x.shape
    pad = (-T) % stack_factor
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x.reshape(B, (T + pad) // stack_factor, stack_factor * D)


def audio_project_ultravox(proj: dict, x: jax.Array) -> jax.Array:
    """UltravoxProjector (whisper-enc.cpp:55-74): stack → RMS-norm·w_pre →
    mm_1 → swapped swiglu (second half through silu) → RMS-norm·w_mid →
    mm_2."""
    x = stack_audio_frames(x, int(proj["stack_factor"]))
    x = ops.rms_norm(x, proj["norm_pre"], 1e-6)
    x = x @ proj["mm_1"]
    h1, h2 = jnp.split(x, 2, axis=-1)
    x = h1 * ops.silu(h2)
    x = ops.rms_norm(x, proj["norm_mid"], 1e-6)
    return x @ proj["mm_2"]


def audio_project(proj: dict, x: jax.Array) -> jax.Array:
    """Projector dispatch by type (whisper-enc.cpp:55-105): ultravox
    (stack+swiglu), qwen2a (single FC), voxtral (gelu-erf MLP)."""
    kind = proj.get("type", "ultravox")
    if kind == "ultravox":
        return audio_project_ultravox(proj, x)
    if kind == "qwen2a":
        return x @ proj["fc"] + proj["fc_b"]
    if kind == "voxtral":
        h = ops.gelu_erf(x @ proj["mm_1"])
        return h @ proj["mm_2"]
    if kind == "music_flamingo":
        h = ops.gelu_erf(x @ proj["mm_1"] + proj["mm_1_b"])
        return h @ proj["mm_2"] + proj["mm_2_b"]
    if kind == "glma":
        # GLM-4 audio (whisper-enc.cpp GLMA branch): LN·w+b → frame stack →
        # GELU MLP → learned [BOI]/[EOI] wrapping
        h = ops.layer_norm(x, proj["norm_pre"], proj["norm_pre_b"], 1e-5)
        h = stack_audio_frames(h, int(proj["stack_factor"]))
        h = ops.gelu_erf(h @ proj["mm_1"] + proj["mm_1_b"])
        h = h @ proj["mm_2"] + proj["mm_2_b"]
        B = h.shape[0]
        E = h.shape[-1]
        boi = jnp.broadcast_to(proj["boi"][None, None], (B, 1, E))
        eoi = jnp.broadcast_to(proj["eoi"][None, None], (B, 1, E))
        return jnp.concatenate([boi, h, eoi], axis=1)
    raise NotImplementedError(f"audio projector {kind!r}")


def load_audio_mmproj(path: str) -> dict:
    """Read an audio mmproj GGUF (mtmd 'a.' / 'mm.a.' names) into
    whisper_encoder + projector params."""
    from ..gguf import GGUFReader

    r = GGUFReader(path)
    md = r.metadata

    def g(name, t=False):
        ti = r.tensors.get(name)
        if ti is None:
            return None
        arr = ti.astype_f32()
        return jnp.asarray(arr.T if t and arr.ndim == 2 else arr)

    n_head = int(md.get("clip.audio.attention.head_count", 8))
    params = {
        "conv1_w": g("a.conv1d.1.weight"),
        "conv1_b": g("a.conv1d.1.bias"),
        "conv2_w": g("a.conv1d.2.weight"),
        "conv2_b": g("a.conv1d.2.bias"),
        "pos_embd": g("a.position_embd.weight"),
        "ln_post_w": g("a.post_ln.weight"),
        "ln_post_b": g("a.post_ln.bias"),
        "layers": [],
    }
    il = 0
    while f"a.blk.{il}.attn_q.weight" in r.tensors:
        p = f"a.blk.{il}."
        params["layers"].append({
            "n_head": n_head,
            "attn_ln_w": g(p + "ln_1.weight"), "attn_ln_b": g(p + "ln_1.bias"),
            "wq": g(p + "attn_q.weight", t=True), "bq": g(p + "attn_q.bias"),
            "wk": g(p + "attn_k.weight", t=True),
            "wv": g(p + "attn_v.weight", t=True), "bv": g(p + "attn_v.bias"),
            "wo": g(p + "attn_out.weight", t=True), "bo": g(p + "attn_out.bias"),
            "mlp_ln_w": g(p + "ln_2.weight"), "mlp_ln_b": g(p + "ln_2.bias"),
            "fc1": g(p + "ffn_up.weight", t=True), "fc1_b": g(p + "ffn_up.bias"),
            "fc2": g(p + "ffn_down.weight", t=True), "fc2_b": g(p + "ffn_down.bias"),
        })
        il += 1
    proj = {
        "type": str(md.get("clip.audio.projector_type", "ultravox")),
        "stack_factor": int(md.get("clip.audio.projector.stack_factor", 8)),
        "norm_pre": g("mm.a.norm_pre.weight"),
        "norm_mid": g("mm.a.norm_mid.weight"),
        "mm_1": g("mm.a.mlp.1.weight", t=True),
        "mm_2": g("mm.a.mlp.2.weight", t=True),
        "fc": g("mm.a.fc.weight", t=True),
        "fc_b": g("mm.a.fc.bias"),
    }
    proj = {k: v for k, v in proj.items() if v is not None}
    r.close()
    return {"encoder": params, "projector": proj,
            "n_mel": int(md.get("clip.audio.num_mel_bins", 80))}


def write_audio_mmproj(path: str, hf_whisper_sd: dict, n_head: int,
                       projector: dict, stack_factor: int = 8) -> None:
    """Write an ultravox-style audio mmproj GGUF from a HF whisper state
    dict + projector arrays {norm_pre, norm_mid, mm_1 (out,in), mm_2}."""
    from ..gguf import GGMLType, GGUFWriter

    enc = params_from_hf_state_dict(hf_whisper_sd, n_head)
    w = GGUFWriter(path, arch="clip")
    w.add("clip.has_audio_encoder", True)
    w.add("clip.audio.projector_type", "ultravox")
    w.add("clip.audio.num_mel_bins", int(enc["conv1_w"].shape[1]))
    w.add("clip.audio.attention.head_count", int(n_head))
    w.add("clip.audio.embedding_length", int(enc["pos_embd"].shape[1]))
    w.add("clip.audio.block_count", len(enc["layers"]))
    w.add("clip.audio.projector.stack_factor", int(stack_factor))

    def put(name, arr, transpose=False):
        if arr is None:
            return
        a = np.asarray(arr, np.float32)
        w.add_tensor(name, a.T if transpose and a.ndim == 2 else a,
                     GGMLType.F32)

    put("a.conv1d.1.weight", enc["conv1_w"])
    put("a.conv1d.1.bias", enc["conv1_b"])
    put("a.conv1d.2.weight", enc["conv2_w"])
    put("a.conv1d.2.bias", enc["conv2_b"])
    put("a.position_embd.weight", enc["pos_embd"])
    put("a.post_ln.weight", enc["ln_post_w"])
    put("a.post_ln.bias", enc["ln_post_b"])
    for il, l in enumerate(enc["layers"]):
        p = f"a.blk.{il}."
        put(p + "ln_1.weight", l["attn_ln_w"]); put(p + "ln_1.bias", l["attn_ln_b"])
        put(p + "attn_q.weight", l["wq"], True); put(p + "attn_q.bias", l["bq"])
        put(p + "attn_k.weight", l["wk"], True)
        put(p + "attn_v.weight", l["wv"], True); put(p + "attn_v.bias", l["bv"])
        put(p + "attn_out.weight", l["wo"], True); put(p + "attn_out.bias", l["bo"])
        put(p + "ln_2.weight", l["mlp_ln_w"]); put(p + "ln_2.bias", l["mlp_ln_b"])
        put(p + "ffn_up.weight", l["fc1"], True); put(p + "ffn_up.bias", l["fc1_b"])
        put(p + "ffn_down.weight", l["fc2"], True); put(p + "ffn_down.bias", l["fc2_b"])
    put("mm.a.norm_pre.weight", projector["norm_pre"])
    put("mm.a.norm_mid.weight", projector["norm_mid"])
    put("mm.a.mlp.1.weight", projector["mm_1"])   # stored (out, in)
    put("mm.a.mlp.2.weight", projector["mm_2"])
    w.write()
