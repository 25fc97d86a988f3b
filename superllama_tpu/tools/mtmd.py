"""Multimodal pipeline (tools/mtmd counterpart): encode an image through the
mmproj vision tower, project into text-embedding space, and inject as a
prefix-chunk of input embeddings into the language model."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import clip_vision_forward, load_mmproj, project_image_features
from ..models.loader import LoadedModel
from ..runtime.kv_cache import kv_cache_init


class Multimodal:
    def __init__(self, model: LoadedModel, mmproj_path: str,
                 select_layer: int = 0):
        self.model = model
        self.clip = load_mmproj(mmproj_path)
        self.select_layer = select_layer
        hp = self.clip["hp"]  # plain-scalar config: closed over as static
        arrays = {k: v for k, v in self.clip.items() if k != "hp"}

        def enc(arrs, px):
            p = dict(arrs)
            p["hp"] = hp
            return project_image_features(
                p, clip_vision_forward(p, px, select_layer))

        self._clip_arrays = arrays
        self._encode = jax.jit(enc)

    def image_embeds(self, pixel_values: np.ndarray) -> jax.Array:
        """(B, C, H, W) float pixels → (B, n_img_tokens, n_embd_text)."""
        return self._encode(self._clip_arrays,
                            jnp.asarray(pixel_values, jnp.float32))

    def build_inputs(self, prompt_ids: list[int], pixel_values: np.ndarray,
                     img_pos: int | None = None):
        """Compose (embeds (1,T,E), tokens (1,T), pos (1,T)): image chunk
        inserted at img_pos (default: after the first token, llava-style)."""
        img = np.asarray(self.image_embeds(pixel_values[None]
                                           if pixel_values.ndim == 3
                                           else pixel_values))[0]
        tok_embd = np.asarray(self.model.params["token_embd"])
        txt = tok_embd[np.asarray(prompt_ids, np.int32)]
        at = 1 if img_pos is None else img_pos
        embeds = np.concatenate([txt[:at], img, txt[at:]], axis=0)
        T = embeds.shape[0]
        tokens = np.zeros(T, np.int32)  # ids are placeholders under embeds
        pos = np.arange(T, dtype=np.int32)
        return (jnp.asarray(embeds[None]), jnp.asarray(tokens[None]),
                jnp.asarray(pos[None]))

    def prefill(self, prompt_ids: list[int], pixel_values: np.ndarray,
                n_ctx: int = 2048, kv_dtype=jnp.float32):
        """Run the multimodal prefill; returns (logits, cache, n_past)."""
        from ..models.registry import get_forward

        hp = self.model.hparams
        fwd = get_forward(hp.arch)
        embeds, tokens, pos = self.build_inputs(prompt_ids, pixel_values)
        cache = kv_cache_init(hp.n_layer, 1, n_ctx, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        logits, cache = jax.jit(
            lambda p, t, po, c, e: fwd(p, hp, t, po, c, embeds=e),
            donate_argnums=(3,))(self.model.params, tokens, pos, cache, embeds)
        return logits, cache, int(tokens.shape[1])


class AudioMultimodal:
    """Audio input (mtmd audio path: whisper-enc + ultravox projector):
    samples → log-mel → encoder → stacked projector → embedding chunk
    injected like an image chunk."""

    def __init__(self, model: LoadedModel, mmproj_path: str):
        from ..models.whisper import (audio_project, load_audio_mmproj,
                                      whisper_encoder)

        self.model = model
        mm = load_audio_mmproj(mmproj_path)
        self.n_mel = mm["n_mel"]
        enc_params, proj = mm["encoder"], mm["projector"]
        # statics (python ints) must not ride the traced pytree
        n_head = enc_params["layers"][0]["n_head"]
        stack = int(proj.pop("stack_factor", 8))
        kind = proj.pop("type", "ultravox")
        for l in enc_params["layers"]:
            l.pop("n_head", None)

        def enc(enc_arrays, proj_arrays, mel):
            ep = dict(enc_arrays)
            ep["layers"] = [dict(l, n_head=n_head) for l in enc_arrays["layers"]]
            pj = dict(proj_arrays, stack_factor=stack, type=kind)
            return audio_project(pj, whisper_encoder(ep, mel))

        self._params = (enc_params, proj)
        self._encode = jax.jit(enc)

    def audio_embeds(self, samples: np.ndarray) -> jax.Array:
        """16 kHz mono samples → (1, n_audio_tokens, n_embd_text)."""
        from ..models.whisper import HOP_LENGTH, log_mel_spectrogram

        n_frames = max(2, int(np.asarray(samples).size // HOP_LENGTH))
        n_frames += n_frames % 2
        mel = log_mel_spectrogram(samples, n_mels=self.n_mel, pad_to=n_frames)
        return self._encode(*self._params, jnp.asarray(mel[None]))

    def build_inputs(self, prompt_ids: list[int], samples: np.ndarray,
                     audio_pos: int | None = None):
        aud = np.asarray(self.audio_embeds(samples))[0]
        tok_embd = np.asarray(self.model.params["token_embd"])
        txt = tok_embd[np.asarray(prompt_ids, np.int32)]
        at = 1 if audio_pos is None else audio_pos
        embeds = np.concatenate([txt[:at], aud, txt[at:]], axis=0)
        T = embeds.shape[0]
        return (jnp.asarray(embeds[None]),
                jnp.zeros((1, T), jnp.int32),
                jnp.arange(T, dtype=jnp.int32)[None])

    def prefill(self, prompt_ids: list[int], samples: np.ndarray,
                n_ctx: int = 2048, kv_dtype=jnp.float32):
        from ..models.registry import get_forward

        hp = self.model.hparams
        embeds, tokens, pos = self.build_inputs(prompt_ids, samples)
        cache = kv_cache_init(hp.n_layer, 1, n_ctx, hp.n_head_kv, hp.head_dim,
                              hp.head_dim_v, dtype=kv_dtype)
        fwd = get_forward(hp.arch)
        logits, cache = fwd(self.model.params, hp, tokens, pos, cache,
                            embeds=embeds)
        return logits, cache, int(tokens.shape[1])
