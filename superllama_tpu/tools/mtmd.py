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
        from ..gguf import GGUFReader

        self.model = model
        r = GGUFReader(mmproj_path)
        proj_type = str(r.metadata.get("clip.projector_type", "mlp"))
        r.close()
        self.select_layer = select_layer
        if proj_type in ("internvl", "pixtral"):
            from ..models.vision_extra import (encode_image_extra,
                                               params_from_mmproj_extra)

            self.clip = params_from_mmproj_extra(mmproj_path)
            hp = self.clip["hp"]
            arrays = {k: v for k, v in self.clip.items() if k != "hp"}

            def enc(arrs, px):
                p = dict(arrs)
                p["hp"] = hp
                return encode_image_extra(p, px)
        else:
            self.clip = load_mmproj(mmproj_path)
            hp = self.clip["hp"]  # plain-scalar config: static closure
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


# ------------------------- serving helpers (mtmd.cpp) -------------------------

# mtmd.cpp's default media marker: chat handlers replace each image content
# part with this string, render the template, then splice embedding chunks
# where the markers landed (tools/mtmd/mtmd.cpp input_chunks parsing).
MEDIA_MARKER = "<__media__>"

# OpenAI-CLIP normalization (clip.cpp defaults when the mmproj carries none)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(data: bytes, image_size: int,
                 mean: np.ndarray = _CLIP_MEAN,
                 std: np.ndarray = _CLIP_STD) -> np.ndarray:
    """Image file bytes → normalized (3, S, S) float32 pixel values
    (bicubic resize to the tower's input size, CLIP mean/std)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    img = img.resize((image_size, image_size), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0              # (S, S, 3)
    x = (x - mean) / std
    return np.ascontiguousarray(x.transpose(2, 0, 1))


def build_embed_prompt(mtmd: "Multimodal | None", tokenizer, text: str,
                       media: list,
                       marker: str = MEDIA_MARKER,
                       audio: "AudioMultimodal | None" = None
                       ) -> tuple[list[int], np.ndarray]:
    """Rendered chat text with media markers + decoded media →
    (prompt_ids, prompt_embeds): text spans tokenize normally and look up
    token embeddings; each marker becomes that medium's projected embedding
    chunk (ids there are placeholder 0s). ``media`` entries are pixel
    arrays, or ("audio", samples) tuples routed through ``audio``. The
    pair feeds GenRequest directly (mtmd.cpp input_chunks → llama_batch
    embd counterpart)."""
    segs = text.split(marker)
    if len(segs) - 1 != len(media):
        raise ValueError(
            f"prompt has {len(segs) - 1} media markers but {len(media)} "
            f"media items were supplied")
    base = mtmd if mtmd is not None else audio
    tok_embd = np.asarray(base.model.params["token_embd"], np.float32)
    ids: list[int] = []
    chunks: list[np.ndarray] = []
    for i, seg in enumerate(segs):
        if seg:
            s_ids = tokenizer.encode(seg, add_special=(i == 0),
                                     parse_special=True)
            ids.extend(int(t) for t in s_ids)
            chunks.append(tok_embd[np.asarray(s_ids, np.int32)])
        elif i == 0:
            b = tokenizer.encode("", add_special=True, parse_special=True)
            if b:
                ids.extend(int(t) for t in b)
                chunks.append(tok_embd[np.asarray(b, np.int32)])
        if i < len(media):
            item = media[i]
            if isinstance(item, tuple) and item and item[0] == "audio":
                emb = np.asarray(audio.audio_embeds(item[1]))[0]
            else:
                emb = np.asarray(mtmd.image_embeds(item[None]))[0]
            ids.extend([0] * emb.shape[0])
            chunks.append(np.asarray(emb, np.float32))
    embeds = np.concatenate(chunks, axis=0)
    return ids, embeds
