"""Fully-jitted decode loop: prefill + lax.scan over decode steps with
on-device sampling — ONE dispatch for N tokens, zero per-token Python
(SURVEY.md §7 hard-part 5; the reference's backend-sampling decode loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..models.registry import get_forward
from ..ops import device_sampling
from .kv_cache import kv_cache_init


class DecodeLoop:
    """Compiled generate(): prefill (bucketed) + scan decode, cache donated."""

    def __init__(self, model: LoadedModel, n_ctx: int = 2048,
                 kv_dtype=jnp.bfloat16, temp: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0):
        self.model = model
        hp = model.hparams
        self.hp = hp
        self.n_ctx = n_ctx
        self.kv_dtype = kv_dtype
        fwd = get_forward(hp.arch)
        samp_cfg = dict(temp=temp, top_k=top_k, top_p=top_p, min_p=min_p)

        @functools.partial(jax.jit, static_argnames=("n_steps",),
                           donate_argnums=(3,))
        def prefill_and_scan(params, tokens, pos, cache, key, n_steps: int):
            logits, cache = fwd(params, hp, tokens, pos, cache)
            # position of the next token per row = max prompt pos + 1
            next_pos = jnp.max(pos, axis=1, keepdims=True) + 1
            # logits row of the last valid prompt token
            last_idx = jnp.argmax(pos, axis=1)
            first_logits = logits[jnp.arange(logits.shape[0]), last_idx]
            key, sub = jax.random.split(key)
            tok0 = device_sampling.sample(first_logits, sub, **samp_cfg)

            def body(carry, _):
                tok, p, cache, key = carry
                lg, cache = fwd(params, hp, tok[:, None], p, cache)
                key, sub = jax.random.split(key)
                nxt = device_sampling.sample(lg[:, -1], sub, **samp_cfg)
                return (nxt, p + 1, cache, key), nxt

            (_, _, cache, _), toks = jax.lax.scan(
                body, (tok0, next_pos, cache, key), None, length=n_steps - 1)
            all_toks = jnp.concatenate([tok0[None], toks], axis=0)  # (n, B)
            return all_toks.T, cache                                 # (B, n)

        self._run = prefill_and_scan

    def generate(self, prompt_ids: list[int], n_gen: int, seed: int = 0,
                 stop_eog: bool = True) -> list[int]:
        """Single-sequence generate; returns prompt + generated ids."""
        hp = self.hp
        n = len(prompt_ids)
        cache = kv_cache_init(hp.n_layer, 1, self.n_ctx, hp.n_head_kv,
                              hp.head_dim, hp.head_dim_v, dtype=self.kv_dtype)
        tokens = jnp.asarray(np.asarray(prompt_ids, np.int32)[None])
        pos = jnp.arange(n, dtype=jnp.int32)[None]
        toks, _ = self._run(self.model.params, tokens, pos, cache,
                            jax.random.PRNGKey(seed), n_steps=n_gen)
        out = [int(t) for t in np.asarray(toks[0])]
        if stop_eog and self.model.tokenizer is not None:
            v = self.model.tokenizer.vocab
            for i, t in enumerate(out):
                if v.is_eog(t):
                    out = out[: i + 1]
                    break
        return list(prompt_ids) + out
