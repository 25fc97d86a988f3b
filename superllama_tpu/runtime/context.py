"""Inference context: owns the jitted step function and the KV cache.

Counterpart of llama_context (src/llama-context.{h,cpp}): decode/encode entry,
output logits access, KV-cache lifetime. TPU-native: the per-step function is
one jit-compiled XLA program with the cache donated; there is no graph
scheduler because XLA owns placement/fusion.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..models.registry import get_forward
from .kv_cache import ISWACache, KVCache, iswa_layer_split


class Context:
    def __init__(
        self,
        model: LoadedModel,
        n_batch: int = 1,
        n_ctx: int = 2048,
        kv_dtype=None,
        forward_fn: Callable | None = None,
        iswa: bool | None = None,
    ):
        self.model = model
        hp = model.hparams
        self.hp = hp
        self.n_batch = n_batch
        self.n_ctx = n_ctx
        # iSWA two-tier cache (llama_kv_cache_iswa counterpart): auto-on for
        # models with sliding-window layers — SWA layers get an O(window)
        # ring instead of an O(n_ctx) cache
        if iswa is None:
            iswa = (not hp.is_recurrent and hp.swa_window > 0
                    and len(iswa_layer_split(hp)[1]) > 0)
        self.iswa = iswa
        embd = jax.tree_util.tree_leaves(model.params["token_embd"])[0]
        self.kv_dtype = kv_dtype or embd.dtype
        fwd = forward_fn or get_forward(hp.arch)

        def step(params, tokens, pos, cache):
            return fwd(params, hp, tokens, pos, cache)

        # donate the cache: it is functionally updated every step
        self._step = jax.jit(step, donate_argnums=(3,))
        self.cache = self.new_cache()
        self._n_past = 0  # recurrent-cache position counter

    def new_cache(self):
        hp = self.hp
        if isinstance(self.kv_dtype, str) and (
                hp.is_recurrent or hp.is_hybrid or self.iswa):
            raise ValueError(
                "q8_0 KV cache is supported for standard attention caches "
                "only (not iswa/recurrent/hybrid)")
        from .cache_policy import make_cache

        return make_cache(hp, self.n_batch, self.n_ctx, self.kv_dtype,
                          iswa=self.iswa)

    def reset(self):
        self.cache = self.new_cache()
        self._n_past = 0

    def forward(self, tokens: np.ndarray, pos: np.ndarray | None = None) -> jax.Array:
        """Run one step over (B, T) tokens; returns logits (B, T, V)."""
        tokens = jnp.asarray(tokens, jnp.int32)
        if tokens.ndim == 1:
            tokens = tokens[None, :]
        if self.hp.is_recurrent:
            if pos is None:
                pos = self._n_past + jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
            self._n_past += tokens.shape[1]
            logits, self.cache = self._step(self.model.params, tokens,
                                            jnp.asarray(pos, jnp.int32), self.cache)
            return logits
        # XLA scatter clamps out-of-bounds writes silently; fail loudly instead
        if isinstance(self.cache, ISWACache):
            s_swa = self.cache.swa.max_seq
            if (s_swa < self.n_ctx
                    and tokens.shape[1] > s_swa - self.hp.swa_window):
                raise ValueError(
                    f"ubatch of {tokens.shape[1]} exceeds SWA ring headroom "
                    f"({s_swa} slots - window {self.hp.swa_window}); split it"
                )
            cursor = jnp.maximum(self.cache.full.cursor, self.cache.swa.cursor)
        elif hasattr(self.cache, "attn"):  # HybridCache
            cursor = self.cache.attn.cursor
        else:
            cursor = self.cache.cursor
        max_cursor = int(jax.device_get(cursor).max())
        if max_cursor + tokens.shape[1] > self.n_ctx:
            raise ValueError(
                f"KV cache overflow: {max_cursor}+{tokens.shape[1]} > n_ctx={self.n_ctx}"
            )
        if pos is None:
            start = cursor[: tokens.shape[0]]
            pos = start[:, None] + jnp.arange(tokens.shape[1], dtype=jnp.int32)[None, :]
        else:
            pos = jnp.asarray(pos, jnp.int32)
            if pos.ndim == 1:
                pos = pos[None, :]
        logits, self.cache = self._step(self.model.params, tokens, pos, self.cache)
        return logits

    def greedy_generate(self, prompt_ids: list[int], n_gen: int, stop_eog: bool = True) -> list[int]:
        """Prefill + greedy decode loop. Hot loop is fully jitted per step."""
        v = self.model.tokenizer.vocab if self.model.tokenizer else None
        logits = self.forward(np.asarray(prompt_ids, np.int32))
        out = list(prompt_ids)
        last = int(jnp.argmax(logits[0, -1]))
        out.append(last)
        for _ in range(n_gen - 1):
            if stop_eog and v is not None and v.is_eog(last):
                break
            logits = self.forward(np.asarray([last], np.int32))
            last = int(jnp.argmax(logits[0, -1]))
            out.append(last)
        return out
