"""Recurrent state store (mamba/rwkv-style) — counterpart of
llama_memory_recurrent (src/llama-memory-recurrent.*): instead of KV slots,
each layer carries a convolution shift-state and an SSM state, updated
functionally inside jit."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RecurrentCache(NamedTuple):
    conv: jax.Array   # (L, B, d_conv-1, d_inner) — last kernel-1 conv inputs
    ssm: jax.Array    # (L, B, d_inner, d_state)

    @property
    def batch(self) -> int:
        return self.conv.shape[1]


def recurrent_cache_init(n_layer: int, batch: int, d_conv: int, d_inner: int,
                         d_state: int, dtype=jnp.float32) -> RecurrentCache:
    return RecurrentCache(
        conv=jnp.zeros((n_layer, batch, d_conv - 1, d_inner), dtype),
        ssm=jnp.zeros((n_layer, batch, d_inner, d_state), dtype),
    )


def seq_keep_row(cache: RecurrentCache, b: int) -> RecurrentCache:
    mask = (jnp.arange(cache.batch) == b)[None, :, None, None]
    return RecurrentCache(conv=jnp.where(mask, cache.conv, 0),
                          ssm=jnp.where(mask[..., 0], cache.ssm, 0))
