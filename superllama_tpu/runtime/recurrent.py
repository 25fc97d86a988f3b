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
                         d_state: int, dtype=jnp.float32,
                         conv_dim: int | None = None) -> RecurrentCache:
    """conv_dim: channels through the conv (mamba2 convolves [x,B,C] so this
    exceeds d_inner); defaults to d_inner (mamba1)."""
    return RecurrentCache(
        conv=jnp.zeros((n_layer, batch, d_conv - 1, conv_dim or d_inner), dtype),
        ssm=jnp.zeros((n_layer, batch, d_inner, d_state), dtype),
    )


def seq_keep_row(cache: RecurrentCache, b: int) -> RecurrentCache:
    mask = (jnp.arange(cache.batch) == b)[None, :, None, None]
    return RecurrentCache(conv=jnp.where(mask, cache.conv, 0),
                          ssm=jnp.where(mask[..., 0], cache.ssm, 0))


class HybridCache(NamedTuple):
    """Hybrid memory (llama_memory_hybrid counterpart): a KV cache for the
    attention layers + a recurrent store for the SSM layers. Each sub-cache
    is indexed by its own compact layer list (static routing from hparams)."""

    attn: "object"          # KVCache over the attention layers only
    rec: "RecurrentCache"   # conv+ssm state over the SSM layers only


class RWKVCache(NamedTuple):
    """RWKV recurrent state (token_shift_count == 2 layout, as stored by
    llama_memory_recurrent for LLM_ARCH_RWKV6/7): per layer the last
    time-mix/channel-mix inputs plus the (H, D, D) wkv matrix state."""

    shift: jax.Array   # (L, B, 2, E) — [att_shift, ffn_shift]
    wkv: jax.Array     # (L, B, H, D, D) float32

    @property
    def batch(self) -> int:
        return self.shift.shape[1]


def rwkv_cache_init(n_layer: int, batch: int, n_embd: int, n_head: int,
                    head_size: int, dtype=jnp.float32) -> RWKVCache:
    return RWKVCache(
        shift=jnp.zeros((n_layer, batch, 2, n_embd), dtype),
        wkv=jnp.zeros((n_layer, batch, n_head, head_size, head_size),
                      jnp.float32),
    )
