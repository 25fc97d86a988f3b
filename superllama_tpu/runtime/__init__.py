"""Runtime: context, KV cache, sampling, batching."""

from .kv_cache import KVCache, causal_mask, kv_cache_init

__all__ = ["Context", "KVCache", "causal_mask", "kv_cache_init"]


def __getattr__(name):
    # lazy: context imports models.registry which imports models (avoid cycle)
    if name == "Context":
        from .context import Context

        return Context
    raise AttributeError(name)
