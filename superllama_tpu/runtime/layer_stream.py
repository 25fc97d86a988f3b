"""Layer-streaming executor: run models larger than HBM on one chip.

TPU-native union of three fork subsystems (SURVEY.md §2.2):
 - dynamic layer scheduler (src/llama-layer-sched.h:45-223) — LRU residency
   with dual hysteresis thresholds, layer pinning, watermarks, timing stats,
   graceful degradation under memory pressure;
 - async prefetcher (src/llama-prefetch.h:35-120) — lookahead of N layers
   ahead of the compute cursor;
 - stream pipeline (src/llama-stream-pipeline.h:111-177) — overlap of H2D
   weight copies with per-layer compute.

The TPU design needs no worker threads or CUDA streams: ``jax.device_put``
is asynchronous, so a prefetch IS an early device_put — the transfer rides
the DMA engine while earlier layers compute, and the XLA runtime blocks only
if a layer's weights are still in flight when its computation is dispatched.

Per-layer compute reuses ``llama_forward`` itself on a single-layer params
view (embeds input bypasses the token lookup, hidden_sink taps the layer
output, a dummy 2-row head makes the discarded logits free), so every
architecture switch (GQA, SWA classes, softcaps, MoE, parallel residual)
behaves identically to the resident path — asserted in tests.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp

from ..models.hparams import HParams
from ..models.llama import _norm, llama_forward, mm
from .kv_cache import KVCache


def host_sharder(device=None):
    """Loader hook keeping per-layer weights on host RAM and everything else
    on the accelerator (models/loader.py ``sharder`` param) — the load-time
    half of layer streaming."""
    cpu = jax.devices("cpu")[0]
    dev = device or jax.devices()[0]

    def sharder(name: str, arr) -> jax.Array:
        return jax.device_put(arr, cpu if name.startswith("blk.") else dev)

    return sharder


class LayerStreamExecutor:
    """Schedules per-layer weight residency HBM⇄host around the forward pass.

    API mirrors llama_layer_scheduler: prepare_layer (h:69), pin/unpin
    (h:56,120), set_resident_limit + pressure degradation (h:48-57,55),
    stats/watermarks (h:108-117).
    """

    def __init__(self, model, n_resident: int = 4, prefetch_depth: int = 2,
                 pinned: tuple[int, ...] = (), device=None, telemetry=None,
                 pressure_threshold: float = 0.85):
        self.hp: HParams = model.hparams
        self.params = model.params
        self.device = device or jax.devices()[0]
        self.n_resident = max(int(n_resident), 1)
        self.prefetch_depth = int(prefetch_depth)
        self.pinned = set(pinned)
        self.telemetry = telemetry
        self.pressure_threshold = pressure_threshold
        self._resident: dict[int, Any] = {}   # il -> device layer pytree (LRU)
        self._order: list[int] = []           # LRU order, oldest first
        self._active: int | None = None       # compute cursor, never evicted
        self.stats = {
            "migrations_in": 0, "migrations_out": 0, "hits": 0, "misses": 0,
            "bytes_in": 0, "migrate_s": 0.0, "peak_resident": 0,
            "degradations": 0,
        }
        # non-layer params stay device-resident
        self._top = {k: v for k, v in model.params.items() if k != "layers"}
        self._hp1 = {}  # per layer-class single-layer hparams
        self._dummy_head = jnp.zeros((2, self.hp.n_embd),
                                     jnp.bfloat16 if jax.default_backend() == "tpu"
                                     else jnp.float32)

    # ------------------------------------------------------- residency

    def _layer_bytes(self, layer) -> int:
        return sum(getattr(x, "nbytes", 0) for x in jax.tree_util.tree_leaves(layer))

    def prepare_layer(self, il: int):
        """Device weights for layer il; starts the H2D copy if not resident
        (llama_layer_sched.h:69). Non-blocking — device_put is async."""
        if il in self._resident:
            self.stats["hits"] += 1
            self._order.remove(il)
            self._order.append(il)
            return self._resident[il]
        self.stats["misses"] += 1
        t0 = time.perf_counter()
        lw = jax.device_put(self.params["layers"][il], self.device)
        self.stats["migrate_s"] += time.perf_counter() - t0
        self.stats["migrations_in"] += 1
        self.stats["bytes_in"] += self._layer_bytes(lw)
        self._resident[il] = lw
        self._order.append(il)
        self.stats["peak_resident"] = max(self.stats["peak_resident"],
                                          len(self._resident))
        self._evict_to_limit()
        return lw

    def _evict_to_limit(self):
        limit = self.n_resident
        if (self.telemetry is not None
                and self.telemetry.pressure(self.pressure_threshold)):
            # graceful degradation: halve residency under memory pressure
            limit = max(1 + len(self.pinned), limit // 2)
            self.stats["degradations"] += 1
        while len(self._resident) > limit:
            victim = next((i for i in self._order
                           if i not in self.pinned and i != self._active), None)
            if victim is None:
                break
            self._order.remove(victim)
            del self._resident[victim]
            self.stats["migrations_out"] += 1

    def pin_layer(self, il: int):
        self.pinned.add(il)
        self.prepare_layer(il)

    def unpin_layer(self, il: int):
        self.pinned.discard(il)

    def evict_all(self):
        """Drop every non-pinned resident layer (migrate-to-host analog)."""
        for il in [i for i in self._order if i not in self.pinned]:
            self._order.remove(il)
            del self._resident[il]
            self.stats["migrations_out"] += 1

    # ------------------------------------------------------- forward

    def _hp_for(self, il: int) -> HParams:
        swa = self.hp.swa_window if self.hp.is_swa_layer(il) else 0
        key = swa
        if key not in self._hp1:
            # single-layer view: layer 0 of pattern-2 is SWA when swa>0
            self._hp1[key] = dataclasses.replace(
                self.hp, n_layer=1, swa_window=swa, swa_pattern=2,
                f_embedding_scale=1.0, final_logit_softcap=0.0,
                logit_scale=1.0)
        return self._hp1[key]

    def forward(self, tokens: jax.Array, pos: jax.Array, cache: KVCache,
                flash: bool | None = None):
        """Same contract as llama_forward; weights stream through HBM."""
        hp = self.hp
        tokens = jnp.asarray(tokens)
        pos = jnp.asarray(pos)
        safe_pos = jnp.maximum(pos, 0)
        x = self._top["token_embd"][tokens] * hp.f_embedding_scale
        if self._top.get("position_embd") is not None:
            x = x + self._top["position_embd"][safe_pos]

        ks, vs = [], []
        pos_out = cursor_out = None
        for il in range(hp.n_layer):
            self._active = il
            for j in range(min(il + self.prefetch_depth, hp.n_layer - 1), il, -1):
                self.prepare_layer(j)      # async H2D rides ahead of compute
            lw = self.prepare_layer(il)
            p1 = dict(self._top)
            p1["token_embd"] = self._dummy_head.astype(x.dtype)
            p1.pop("position_embd", None)
            p1.pop("output", None)
            p1.pop("output_b", None)
            p1["output_norm"] = jnp.ones((hp.n_embd,), x.dtype)
            p1.pop("output_norm_b", None)
            if self._top.get("cvec") is not None:
                p1["cvec"] = self._top["cvec"][il:il + 1]
            p1["layers"] = [lw]
            c1 = KVCache(k=cache.k[il:il + 1], v=cache.v[il:il + 1],
                         pos=cache.pos, cursor=cache.cursor)
            sink: list = []
            _, c1 = llama_forward(p1, self._hp_for(il), tokens, pos, c1,
                                  flash=flash, embeds=x, hidden_sink=sink)
            x = sink[-1]
            ks.append(c1.k[0])
            vs.append(c1.v[0])
            pos_out, cursor_out = c1.pos, c1.cursor
        self._active = None
        cache = KVCache(k=jnp.stack(ks), v=jnp.stack(vs),
                        pos=pos_out, cursor=cursor_out)

        x = _norm(x, self._top, "output_norm", hp)
        w_out = self._top.get("output")
        logits = (mm(x, w_out) if w_out is not None
                  else x @ self._top["token_embd"].T)
        if self._top.get("output_b") is not None:
            logits = logits + self._top["output_b"]
        if hp.logit_scale != 1.0:
            logits = logits * hp.logit_scale
        if hp.final_logit_softcap > 0.0:
            logits = hp.final_logit_softcap * jnp.tanh(
                logits.astype(jnp.float32) / hp.final_logit_softcap
            ).astype(logits.dtype)
        return logits, cache
