"""Continuous-batching inference engine.

Semantics counterpart of the reference server's slot machinery
(tools/server/server-context.cpp:1947 update_slots: slot states, prompt
chunking, mixed batches, per-slot sampling/stop handling) — redesigned for
XLA's static-shape world:

 - decode: ONE jitted (B, 1) step over all slots; idle slots ride along with
   pos = -1 padding (masked, cursor not advanced)
 - prefill: a separate (1, P) jitted step into a scratch cache at bucketed
   lengths P ∈ PREFILL_BUCKETS (bounded compile count), then an `insert` jit
   copies the prefilled rows into the target slot of the big cache
   (JetStream-style prefill/insert/generate split)
 - sampling: host-side SamplerChain per slot (full chain incl. penalties/DRY);
   on-device greedy fast path planned with backend samplers

Thread model: submit() enqueues; a single engine thread owns the device
(mirrors the reference's single inference thread + queue_tasks loop).
"""

from __future__ import annotations

import functools
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.loader import LoadedModel
from ..models.registry import get_forward
from .cache_policy import (cache_kind, get_row, make_cache, mask_rows,
                           pow2_chunk, set_row, truncate_rows)
from .kv_cache import KVCache, kv_cache_init, kv_truncate_rows
from .sampling import SamplerChain, make_chain

PREFILL_BUCKETS = (32, 128, 512, 1024, 2048)


class SlotState(Enum):
    IDLE = 0
    GENERATING = 1
    PREFILL = 2


@dataclass
class GenRequest:
    prompt_ids: list[int]
    # optional (len(prompt_ids), n_embd) float input-embedding matrix: rows
    # replace the token-embedding lookup during prefill (mtmd image/audio
    # chunks spliced between text spans; ids at embed-only positions are
    # placeholders). tools/mtmd/mtmd.cpp chunk-injection counterpart.
    prompt_embeds: Any = None
    max_tokens: int = 128
    stop_eog: bool = True
    stop_strings: list[str] = field(default_factory=list)
    sampling: dict = field(default_factory=dict)
    grammar: str | None = None        # GBNF text (constrained decoding)
    grammar_lazy: bool = False
    grammar_triggers: list[str] = field(default_factory=list)
    stream: Optional[Callable[[int, str], None]] = None  # (token_id, piece)
    request_id: str = field(default_factory=lambda: uuid.uuid4().hex[:16])
    priority: int = 1
    # filled by the engine
    _done: threading.Event = field(default_factory=threading.Event)
    _result: dict = field(default_factory=dict)

    def result(self, timeout: float | None = None) -> dict:
        if not self._done.wait(timeout):
            raise TimeoutError(f"request {self.request_id} timed out")
        if "error" in self._result:
            raise RuntimeError(self._result["error"])
        return self._result


@dataclass
class _Slot:
    idx: int
    state: SlotState = SlotState.IDLE
    req: GenRequest | None = None
    sampler: SamplerChain | None = None
    n_past: int = 0
    n_prompt: int = 0
    generated: list[int] = field(default_factory=list)
    text: str = ""
    t_start: float = 0.0
    t_first_token: float = 0.0
    # speculative decoding
    d_past: int = 0                  # draft-cache entries for this row
    draft_tail: list[int] = field(default_factory=list)  # tokens draft hasn't seen
    # prompt cache: tokens whose KV currently occupy this row (kept across
    # requests for common-prefix reuse, server-context.cpp prompt caching)
    cache_tokens: list[int] = field(default_factory=list)
    # chunked-prefill state (one chunk per engine step: prompt loading no
    # longer stalls generating slots — update_slots mixed-batch semantics)
    pending: list[int] = field(default_factory=list)
    prefill_off: int = 0             # positions already prefilled
    prefill_P: int = 0               # chunk bucket width
    in_place: bool = False           # prefilling straight into the big cache
    scratch: Any = None              # 1-row scratch cache (JetStream split)
    pending_embeds: Any = None       # (n_prompt, E) f32 — embed-prefix prefill
    # on-device decode-block fast path
    fast: bool = False               # sampler expressible by the device chain
    seed: int = 0
    n_sampled: int = 0               # RNG stream position (tokens sampled)


class Engine:
    """Continuous-batching engine (update_slots semantics of
    tools/server/server-context.cpp:1947), with optional speculative decoding
    (common/speculative.{h,cpp} semantics: greedy draft, per-position target
    sampling, accept-longest-prefix + bonus token)."""

    def __init__(self, model: LoadedModel, n_slots: int = 4, n_ctx: int = 2048,
                 kv_dtype=jnp.bfloat16, prefill_buckets=PREFILL_BUCKETS,
                 draft_model: LoadedModel | None = None, n_draft: int = 8,
                 ctx_shift: bool = False, lookup_ngrams: int = 0,
                 block_size: int = 8, pipeline_depth: int = 2,
                 paged: bool = False,
                 page_size: int = 256, n_pages: int | None = None,
                 max_pages_per_seq: int | None = None,
                 iswa: bool | None = None):
        self.model = model
        hp = model.hparams
        self.hp = hp
        self.n_slots = n_slots
        self.n_ctx = n_ctx
        self.buckets = tuple(b for b in sorted(prefill_buckets) if b <= n_ctx) or (n_ctx,)
        fwd = get_forward(hp.arch)
        self._fwd = fwd
        self.kv_dtype = kv_dtype
        self.block_size = max(1, int(block_size))

        # memory-type policy (create_memory counterpart, src/llama-model.cpp
        # :7505-7570): mamba/rwkv-family and jamba-family models serve
        # through the same slot loop with row-masked recurrent state
        self.kind = cache_kind(hp)
        if self.kind != "dense":
            unsupported = [nm for nm, on in [
                ("paged", paged), ("speculative", draft_model is not None),
                ("lookup", lookup_ngrams), ("ctx-shift", ctx_shift)] if on]
            if unsupported:
                raise ValueError(
                    f"{self.kind} memory: {'/'.join(unsupported)} not "
                    f"supported (recurrent state cannot rewind — same "
                    f"restriction as llama_memory_recurrent::seq_rm p0>0)")
            if isinstance(kv_dtype, str):
                raise ValueError("quantized KV requires a dense cache")
            # multi-token blocks overshoot on stops and roll the cache back;
            # recurrent state cannot rewind, so non-dense engines decode one
            # token per scheduling pass (exactly update_slots' cadence) with
            # no in-flight chained blocks
            self.block_size = 1
            pipeline_depth = 1

        # iSWA two-tier serving cache (llama_kv_cache_iswa counterpart,
        # src/llama-kv-cache-iswa.h:15-40): sliding-window layers get an
        # O(window) ring instead of an O(n_ctx) row — auto-on for SWA models
        # when no incompatible mode is requested
        incompat = (paged or draft_model is not None or bool(lookup_ngrams)
                    or ctx_shift or isinstance(kv_dtype, str)
                    or self.kind != "dense")
        if iswa is None:
            from .kv_cache import iswa_layer_split

            iswa = (not incompat and hp.swa_window > 0
                    and len(iswa_layer_split(hp)[1]) > 0)
        elif iswa and incompat:
            raise ValueError(
                "iswa cache: incompatible with paged/speculative/lookup/"
                "ctx-shift/quantized-KV modes and non-dense memory")
        self.iswa = bool(iswa)

        # paged-KV mode (BASELINE config 3): page-pool cache + HBM⇄host spill
        # with swap-scheduling admission — the integration the reference left
        # dangling (src/llama-context.cpp:333 vs llama-kv-cache-paged.h)
        self.paged = bool(paged)
        if self.paged:
            if lookup_ngrams and lookup_ngrams + 1 > page_size:
                raise ValueError("lookup window must fit one page")
            if draft_model is not None and n_draft + 1 > page_size:
                raise ValueError(
                    f"speculative window {n_draft}+1 must fit one page "
                    f"({page_size})")
            from .paged_kv import PagedKVManager, paged_cache_init

            self.page_size = int(page_size)
            mpps = max_pages_per_seq or -(-n_ctx // self.page_size)
            npg = n_pages or (n_slots * mpps + 1)
            self.pkv = PagedKVManager(paged_cache_init(
                hp.n_layer, npg, self.page_size, n_slots, mpps, hp.n_head_kv,
                hp.head_dim, hp.head_dim_v, dtype=kv_dtype))
            # block decode works on the paged cache too: pages for the whole
            # block are pre-planned, so the scan appends within a static page
            # table; stops roll back via PagedKVManager.rollback
            self.block_size = min(self.block_size, self.page_size)
            self.cache = None
            self._paged_rr = 0         # round-robin admission cursor
        else:
            self.cache = make_cache(hp, n_slots, n_ctx, kv_dtype,
                                    iswa=self.iswa,
                                    n_ubatch=self.buckets[-1])

        import inspect

        # the s_window read-slice applies to flat ring caches only; the iswa
        # swa tier is already O(window)
        self._win_ok = ("s_window" in inspect.signature(fwd).parameters
                        and not self.iswa)
        self._embd_ok = "embeds" in inspect.signature(fwd).parameters

        _kind = self.kind

        def decode(params, tokens, pos, cache, s_window: int | None = None):
            if s_window and self._win_ok:
                lg, new = fwd(params, hp, tokens, pos, cache,
                              s_window=s_window)
            else:
                lg, new = fwd(params, hp, tokens, pos, cache)
            if _kind != "dense":
                # recurrent state is cumulative: idle/padded rows (pos<0)
                # must KEEP their old state (ring-KV junk writes are masked
                # on read; state updates have no such predicate)
                new = mask_rows(new, cache, pos[:, 0] >= 0)
            return lg, new

        self._decode = jax.jit(decode, donate_argnums=(3,),
                               static_argnames=("s_window",))

        # on-device multi-token decode block: N forward+sample steps in ONE
        # dispatch with the per-row parameterized sampler chain fused into
        # the graph (backend sampling, llama.h:1021/1270 + the fast decode
        # loop the reference runs per-slot in update_slots). Host sees only
        # (B, N) token ids per block; stop handling rolls back overshoot.
        from ..ops import device_sampling as dsamp
        self._dsamp = dsamp

        def decode_block(params, tok0, pos0, cache, ring, base_keys, counts,
                         sp, n_steps: int, s_window: int | None = None,
                         greedy_only: bool = False):
            def body(carry, i):
                tok, pos, cache, ring = carry
                if s_window and self._win_ok:
                    lg, new_c = fwd(params, hp, tok, pos, cache,
                                    s_window=s_window)
                else:
                    lg, new_c = fwd(params, hp, tok, pos, cache)
                cache = (new_c if _kind == "dense" else
                         mask_rows(new_c, cache, pos[:, 0] >= 0))
                if greedy_only:
                    # static fast path: every row greedy → plain argmax, no
                    # top-k/penalty machinery in the graph (~ms/step saved)
                    nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                else:
                    keys = jax.vmap(jax.random.fold_in)(base_keys, counts + i)
                    nxt, ring = dsamp.chain_step(
                        lg[:, -1].astype(jnp.float32), ring, keys, sp)
                active = pos[:, 0] >= 0
                nxt = jnp.where(active, nxt, tok[:, 0])
                pos2 = jnp.where(active[:, None], pos + 1, pos)
                return (nxt[:, None], pos2, cache, ring), nxt

            (tok_l, pos_l, cache, ring), toks = jax.lax.scan(
                body, (tok0, pos0, cache, ring),
                jnp.arange(n_steps, dtype=jnp.int32))
            # carry out: lets the engine chain block k+1 off device-resident
            # state while block k's tokens are still in flight to the host
            return (jnp.transpose(toks), tok_l, pos_l, ring,
                    counts + n_steps, cache)

        self._block = jax.jit(decode_block,
                              static_argnames=("n_steps", "s_window",
                                               "greedy_only"),
                              donate_argnums=(3,))
        # in-flight blocks: [{"ids", "toks", "carry", "keys", "sp"}, …] — the
        # pipelined handoff (device runs blocks k+1…k+d while the host
        # inspects block k's tokens for stop conditions). Depth >2 hides the
        # fetch behind compute entirely: by consume time the oldest block
        # finished a full iteration ago, so the host pays only transfer
        # latency, not the block's compute.
        self._pending_q: list[dict] = []
        self.pipeline_depth = max(1, int(pipeline_depth))

        def prefill(params, tokens, pos, cache):
            return fwd(params, hp, tokens, pos, cache)

        self._prefill = jax.jit(prefill, donate_argnums=(3,))
        if self._embd_ok:
            self._prefill_e = jax.jit(
                lambda p, t, po, c, e: fwd(p, hp, t, po, c, embeds=e),
                donate_argnums=(3,))

            def prefill_e_ip(p, t, po, c, e1, row):
                # in-place embed chunk: only `row` carries real inputs;
                # idle rows (pos −1) read zeros, their writes are masked
                full = jnp.zeros(t.shape + e1.shape[-1:], e1.dtype)
                full = jax.lax.dynamic_update_slice(
                    full, e1, (row, jnp.int32(0), jnp.int32(0)))
                return fwd(p, hp, t, po, c, embeds=full)

            self._prefill_e_ip = jax.jit(prefill_e_ip, donate_argnums=(3,))

        def insert(big: KVCache, small: KVCache, row, n_valid):
            k = jax.lax.dynamic_update_slice(
                big.k, small.k.astype(big.k.dtype), (0, row, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(
                big.v, small.v.astype(big.v.dtype), (0, row, 0, 0, 0))
            # positions: overwrite the whole row (pad slice to row length)
            pad = big.pos.shape[1] - small.pos.shape[1]
            row_pos = jnp.pad(small.pos[0], (0, pad), constant_values=-1)
            pos = jax.lax.dynamic_update_slice(big.pos, row_pos[None, :], (row, 0))
            cursor = big.cursor.at[row].set(n_valid)
            ksc = vsc = None
            if big.k_scale is not None:   # Q8_0 KV: carry the scale planes
                ksc = jax.lax.dynamic_update_slice(
                    big.k_scale, small.k_scale, (0, row, 0, 0))
                vsc = jax.lax.dynamic_update_slice(
                    big.v_scale, small.v_scale, (0, row, 0, 0))
            return KVCache(k=k, v=v, pos=pos, cursor=cursor,
                           k_scale=ksc, v_scale=vsc)

        self._insert = jax.jit(insert, donate_argnums=(0,))

        # --- speculative decoding (draft model shadow cache) ---
        self.draft_model = draft_model
        self.n_draft = n_draft
        self.spec_translator = None
        if draft_model is not None:
            dhp = draft_model.hparams
            from .speculative import VocabTranslator, are_compatible

            if dhp.n_vocab != hp.n_vocab or (
                    model.tokenizer is not None
                    and draft_model.tokenizer is not None
                    and not are_compatible(model.tokenizer, draft_model.tokenizer)):
                if model.tokenizer is None or draft_model.tokenizer is None:
                    raise ValueError(
                        "draft/target vocab mismatch and no tokenizers to "
                        "translate through (common/speculative.cpp:89-148)")
                self.spec_translator = VocabTranslator(
                    model.tokenizer, draft_model.tokenizer)
            dfwd = get_forward(dhp.arch)

            def d_step(params, tokens, pos, cache):
                return dfwd(params, dhp, tokens, pos, cache)

            self._d_step = jax.jit(d_step, donate_argnums=(3,))
            self.d_cache = kv_cache_init(dhp.n_layer, n_slots, n_ctx,
                                         dhp.n_head_kv, dhp.head_dim,
                                         dhp.head_dim_v, dtype=kv_dtype)
            self._d_insert = jax.jit(insert, donate_argnums=(0,))
            _K = int(n_draft)

            def d_rollout(params, tail, dpos, tail_len, base_pos, cache):
                """Whole greedy draft rollout in ONE dispatch: catch-up on
                the (B, W) tail, then K-1 single-token steps under lax.scan
                with the argmax feeding the next step on-device — replaces
                the K+1 host-synchronized dispatches per speculative round
                (common/speculative.cpp:270 runs the same loop on host)."""
                logits, cache = dfwd(params, dhp, tail, dpos, cache)
                nxt = jnp.argmax(logits, axis=-1)                # (B, W)
                first = jnp.take_along_axis(
                    nxt, (tail_len - 1)[:, None], axis=1)[:, 0]
                first = first.astype(jnp.int32)
                live = dpos[:, 0] >= 0

                def body(carry, k):
                    cache, tok = carry
                    pos = jnp.where(live, base_pos + k, -1)[:, None]
                    lg, cache = dfwd(params, dhp, tok[:, None], pos, cache)
                    nt = jnp.argmax(lg[:, 0], axis=-1).astype(jnp.int32)
                    return (cache, nt), tok

                (cache, last), fed = jax.lax.scan(
                    body, (cache, first), jnp.arange(1, _K))
                drafts = jnp.concatenate([fed.T, last[:, None]], axis=1)
                return drafts, cache

            self._d_rollout = jax.jit(d_rollout, donate_argnums=(5,))
        self._truncate = jax.jit(truncate_rows, donate_argnums=(0,))
        # prefill-finalize helpers as jits so warmup() can AOT them (their
        # eager forms compiled inside the first request's timed stream —
        # ~0.4 s/op through the tunnel)
        self._first_tok = jax.jit(lambda lg, r, c: jnp.argmax(lg[r, c]))
        self._logit_row = jax.jit(lambda lg, r, c: lg[r, c])

        # context shift (evict-oldest + re-rope, server-context.cpp:1976)
        self.ctx_shift = ctx_shift
        if ctx_shift:
            from ..ops import jnp_ref as _ops
            from .kv_cache import kv_context_shift

            inv_freq, mscale = _ops.rope_frequencies(
                hp.head_dim, hp.n_rot, hp.rope_freq_base)
            self._shift = jax.jit(functools.partial(
                kv_context_shift, inv_freq=inv_freq, rope_type=hp.rope_type,
                mscale=mscale), donate_argnums=(0,))

        # n-gram lookup decoding (common/ngram-cache + examples/lookup):
        # prompt-derived drafts verified exactly like model drafts
        self.lookup_k = int(lookup_ngrams)
        self._ngrams: dict[int, Any] = {}
        self._ngram_hwm: dict[int, int] = {}

        self.slots = [_Slot(i) for i in range(n_slots)]
        self._queue: "queue.PriorityQueue" = queue.PriorityQueue()
        self._qseq = 0
        self._lock = threading.Lock()
        # serializes step() against external cache readers (slot save/
        # restore/erase from server handler threads): with the pipelined
        # block decode, request futures resolve MID-step while the chained
        # block still holds/donates the cache — a concurrent slot_save would
        # read a donated buffer
        self._step_lock = threading.RLock()
        self._running = False
        self._thread: threading.Thread | None = None
        self.metrics = {
            "n_requests": 0, "n_tokens_generated": 0, "n_prompt_tokens": 0,
            "prefill_s": 0.0, "decode_s": 0.0, "n_decode_steps": 0,
            "n_spec_drafted": 0, "n_spec_accepted": 0, "n_prompt_cached": 0,
            "n_ctx_shifts": 0,
        }

    # ----------------------------------------------------------- public API

    def submit(self, req: GenRequest) -> GenRequest:
        with self._lock:
            self._qseq += 1
            self._queue.put((-req.priority, self._qseq, req))
        self.metrics["n_requests"] += 1
        return req

    def generate(self, prompt_ids: list[int], **kw) -> dict:
        req = self.submit(GenRequest(prompt_ids=prompt_ids, **kw))
        if not self._running:
            self.run_until_drained()
        return req.result()

    def start(self):
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=5)

    def warmup(self) -> None:
        """AOT-compile every decode-window variant of the hot jits before
        serving (the llama-server warmup run, server.cpp main — but compile-
        only: abstract avals, no device data moves). Without this, the first
        request that outgrows a window bucket pays a full XLA compile inside
        its token stream (20-40 s through the axon AOT tunnel, dwarfing the
        decode itself)."""
        absify = lambda t: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
        if self.cache is None:
            # paged mode: the page topology is fixed at init, so the decode
            # and block jits AOT-lower the same way (first-request compiles
            # cost 20-40 s each through a remote-compile tunnel)
            params_a = absify(self.model.params)
            cache_a = absify(self.pkv.cache)
            B = self.n_slots
            tok = jax.ShapeDtypeStruct((B, 1), jnp.int32)
            pos = jax.ShapeDtypeStruct((B, 1), jnp.int32)
            self._decode.lower(params_a, tok, pos, cache_a).compile()
            for P in {min(b, self.page_size) for b in self.buckets}:
                tp = jax.ShapeDtypeStruct((B, P), jnp.int32)
                self._decode.lower(params_a, tp, tp, cache_a).compile()
            if self.block_size > 1:
                dsamp = self._dsamp
                sp = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                              np.asarray(v).dtype)
                      for k, v in dsamp.chain_params(
                          [None] * B, self.hp.n_vocab).items()}
                ring = jax.ShapeDtypeStruct((B, dsamp.RING), jnp.int32)
                keys = jax.ShapeDtypeStruct((B, 2), jnp.uint32)
                counts = jax.ShapeDtypeStruct((B,), jnp.int32)
                for greedy in (True, False):
                    self._block.lower(params_a, tok, pos, cache_a, ring,
                                      keys, counts, sp,
                                      n_steps=self.block_size,
                                      s_window=None,
                                      greedy_only=greedy).compile()
            return
        params_a = absify(self.model.params)
        cache_a = absify(self.cache)
        B = self.n_slots
        tok = jax.ShapeDtypeStruct((B, 1), jnp.int32)
        pos = jax.ShapeDtypeStruct((B, 1), jnp.int32)
        wins: list[int | None] = []
        w = 256
        while w < self.n_ctx:
            wins.append(w)
            w *= 2
        wins.append(None)
        if not self._win_ok:
            wins = [None]
        for win in wins:
            self._decode.lower(params_a, tok, pos, cache_a,
                               s_window=win).compile()
        keep_a = jax.ShapeDtypeStruct((B,), jnp.int32)
        self._truncate.lower(cache_a, keep_a).compile()
        i_a = jax.ShapeDtypeStruct((), jnp.int32)
        if self.kind != "dense":
            # recurrent prompts load in fully-valid power-of-two chunks
            warm_P, p = [], 1
            while p <= self.buckets[-1]:
                warm_P.append(p)
                p *= 2
        else:
            warm_P = list(self.buckets)
        for P in warm_P:            # batched in-place prompt-wave prefill
            tp = jax.ShapeDtypeStruct((B, P), jnp.int32)
            self._decode.lower(params_a, tp, tp, cache_a).compile()
            for rows in (B, 1):     # finalize helpers: wave + scratch paths
                lg_a = jax.ShapeDtypeStruct((rows, P, self.hp.n_vocab),
                                            jnp.float32)
                self._first_tok.lower(lg_a, i_a, i_a).compile()
                self._logit_row.lower(lg_a, i_a, i_a).compile()
        if self.block_size > 1:
            dsamp = self._dsamp
            sp = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                          np.asarray(v).dtype)
                  for k, v in dsamp.chain_params(
                      [None] * B, self.hp.n_vocab).items()}
            ring = jax.ShapeDtypeStruct((B, dsamp.RING), jnp.int32)
            keys = jax.ShapeDtypeStruct((B, 2), jnp.uint32)
            counts = jax.ShapeDtypeStruct((B,), jnp.int32)
            for win in wins:
                for greedy in (True, False):
                    self._block.lower(params_a, tok, pos, cache_a, ring,
                                      keys, counts, sp,
                                      n_steps=self.block_size, s_window=win,
                                      greedy_only=greedy).compile()
        # one REAL micro-wave (two 2-token prompts drained together): the
        # batched prompt-wave path involves small eager programs (transfers,
        # row-cursor truncate on donated buffers, first-token fetches) that
        # AOT lowering can't fully enumerate — each costs a compile on first
        # use (~0.4 s through a remote-compile tunnel), which otherwise lands
        # inside the first burst's TTFT (the llama-server warmup decode,
        # server.cpp main, is a real run for the same reason)
        if self.n_slots >= 2 and self.draft_model is None \
                and not self.lookup_k:
            was = self._running
            reqs = [self.submit(GenRequest(prompt_ids=[1, 2], max_tokens=2,
                                           stop_eog=False))
                    for _ in range(2)]
            if not was:
                self.run_until_drained()
            for r in reqs:
                r.result(timeout=600)
            for idx in range(min(2, self.n_slots)):
                try:
                    self.slot_erase(idx)
                except Exception:
                    pass

    def run_until_drained(self):
        """Synchronous mode: run steps until all work completes (tests/CLI)."""
        while not self._queue.empty() or any(s.state != SlotState.IDLE for s in self.slots):
            self.step()

    # ----------------------------------------------------------- engine loop

    def _loop(self):
        while self._running:
            busy = self.step()
            if not busy:
                time.sleep(0.002)

    def step(self) -> bool:
        """One scheduling iteration. Returns True if any work was done.

        Order mirrors update_slots (server-context.cpp:1947): admit waiting
        requests, advance each loading slot by ONE prompt chunk, then run a
        decode block for the generating slots — prompt loading never stalls
        generation for more than one chunk."""
        from ..utils import profiler

        with self._step_lock:
            launched = self._launch_waiting()
            with profiler.annotate("engine.prefill"):
                prefilled = self._prefill_step()
            with profiler.annotate("engine.decode"):
                decoded = self._decode_step()
            return launched or prefilled or decoded

    def _launch_waiting(self) -> bool:
        launched = False
        while True:
            free = [s for s in self.slots if s.state == SlotState.IDLE]
            if not free or self._queue.empty():
                break
            try:
                _, _, req = self._queue.get_nowait()
            except queue.Empty:
                break
            # pick the free slot with the longest cached common prefix
            def prefix_len(s: _Slot) -> int:
                n = 0
                for a, b in zip(s.cache_tokens, req.prompt_ids):
                    if a != b:
                        break
                    n += 1
                return n
            slot = max(free, key=prefix_len)
            try:
                self._start_request(slot, req)
                launched = True
            except Exception as e:  # surface errors to the caller
                req._result["error"] = str(e)
                req._done.set()
                slot.state = SlotState.IDLE  # don't leave a half-started slot
                slot.req = None
                slot.pending = []
                slot.scratch = None
                slot.pending_embeds = None
                slot.cache_tokens = []       # row contents are undefined now
        return launched

    # ------------------------------------------------ slot state save/restore

    def slot_save(self, idx: int) -> dict:
        """Snapshot a slot's KV row + token history (llama_state_seq_get_data
        counterpart, include/llama.h:835-896; powers /slots/:id?action=save)."""
        with self._step_lock:
            s = self.slots[idx]
            if s.state != SlotState.IDLE:
                raise RuntimeError(f"slot {idx} is busy")
            if self.paged:
                raise NotImplementedError(
                    "slot save/restore needs a non-paged cache")
            self._flush_pending()
            if self.kind != "dense" or self.iswa:
                return {"state": get_row(self.cache, idx),
                        "n_past": s.n_past,
                        "cache_tokens": np.asarray(s.cache_tokens, np.int32)}
            return {
                "k": np.asarray(self.cache.k[:, idx]),
                "v": np.asarray(self.cache.v[:, idx]),
                "pos": np.asarray(self.cache.pos[idx]),
                "n_past": s.n_past,
                "cache_tokens": np.asarray(s.cache_tokens, np.int32),
            }

    def slot_restore(self, idx: int, data: dict) -> int:
        """Load a snapshot into a slot row; returns the token count restored."""
        with self._step_lock:
            s = self.slots[idx]
            if s.state != SlotState.IDLE:
                raise RuntimeError(f"slot {idx} is busy")
            if self.paged:
                raise NotImplementedError(
                    "slot save/restore needs a non-paged cache")
            self._flush_pending()
            if self.kind != "dense" or self.iswa:
                self.cache = set_row(self.cache, idx, data["state"])
                s.n_past = int(data["n_past"])
                s.cache_tokens = [int(t)
                                  for t in np.asarray(data["cache_tokens"])]
                return len(s.cache_tokens)
            k = jnp.asarray(np.asarray(data["k"]), self.cache.k.dtype)
            v = jnp.asarray(np.asarray(data["v"]), self.cache.v.dtype)
            pos = jnp.asarray(np.asarray(data["pos"]), jnp.int32)
            self.cache = self.cache._replace(
                k=self.cache.k.at[:, idx].set(k),
                v=self.cache.v.at[:, idx].set(v),
                pos=self.cache.pos.at[idx].set(pos),
                cursor=self.cache.cursor.at[idx].set(int(data["n_past"])),
            )
            s.n_past = int(data["n_past"])
            s.cache_tokens = [int(t) for t in np.asarray(data["cache_tokens"])]
            return len(s.cache_tokens)

    def slot_erase(self, idx: int) -> None:
        with self._step_lock:
            s = self.slots[idx]
            if s.state != SlotState.IDLE:
                raise RuntimeError(f"slot {idx} is busy")
            if self.paged:
                self.pkv.free_seq(idx)
                s.n_past = 0
                s.cache_tokens = []
                return
            self._flush_pending()
            if self.kind != "dense" or self.iswa:
                keep = self._keep_vector()
                keep[idx] = 0
                self.cache = self._truncate(self.cache, jnp.asarray(keep))
            else:
                self.cache = self.cache._replace(
                    pos=self.cache.pos.at[idx].set(-1),
                    cursor=self.cache.cursor.at[idx].set(0),
                )
            s.n_past = 0
            s.cache_tokens = []

    def _eog_array(self) -> np.ndarray | None:
        if not hasattr(self, "_eog_arr"):
            tok = self.model.tokenizer
            if tok is None:
                self._eog_arr = None
            else:
                ids = [t for t in range(self.hp.n_vocab)
                       if tok.vocab.is_eog(t)]
                self._eog_arr = np.asarray(ids, np.int64)
        return self._eog_arr

    def _consume_row(self, s: _Slot, row: np.ndarray, fed0: int) -> int:
        """Accept a slot's block tokens. Returns the accepted count.

        Fast path (no stop strings / stream callback / grammar): the whole
        row is processed with numpy + bulk list ops — the per-token python
        loop was ~40% of the engine tax at block_size 32 — with text built
        once at finish instead of piece-by-piece."""
        nb = row.shape[0]
        req = s.req
        if req.stop_strings or req.stream is not None \
                or req.grammar is not None:
            accepted = 0
            for i in range(nb):
                t = int(row[i])
                s.n_past += 1
                s.cache_tokens.append(fed0 if i == 0 else int(row[i - 1]))
                s.sampler.accept(t)
                self._emit(s, t)
                accepted += 1
                if s.state != SlotState.GENERATING:
                    break
            return accepted

        n_acc = min(nb, req.max_tokens - len(s.generated))
        eog_hit = False
        if req.stop_eog:
            eog = self._eog_array()
            if eog is not None and eog.size:
                hits = np.nonzero(np.isin(row[:n_acc], eog))[0]
                if hits.size:
                    n_acc = int(hits[0]) + 1    # the eog token still emits
                    eog_hit = True
        acc = [int(x) for x in row[:n_acc]]
        if not s.generated and acc:
            s.t_first_token = time.perf_counter()
        s.generated.extend(acc)
        s.n_sampled += n_acc
        s.cache_tokens.append(fed0)
        s.cache_tokens.extend(acc[:-1])
        s.n_past += n_acc
        s.sampler.ctx.recent_tokens.extend(acc)
        self.metrics["n_tokens_generated"] += n_acc
        if eog_hit or len(s.generated) >= req.max_tokens \
                or (s.n_past + 1 > self.n_ctx and not self.ctx_shift):
            tok = self.model.tokenizer
            if tok is not None:
                s.text = b"".join(
                    tok.token_to_piece(t) for t in s.generated
                ).decode("utf-8", errors="replace")
            self._finish(s, "stop" if eog_hit else "length")
        return n_acc

    def _keep_vector(self) -> np.ndarray:
        """Per-row 'rows to keep' baseline for truncate_rows: a slot midway
        through an IN-PLACE prefill owns prefill_off rows in its main cache
        row even though n_past is still 0 — using n_past there would cut (or,
        for recurrent state, RESET) the half-loaded prompt."""
        keep = np.zeros(self.n_slots, np.int32)
        for s in self.slots:
            keep[s.idx] = (s.prefill_off
                           if s.state == SlotState.PREFILL and s.in_place
                           else s.n_past)
        return keep

    def _vocab_pieces(self) -> tuple[list[bytes], set[int]]:
        """Cached (token→bytes table, EOG ids) for grammar filtering."""
        if not hasattr(self, "_pieces_cache"):
            tok = self.model.tokenizer
            pieces = [tok.token_to_piece(t) for t in range(self.hp.n_vocab)]
            eos = {t for t in range(self.hp.n_vocab) if tok.vocab.is_eog(t)}
            self._pieces_cache = (pieces, eos)
        return self._pieces_cache

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _setup_sampler(self, slot: _Slot, req: GenRequest, ids: list[int]):
        slot.sampler = make_chain(**req.sampling) if req.sampling else make_chain(greedy=True)
        slot.fast = (req.grammar is None
                     and self._dsamp.chain_supported(req.sampling or {}))
        slot.seed = int((req.sampling or {}).get("seed", 0))
        slot.n_sampled = 0
        if req.grammar:
            from .sampling import GrammarSampler
            pieces, eos_ids = self._vocab_pieces()
            # after the cutting stages, before the terminal picker (the
            # reference's grammar_first=false resampling semantics): only the
            # surviving candidates get the (expensive) grammar test, with a
            # full-vocab rescan fallback inside the sampler
            chain = slot.sampler.samplers
            idx = next((i for i, s in enumerate(chain) if hasattr(s, "sample")),
                       len(chain))
            chain.insert(idx, GrammarSampler(
                req.grammar, pieces, eos_ids, lazy=req.grammar_lazy,
                trigger_patterns=req.grammar_triggers))
        for t in ids[-64:]:
            slot.sampler.ctx.recent_tokens.append(int(t))

    @staticmethod
    def _greedy_cfg(sm: dict | None) -> bool:
        """True iff plain argmax is exact for this sampling config: greedy
        AND no sampler stage that runs BEFORE Greedy in make_chain
        (LogitBias / Penalties / DRY all at no-op defaults — recent_tokens
        is seeded from the prompt, so penalties are live at the very first
        sample)."""
        sm = sm or {}
        greedy = (not sm or sm.get("greedy")
                  or sm.get("temp", 1.0) == 0.0)
        return bool(greedy) and not (
            sm.get("logit_bias")
            or sm.get("dry_multiplier", 0.0) > 0
            or sm.get("penalty_repeat", 1.0) != 1.0
            or sm.get("penalty_freq", 0.0) != 0.0
            or sm.get("penalty_present", 0.0) != 0.0)

    @classmethod
    def _greedy_fast(cls, req: GenRequest) -> bool:
        return req.grammar is None and cls._greedy_cfg(req.sampling)

    def _start_request(self, slot: _Slot, req: GenRequest):
        ids = list(req.prompt_ids)
        if not ids:
            raise ValueError("empty prompt")
        if not self.ctx_shift and len(ids) + req.max_tokens > self.n_ctx:
            raise ValueError(
                f"prompt ({len(ids)}) + max_tokens ({req.max_tokens}) exceeds n_ctx ({self.n_ctx})"
            )
        if len(ids) + 1 > self.n_ctx:
            raise ValueError(f"prompt ({len(ids)}) exceeds n_ctx ({self.n_ctx})")
        if req.prompt_embeds is not None:
            if (not self._embd_ok or self.kind != "dense" or self.paged
                    or self.draft_model is not None):
                raise ValueError(
                    "embedding-prefix prompts (multimodal chunks) need a "
                    "dense-attention forward with embeds support and a "
                    "plain engine (no paged/speculative mode)")
            pe = np.asarray(req.prompt_embeds, np.float32)
            if pe.shape[0] != len(ids):
                raise ValueError(
                    f"prompt_embeds rows ({pe.shape[0]}) must match "
                    f"prompt_ids ({len(ids)})")
        if self.draft_model is not None:
            if self.paged:
                return self._start_request_spec_paged(slot, req)
            return self._start_request_sync(slot, req)
        if self.paged:
            return self._start_request_paged(slot, req)
        self._flush_pending()
        t0 = time.perf_counter()
        n = len(ids)
        # prompt-cache common-prefix reuse (server-context.cpp prompt caching):
        # if this row already holds a long matching prefix, truncate to it and
        # prefill only the suffix IN PLACE (junk writes into other rows land
        # beyond their cursors and are masked/overwritten)
        n_cached = 0
        if slot.cache_tokens and self.kind == "dense" \
                and req.prompt_embeds is None:
            # recurrent state can't rewind to a prefix position — non-dense
            # memories always reprocess (llama_memory_recurrent semantics)
            for a, b in zip(slot.cache_tokens, ids):
                if a != b:
                    break
                n_cached += 1
            n_cached = min(n_cached, n - 1)  # keep ≥1 token for logits
            if n_cached < 16:
                n_cached = 0
            if n_cached and self.iswa:
                # the SWA ring only still holds the prefix's window if the
                # discarded tail didn't wrap over it: positions in
                # (n_cached, old_n_past] overwrite slot p−S_swa
                s_swa = self.cache.swa.max_seq
                if slot.n_past - n_cached > s_swa - self.hp.swa_window:
                    n_cached = 0
        slot.req = req
        slot.state = SlotState.PREFILL
        slot.n_prompt = n
        slot.generated = []
        slot.text = ""
        slot.t_start = t0
        if n_cached:
            keep = self._keep_vector()
            keep[slot.idx] = n_cached
            self.cache = self._truncate(self.cache, jnp.asarray(keep))
            slot.in_place = True
            slot.pending = ids[n_cached:]
            slot.prefill_off = n_cached
            slot.scratch = None
            self.metrics["n_prompt_cached"] += n_cached
        elif self.kind != "dense" or self.iswa:
            # in-place prefill: reset this row (truncate_rows resets rows
            # with keep==0 / invalidates ring positions), keep the others.
            # Recurrent rows load fully-valid pow2 chunks; iswa rows load
            # normal padded buckets (ring writes at pos −1 are dropped).
            keep = self._keep_vector()
            keep[slot.idx] = 0
            self.cache = self._truncate(self.cache, jnp.asarray(keep))
            slot.in_place = True
            slot.pending = ids
            slot.prefill_off = 0
            slot.scratch = None
        else:
            slot.in_place = False
            slot.pending = ids
            slot.prefill_off = 0
            slot.scratch = kv_cache_init(
                self.hp.n_layer, 1, self.n_ctx, self.hp.n_head_kv,
                self.hp.head_dim, self.hp.head_dim_v, dtype=self.kv_dtype)
        slot.prefill_P = (pow2_chunk(len(slot.pending), self.buckets[-1])
                          if self.kind != "dense"
                          else self._bucket(len(slot.pending)))
        slot.pending_embeds = (None if req.prompt_embeds is None
                               else np.asarray(req.prompt_embeds, np.float32))
        # placeholder ids under embed chunks must never seed prefix reuse
        slot.cache_tokens = [] if req.prompt_embeds is not None else list(ids)
        self._setup_sampler(slot, req, ids)
        self.metrics["n_prompt_tokens"] += n

    def _start_request_paged(self, slot: _Slot, req: GenRequest):
        """Paged-mode admission: reuse a cached common prefix (trim the page
        chain to it) or reclaim the slot's pages, then queue the rest of the
        prompt for chunked in-place prefill (chunks capped at page size)."""
        ids = list(req.prompt_ids)
        n_cached = 0
        if slot.cache_tokens and req.prompt_embeds is None:
            for a, b in zip(slot.cache_tokens, ids):
                if a != b:
                    break
                n_cached += 1
            n_cached = min(n_cached, len(ids) - 1)
            if n_cached < 16:
                n_cached = 0
        if n_cached and self.pkv.trim_to_position(slot.idx, n_cached):
            self.metrics["n_prompt_cached"] += n_cached
        else:
            n_cached = 0
            self.pkv.free_seq(slot.idx)
        slot.req = req
        slot.state = SlotState.PREFILL
        slot.n_prompt = len(ids)
        slot.generated = []
        slot.text = ""
        slot.t_start = time.perf_counter()
        slot.in_place = True
        slot.pending = ids[n_cached:]
        slot.prefill_off = n_cached
        slot.scratch = None
        slot.prefill_P = min(self._bucket(len(slot.pending)), self.page_size)
        slot.cache_tokens = list(ids)
        self._setup_sampler(slot, req, ids)
        self.metrics["n_prompt_tokens"] += len(ids)

    def _paged_prefill_chunk(self, slot: _Slot) -> None:
        """One prompt chunk into the slot's page chain (≤ page_size tokens);
        other rows ride along masked (NULL page)."""
        t0 = time.perf_counter()
        mgr = self.pkv
        P = slot.prefill_P
        chunk = slot.pending[:P]
        mgr.ensure_resident(slot.idx)
        mgr.pin(slot.idx, True)
        try:
            mgr.plan_step({slot.idx: len(chunk)})
            tok = np.zeros((self.n_slots, P), np.int32)
            pos = np.full((self.n_slots, P), -1, np.int32)
            tok[slot.idx, : len(chunk)] = chunk
            pos[slot.idx, : len(chunk)] = np.arange(
                slot.prefill_off, slot.prefill_off + len(chunk))
            logits, cache = self._decode(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                mgr.cache)
            mgr.finish_step(cache)
        finally:
            mgr.pin(slot.idx, False)
        slot.pending = slot.pending[len(chunk):]
        slot.prefill_off += len(chunk)
        self.metrics["prefill_s"] += time.perf_counter() - t0
        if not slot.pending:
            last_logits = np.asarray(logits[slot.idx, len(chunk) - 1],
                                     np.float32)
            slot.state = SlotState.GENERATING
            slot.n_past = slot.n_prompt
            self._emit(slot, slot.sampler.sample(last_logits))

    def _prefill_step(self) -> bool:
        """Advance every loading slot by ONE prompt chunk (then let decode
        run): the chunk-interleave that keeps generating streams flowing
        while a long prompt loads."""
        worked = False
        finals: list[tuple] = []
        loading = [s for s in self.slots if s.state == SlotState.PREFILL]
        # mid-scratch slots (in_place=False, prefill_off>0) must stay on the
        # per-slot path: their prefilled chunks live only in slot.scratch, so
        # truncating their MAIN row to prefill_off would expose the PREVIOUS
        # request's KV and the wave would discard the scratch un-inserted.
        batch = ([] if self.paged or self.kind != "dense" else
                 [s for s in loading
                  if s.pending and s.pending_embeds is None
                  and (s.in_place or s.prefill_off == 0)])
        if len(batch) >= 2:
            # batched prompt wave: one truncate (resets each loading row's
            # cursor to its offset — a no-op for continuing rows) + ONE
            # (n_slots, P) in-place dispatch carries every loading prompt's
            # next chunk. A burst of N arrivals pays 2 dispatches instead of
            # N prefills + N inserts (server-context update_slots admits a
            # whole wave per iteration too).
            t0 = time.perf_counter()
            P = max(s.prefill_P for s in batch)
            keep = self._keep_vector()
            for s in batch:
                keep[s.idx] = s.prefill_off
            self.cache = self._truncate(self.cache, jnp.asarray(keep))
            tok = np.zeros((self.n_slots, P), np.int32)
            pos = np.full((self.n_slots, P), -1, np.int32)
            for s in batch:
                chunk = s.pending[:P]
                tok[s.idx, : len(chunk)] = chunk
                pos[s.idx, : len(chunk)] = np.arange(
                    s.prefill_off, s.prefill_off + len(chunk))
            logits, self.cache = self._decode(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                self.cache)
            for s in batch:
                chunk = s.pending[:P]
                s.pending = s.pending[len(chunk):]
                s.prefill_off += len(chunk)
                s.in_place = True         # later chunks continue in place
                s.scratch = None
                if not s.pending:
                    greedy = self._greedy_fast(s.req)
                    # np.int32: weak-typed Python ints would miss the
                    # AOT-compiled (non-weak) signature and recompile
                    val = (self._first_tok if greedy else self._logit_row)(
                        logits, np.int32(s.idx), np.int32(len(chunk) - 1))
                    try:
                        val.copy_to_host_async()
                    except Exception:
                        pass
                    finals.append((s, val, greedy))
            self.metrics["prefill_s"] += time.perf_counter() - t0
            worked = True
            loading = [s for s in loading if s not in batch]
        for slot in loading:
            if self.paged:
                try:
                    self._paged_prefill_chunk(slot)
                except Exception as e:   # pool exhausted etc → fail request
                    slot.req._result["error"] = str(e)
                    slot.req._done.set()
                    slot.state = SlotState.IDLE
                    slot.req = None
                    slot.pending = []
                    self.pkv.free_seq(slot.idx)
                worked = True
                continue
            t0 = time.perf_counter()
            P = slot.prefill_P
            chunk = slot.pending[:P]
            if slot.in_place:
                tok = np.zeros((self.n_slots, P), np.int32)
                pos = np.full((self.n_slots, P), -1, np.int32)
                tok[slot.idx, : len(chunk)] = chunk
                pos[slot.idx, : len(chunk)] = np.arange(
                    slot.prefill_off, slot.prefill_off + len(chunk))
                if slot.pending_embeds is not None:
                    E = slot.pending_embeds.shape[-1]
                    emb = np.zeros((1, P, E), np.float32)
                    emb[0, : len(chunk)] = slot.pending_embeds[
                        slot.prefill_off : slot.prefill_off + len(chunk)]
                    logits, self.cache = self._prefill_e_ip(
                        self.model.params, jnp.asarray(tok),
                        jnp.asarray(pos), self.cache, jnp.asarray(emb),
                        np.int32(slot.idx))
                else:
                    logits, self.cache = self._decode(
                        self.model.params, jnp.asarray(tok),
                        jnp.asarray(pos), self.cache)
                row = slot.idx
            else:
                tok = np.zeros((1, P), np.int32)
                pos = np.full((1, P), -1, np.int32)
                tok[0, : len(chunk)] = chunk
                pos[0, : len(chunk)] = np.arange(
                    slot.prefill_off, slot.prefill_off + len(chunk))
                if slot.pending_embeds is not None:
                    E = slot.pending_embeds.shape[-1]
                    emb = np.zeros((1, P, E), np.float32)
                    emb[0, : len(chunk)] = slot.pending_embeds[
                        slot.prefill_off : slot.prefill_off + len(chunk)]
                    logits, slot.scratch = self._prefill_e(
                        self.model.params, jnp.asarray(tok),
                        jnp.asarray(pos), slot.scratch, jnp.asarray(emb))
                else:
                    logits, slot.scratch = self._prefill(
                        self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                        slot.scratch)
                row = 0
            slot.pending = slot.pending[len(chunk):]
            slot.prefill_off += len(chunk)
            self.metrics["prefill_s"] += time.perf_counter() - t0
            worked = True
            if slot.pending:
                if self.kind != "dense":    # next fully-valid pow2 chunk
                    slot.prefill_P = pow2_chunk(len(slot.pending),
                                                self.buckets[-1])
                continue
            # last chunk: finalize — insert now (device-side) but DEFER the
            # first-token fetch so every finishing slot's copy overlaps (one
            # host round-trip for the whole wave, not one per slot). Greedy
            # requests additionally argmax on device and fetch 4 bytes
            # instead of serializing the n_vocab logits row through the
            # (possibly slow) host link — the TTFT tail.
            if not slot.in_place:
                self.cache = self._insert(self.cache, slot.scratch, slot.idx,
                                          slot.n_prompt)
                slot.scratch = None
            slot.pending_embeds = None
            greedy = self._greedy_fast(slot.req)
            val = (self._first_tok if greedy else self._logit_row)(
                logits, np.int32(row), np.int32(len(chunk) - 1))
            try:
                val.copy_to_host_async()
            except Exception:
                pass
            finals.append((slot, val, greedy))
        for slot, val, greedy in finals:
            slot.state = SlotState.GENERATING
            slot.n_past = slot.n_prompt
            if greedy:
                tok1 = int(np.asarray(val))
                slot.sampler.accept(tok1)    # sample() would accept too
                self._emit(slot, tok1)
            else:
                self._emit(slot, slot.sampler.sample(
                    np.asarray(val, np.float32)))
        return worked

    def _start_request_sync(self, slot: _Slot, req: GenRequest):
        """Whole-prompt synchronous start (speculative-decoding engines: the
        draft shadow cache prefills in lock-step with the target)."""
        ids = list(req.prompt_ids)
        t0 = time.perf_counter()
        n = len(ids)
        P = self._bucket(n)
        # prompts longer than the biggest bucket prefill in several passes
        scratch = kv_cache_init(self.hp.n_layer, 1, self.n_ctx, self.hp.n_head_kv,
                                self.hp.head_dim, self.hp.head_dim_v, dtype=self.kv_dtype)
        off = 0
        logits = None
        while off < n:
            chunk = ids[off : off + P]
            tok = np.full((1, P), 0, np.int32)
            pos = np.full((1, P), -1, np.int32)
            tok[0, : len(chunk)] = chunk
            pos[0, : len(chunk)] = np.arange(off, off + len(chunk))
            logits, scratch = self._prefill(
                self.model.params, jnp.asarray(tok), jnp.asarray(pos), scratch)
            off += len(chunk)
        last_idx = (n - 1) % P if n % P != 0 else P - 1
        last_logits = np.asarray(logits[0, last_idx], np.float32)

        self.cache = self._insert(self.cache, scratch, slot.idx, n)
        del scratch

        slot.req = req
        slot.state = SlotState.GENERATING
        slot.n_past = n
        slot.n_prompt = n
        slot.generated = []
        slot.cache_tokens = list(ids)
        slot.text = ""
        slot.t_start = t0
        self._setup_sampler(slot, req, ids)
        self.metrics["n_prompt_tokens"] += n
        self.metrics["prefill_s"] += time.perf_counter() - t0

        self._draft_prefill_prompt(slot, ids, P)

        # sample the first token from the prefill logits
        self._emit(slot, slot.sampler.sample(last_logits))
        if slot.state == SlotState.GENERATING:
            slot.draft_tail = [slot.generated[-1]]

    def _draft_prefill_prompt(self, slot: _Slot, ids: list[int],
                              P: int) -> None:
        """Draft-model shadow prefill of the prompt (retokenized into the
        draft vocab when translating) — the draft cache stays dense even
        when the target is paged."""
        dhp = self.draft_model.hparams
        d_ids = (self.spec_translator.tgt_to_dft([int(t) for t in ids])
                 if self.spec_translator is not None else ids)
        dn = len(d_ids)
        d_scratch = kv_cache_init(dhp.n_layer, 1, self.n_ctx, dhp.n_head_kv,
                                  dhp.head_dim, dhp.head_dim_v,
                                  dtype=self.kv_dtype)
        off = 0
        while off < dn:
            chunk = d_ids[off : off + P]
            tok = np.full((1, P), 0, np.int32)
            dpos = np.full((1, P), -1, np.int32)
            tok[0, : len(chunk)] = chunk
            dpos[0, : len(chunk)] = np.arange(off, off + len(chunk))
            _, d_scratch = self._d_step(
                self.draft_model.params, jnp.asarray(tok),
                jnp.asarray(dpos), d_scratch)
            off += len(chunk)
        self.d_cache = self._d_insert(self.d_cache, d_scratch, slot.idx, dn)
        slot.d_past = dn

    def _start_request_spec_paged(self, slot: _Slot, req: GenRequest):
        """Speculative + paged admission: synchronous chunked prompt prefill
        into the slot's page chain, then the dense draft shadow prefill."""
        ids = list(req.prompt_ids)
        t0 = time.perf_counter()
        n = len(ids)
        mgr = self.pkv
        mgr.free_seq(slot.idx)
        slot.req = req
        slot.state = SlotState.GENERATING
        slot.n_past = n
        slot.n_prompt = n
        slot.generated = []
        slot.cache_tokens = list(ids)
        slot.text = ""
        slot.t_start = t0
        self._setup_sampler(slot, req, ids)
        self.metrics["n_prompt_tokens"] += n

        P = min(self._bucket(n), self.page_size)
        mgr.ensure_resident(slot.idx)
        mgr.pin(slot.idx, True)
        logits = None
        last_len = 0
        try:
            off = 0
            while off < n:
                chunk = ids[off : off + P]
                mgr.plan_step({slot.idx: len(chunk)})
                tok = np.zeros((self.n_slots, P), np.int32)
                pos = np.full((self.n_slots, P), -1, np.int32)
                tok[slot.idx, : len(chunk)] = chunk
                pos[slot.idx, : len(chunk)] = np.arange(off, off + len(chunk))
                logits, cache = self._decode(
                    self.model.params, jnp.asarray(tok), jnp.asarray(pos),
                    mgr.cache)
                mgr.finish_step(cache)
                off += len(chunk)
                last_len = len(chunk)
        finally:
            mgr.pin(slot.idx, False)
        last_logits = np.asarray(logits[slot.idx, last_len - 1], np.float32)
        self.metrics["prefill_s"] += time.perf_counter() - t0

        self._draft_prefill_prompt(slot, ids, P)
        self._emit(slot, slot.sampler.sample(last_logits))
        if slot.state == SlotState.GENERATING:
            slot.draft_tail = [slot.generated[-1]]

    def _flush_pending(self) -> None:
        """Land any in-flight pipelined block before a non-block cache
        mutation (legacy decode, context shift, slot ops, prompt-cache
        truncate) — those paths compute keep vectors from host n_past and
        would otherwise cut the block's still-unconsumed KV rows."""
        q, self._pending_q = self._pending_q, []
        nb = self.block_size
        while q:
            pend = q.pop(0)
            self._consume_block(pend, inflight_extra=nb * len(q))

    def _paged_pick(self, active: list[_Slot]) -> list[_Slot]:
        """Swap-scheduling admission: pick slots whose page chains fit the
        pool this step (round-robin fairness); the rest wait preempted, their
        pages LRU-spill to host as the admitted seqs allocate."""
        mgr = self.pkv
        cap = mgr.n_pool_pages
        order = (active[self._paged_rr % len(active):]
                 + active[: self._paged_rr % len(active)])
        self._paged_rr += 1
        picked, used = [], 0
        for s in order:
            need = mgr.seq_pages(s.idx) + 1     # +1: potential new open page
            if used + need <= cap:
                picked.append(s)
                used += need
        if not picked:
            raise RuntimeError(
                f"page pool too small for any sequence (cap {cap} pages)")
        return picked

    def _paged_block_decode_step(self, active: list[_Slot]) -> bool:
        """Multi-token decode block on the paged cache: pages for the whole
        block are planned up front (plan_step guarantees one page per row),
        the on-device block scan appends within that static table, and stops
        roll back partially through PagedKVManager.rollback — continuous
        batching + paging without a per-token host round-trip."""
        t0 = time.perf_counter()
        mgr = self.pkv
        picked = self._paged_pick(active)
        if not picked:
            return True
        dsamp = self._dsamp
        B, nb = self.n_slots, self.block_size
        tok0 = np.zeros((B, 1), np.int32)
        pos0 = np.full((B, 1), -1, np.int32)
        ring = np.full((B, dsamp.RING), -1, np.int32)
        base_keys = np.zeros((B, 2), np.uint32)
        counts = np.zeros(B, np.int32)
        cfgs: list[dict | None] = [None] * B
        for s in picked:
            tok0[s.idx, 0] = s.generated[-1]
            pos0[s.idx, 0] = s.n_past
            recent = s.sampler.ctx.recent_tokens[-dsamp.RING:]
            if recent:
                ring[s.idx, -len(recent):] = recent
            base_keys[s.idx] = (s.seed >> 32 & 0xFFFFFFFF, s.seed & 0xFFFFFFFF)
            counts[s.idx] = s.n_sampled
            cfgs[s.idx] = s.req.sampling or {"greedy": True}
        sp_key = tuple((s.idx, s.req.request_id) for s in picked)
        if getattr(self, "_sp_key", None) == sp_key:
            sp = self._sp_dev
        else:
            sp = {k: jnp.asarray(v)
                  for k, v in dsamp.chain_params(cfgs, self.hp.n_vocab).items()}
            self._sp_key, self._sp_dev = sp_key, sp
        greedy = all(c is None or self._greedy_cfg(c) for c in cfgs)
        saved = {s.idx: mgr.save_cursor(s.idx) for s in picked}
        try:
            for s in picked:
                mgr.ensure_resident(s.idx)
                mgr.pin(s.idx, True)
            mgr.plan_step({s.idx: nb for s in picked})
            toks, _, _, _, _, cache = self._block(
                self.model.params, jnp.asarray(tok0), jnp.asarray(pos0),
                mgr.cache, jnp.asarray(ring), jnp.asarray(base_keys),
                jnp.asarray(counts), sp, n_steps=nb, s_window=None,
                greedy_only=greedy)
            mgr.finish_step(cache)
        finally:
            for s in picked:
                mgr.pin(s.idx, False)
        toks_np = np.asarray(toks)
        for s in picked:
            accepted = self._consume_row(s, toks_np[s.idx],
                                         int(tok0[s.idx, 0]))
            if accepted < nb:
                mgr.rollback(s.idx, saved[s.idx], accepted, nb)
        self.metrics["paged"] = dict(mgr.stats)
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _paged_decode_step(self, active: list[_Slot]) -> bool:
        """One decode token for every admitted slot through the paged cache
        (paged_flash_attention over the page tables); host sampling."""
        t0 = time.perf_counter()
        mgr = self.pkv
        picked = self._paged_pick(active)
        try:
            for s in picked:
                mgr.ensure_resident(s.idx)
                mgr.pin(s.idx, True)
            mgr.plan_step({s.idx: 1 for s in picked})
            tokens = np.zeros((self.n_slots, 1), np.int32)
            pos = np.full((self.n_slots, 1), -1, np.int32)
            for s in picked:
                tokens[s.idx, 0] = s.generated[-1]
                pos[s.idx, 0] = s.n_past
            logits, cache = self._decode(
                self.model.params, jnp.asarray(tokens), jnp.asarray(pos),
                mgr.cache)
            mgr.finish_step(cache)
        finally:
            for s in picked:
                mgr.pin(s.idx, False)
        logits_np = np.asarray(logits[:, 0], np.float32)
        for s in picked:
            s.n_past += 1
            s.cache_tokens.append(s.generated[-1])
            self._emit(s, s.sampler.sample(logits_np[s.idx]))
        self.metrics["paged"] = dict(mgr.stats)
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _decode_step(self) -> bool:
        active = [s for s in self.slots if s.state == SlotState.GENERATING]
        if not active:
            return False
        if self.paged:
            if self.ctx_shift:
                self._maybe_paged_context_shift(active)
            if self.draft_model is not None and all(
                    s.n_past + self.n_draft + 1 <= self.n_ctx
                    for s in active):
                return self._spec_decode_step(active)
            if self.lookup_k and all(
                    s.n_past + self.lookup_k + 1 <= self.n_ctx
                    for s in active):
                if self._lookup_decode_step(active):
                    return True
            if (self.block_size > 1 and all(s.fast for s in active)
                    and all(s.n_past + nb_ctx <= self.n_ctx
                            for s in active
                            for nb_ctx in (self.block_size + 1,))):
                return self._paged_block_decode_step(active)
            return self._paged_decode_step(active)
        if self.ctx_shift:
            self._maybe_context_shift(active)
        if self.draft_model is not None and all(
                s.n_past + self.n_draft + 1 <= self.n_ctx for s in active):
            if self.spec_translator is not None:
                return self._spec_translate_step(active)
            return self._spec_decode_step(active)
        if self.lookup_k and all(
                s.n_past + self.lookup_k + 1 <= self.n_ctx for s in active):
            if self._lookup_decode_step(active):
                return True
        if (self.block_size > 1 and self.draft_model is None
                and not self.lookup_k
                and all(s.fast for s in active)
                and all(s.n_past + 2 * self.block_size + 1 <= self.n_ctx
                        for s in active)):
            return self._block_decode_step(active)
        self._flush_pending()
        t0 = time.perf_counter()
        tokens = np.zeros((self.n_slots, 1), np.int32)
        pos = np.full((self.n_slots, 1), -1, np.int32)
        for s in active:
            tokens[s.idx, 0] = s.generated[-1]
            pos[s.idx, 0] = s.n_past
        logits, self.cache = self._decode(
            self.model.params, jnp.asarray(tokens), jnp.asarray(pos),
            self.cache, s_window=self._s_bucket(
                max(s.n_past for s in active) + 2))
        logits_np = np.asarray(logits[:, 0], np.float32)
        for s in active:
            s.n_past += 1
            s.cache_tokens.append(s.generated[-1])  # fed token entered cache
            self._emit(s, s.sampler.sample(logits_np[s.idx]))
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _s_bucket(self, need: int) -> int | None:
        """Decode-length bucket: smallest power-of-2 slot window ≥ need
        (min 256). None = full n_ctx (no read-side cap). Bounded compile
        count: log2(n_ctx/256) windows."""
        if not self._win_ok:
            return None
        w = 256
        while w < need:
            w *= 2
        return w if w < self.n_ctx else None

    def _launch_block(self, active: list[_Slot]) -> dict:
        """Dispatch one decode block from host-built inputs."""
        dsamp = self._dsamp
        B, nb = self.n_slots, self.block_size
        tok0 = np.zeros((B, 1), np.int32)
        pos0 = np.full((B, 1), -1, np.int32)
        ring = np.full((B, dsamp.RING), -1, np.int32)
        base_keys = np.zeros((B, 2), np.uint32)
        counts = np.zeros(B, np.int32)
        cfgs: list[dict | None] = [None] * B
        for s in active:
            tok0[s.idx, 0] = s.generated[-1]
            pos0[s.idx, 0] = s.n_past
            recent = s.sampler.ctx.recent_tokens[-dsamp.RING:]
            if recent:
                ring[s.idx, -len(recent):] = recent
            # threefry key from the seed (PRNGKey layout, built host-side)
            base_keys[s.idx] = (s.seed >> 32 & 0xFFFFFFFF, s.seed & 0xFFFFFFFF)
            counts[s.idx] = s.n_sampled
            cfgs[s.idx] = s.req.sampling or {"greedy": True}
        # the device-side chain params only change when the request set
        # changes — skip the rebuild + H2D transfers on relaunches
        sp_key = tuple((s.idx, s.req.request_id) for s in active)
        if getattr(self, "_sp_key", None) == sp_key:
            sp = self._sp_dev
        else:
            sp = {k: jnp.asarray(v)
                  for k, v in dsamp.chain_params(cfgs, self.hp.n_vocab).items()}
            self._sp_key, self._sp_dev = sp_key, sp
        keys = jnp.asarray(base_keys)
        win = self._s_bucket(max(s.n_past for s in active) + 2 * nb + 1)
        greedy = all(c is None or self._greedy_cfg(c) for c in cfgs)
        toks, tok_l, pos_l, ring_d, counts_d, self.cache = self._block(
            self.model.params, jnp.asarray(tok0), jnp.asarray(pos0),
            self.cache, jnp.asarray(ring), keys, jnp.asarray(counts), sp,
            n_steps=nb, s_window=win, greedy_only=greedy)
        try:  # start the D2H copy NOW: by consume time (one pipelined block
            # later) the tokens are already host-resident instead of paying
            # a full tunnel round-trip inside the hot loop
            toks.copy_to_host_async()
        except Exception:
            pass
        return {"ids": tuple(s.idx for s in active), "toks": toks,
                "fed0": {s.idx: int(tok0[s.idx, 0]) for s in active},
                "carry": (tok_l, pos_l, ring_d, counts_d),
                "keys": keys, "sp": sp, "win": win, "greedy": greedy}

    def _chain_block(self, pend: dict) -> dict:
        """Dispatch the next block straight off the previous block's
        device-resident carry — no host round-trip on the launch side."""
        tok_l, pos_l, ring_d, counts_d = pend["carry"]
        toks, tok_l2, pos_l2, ring2, counts2, self.cache = self._block(
            self.model.params, tok_l, pos_l, self.cache, ring_d,
            pend["keys"], counts_d, pend["sp"], n_steps=self.block_size,
            s_window=pend["win"], greedy_only=pend["greedy"])
        try:
            toks.copy_to_host_async()
        except Exception:
            pass
        return {"ids": pend["ids"], "toks": toks, "fed0": None,
                "carry": (tok_l2, pos_l2, ring2, counts2),
                "keys": pend["keys"], "sp": pend["sp"], "win": pend["win"],
                "greedy": pend["greedy"]}

    def _consume_block(self, pend: dict, inflight_extra: int = 0) -> None:
        """Fetch a landed block's tokens, emit per slot, roll back overshoot.

        ``fed0`` is None for chained blocks — the first fed token is then the
        last token the host accepted for that slot (generated[-1]).
        ``inflight_extra``: KV rows a still-outstanding chained block has
        already appended for surviving slots — the rollback truncate must not
        cut those."""
        nb = self.block_size
        toks = np.asarray(pend["toks"])
        keep = self._keep_vector()
        overshoot = False
        for idx in pend["ids"]:
            s = self.slots[idx]
            if s.req is None or s.state != SlotState.GENERATING:
                overshoot = True             # slot stopped earlier: discard
                continue
            fed0 = (pend["fed0"][idx] if pend["fed0"] is not None
                    else s.generated[-1])
            accepted = self._consume_row(s, toks[idx], fed0)
            if accepted < nb:
                overshoot = True             # rows advanced nb; roll back
            keep[s.idx] = s.n_past
            if s.state == SlotState.GENERATING:
                keep[s.idx] += inflight_extra
        if overshoot:
            self.cache = self._truncate(self.cache, jnp.asarray(keep))

    def _block_decode_step(self, active: list[_Slot]) -> bool:
        """Pipelined block decode: launch block k+1 off device-resident carry
        BEFORE fetching block k's tokens, so the host stop-condition pass
        overlaps device compute (the reference's per-token host sync is ~µs
        on a local PCIe GPU; on a TPU pod/tunnel the overlap is mandatory).
        Stops discovered in block k invalidate a stopped slot's rows in the
        already-launched block k+1 — that block is then landed immediately
        (surviving slots still emit from it; stopped rows roll back), so a
        non-empty pending block always covers exactly the generating set."""
        t0 = time.perf_counter()
        nb = self.block_size
        q = self._pending_q
        cur_ids = tuple(s.idx for s in active)
        max_past = max(s.n_past for s in active)
        win_ok = all(p["win"] is None
                     or max_past + (len(q) + 1) * nb + 1 <= p["win"]
                     for p in q)
        if q and (q[0]["ids"] != cur_ids or not win_ok):
            # active set grew (a prefill finalized) or the slot window is
            # outgrown: land the whole pipeline; the next step relaunches
            self._flush_pending()
        else:
            if not q:
                q.append(self._launch_block(active))
            # top up the pipeline while the window covers the extra depth —
            # but never past every slot's max_tokens budget: a block no slot
            # can use computes nb full steps and then rolls back (pure waste;
            # it made the drain tail 2 blocks deep on every request).
            # EOG/stop-string stops stay speculative (unknowable host-side);
            # max_tokens is deterministic.
            need = max(s.req.max_tokens - len(s.generated) for s in active)
            while len(q) < self.pipeline_depth and need > len(q) * nb:
                last_win = q[-1]["win"]
                if (last_win is not None
                        and max_past + (len(q) + 1) * nb + 1 > last_win):
                    break
                q.append(self._chain_block(q[-1]))
            pend = q.pop(0)
            self._consume_block(pend, inflight_extra=nb * len(q))
            if tuple(i for i in pend["ids"]
                     if self.slots[i].state == SlotState.GENERATING) != pend["ids"]:
                # a stop landed: drain the chained blocks now (survivors
                # emit, stopped rows roll back) so idle slots are reusable
                self._flush_pending()
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _maybe_context_shift(self, active: list[_Slot]) -> None:
        """Evict the oldest half of the post-keep window for any slot about to
        overflow (context-shift herding: seq_rm + seq_add + rope-rerun)."""
        keep = np.zeros(self.n_slots, np.int32)
        discard = np.zeros(self.n_slots, np.int32)
        hit = []
        for s in active:
            if s.n_past + 1 > self.n_ctx - 1:
                n_keep = min(s.n_prompt, self.n_ctx // 4)
                n_discard = max((s.n_past - n_keep) // 2, 1)
                keep[s.idx] = n_keep
                discard[s.idx] = n_discard
                hit.append((s, n_keep, n_discard))
        if not hit:
            return
        self.cache = self._shift(self.cache, jnp.asarray(keep),
                                 jnp.asarray(discard))
        for s, n_keep, n_discard in hit:
            s.n_past -= n_discard
            s.cache_tokens = (s.cache_tokens[:n_keep]
                              + s.cache_tokens[n_keep + n_discard:])
            self.metrics["n_ctx_shifts"] += 1

    def _maybe_paged_context_shift(self, active: list[_Slot]) -> None:
        """Context shift for paged slots: export the page chain to a dense
        row, run the same evict+re-rope+compact (kv_context_shift), and
        re-page the survivors. Rare (once per n_ctx/2 tokens per slot), so
        the extra host round-trip is acceptable."""
        from .kv_cache import KVCache

        mgr = self.pkv
        for s in active:
            if s.n_past + 1 <= self.n_ctx - 1:
                continue
            n_keep = min(s.n_prompt, self.n_ctx // 4)
            n_discard = max((s.n_past - n_keep) // 2, 1)
            k, v, pos = mgr.export_row(s.idx)
            n_cells = pos.shape[0]
            S = self.n_ctx                      # fixed shape → one compile
            pad = S - n_cells
            kd = np.zeros(k.shape[:2] + (S,) + k.shape[3:], np.float32)
            vd = np.zeros(v.shape[:2] + (S,) + v.shape[3:], np.float32)
            pd = np.full((S,), -1, np.int32)
            kd[:, :, :n_cells] = np.asarray(k, np.float32)
            vd[:, :, :n_cells] = np.asarray(v, np.float32)
            pd[:n_cells] = pos
            row = KVCache(
                k=jnp.asarray(kd[:, None], self.kv_dtype),
                v=jnp.asarray(vd[:, None], self.kv_dtype),
                pos=jnp.asarray(pd[None]),
                cursor=jnp.asarray([int((pd >= 0).sum())], jnp.int32))
            shifted = self._shift(row, jnp.asarray([n_keep], np.int32),
                                  jnp.asarray([n_discard], np.int32))
            n_new = int(np.asarray(shifted.cursor)[0])
            mgr.import_row(
                s.idx,
                np.asarray(shifted.k[:, 0, :, :n_new]),
                np.asarray(shifted.v[:, 0, :, :n_new]),
                np.asarray(shifted.pos[0, :n_new]))
            s.n_past -= n_discard
            s.cache_tokens = (s.cache_tokens[:n_keep]
                              + s.cache_tokens[n_keep + n_discard:])
            self.metrics["n_ctx_shifts"] += 1

    def _lookup_decode_step(self, active: list[_Slot]) -> bool:
        """One lookup-decoding round: n-gram drafts per slot (possibly of
        different lengths, possibly none) → batched target verify → accept.
        Returns False when no slot produced a draft (caller falls through to
        the plain decode step)."""
        from .ngram import NgramCache

        K, B = self.lookup_k, self.n_slots
        drafts = np.zeros((B, K), np.int32)
        lens = np.zeros(B, np.int32)
        for s in active:
            seq = s.cache_tokens + s.generated[-1:]
            ng = self._ngrams.get(s.idx)
            hwm = self._ngram_hwm.get(s.idx, 0)
            if ng is None or hwm > len(seq):
                ng = self._ngrams[s.idx] = NgramCache()
                hwm = 0
            if len(seq) > hwm:
                ng.extend(seq[max(hwm - ng.n_max, 0):hwm], seq[hwm:])
                self._ngram_hwm[s.idx] = len(seq)
            d = ng.draft(seq, K)
            lens[s.idx] = len(d)
            drafts[s.idx, :len(d)] = d
        if not lens.any():
            return False

        t0 = time.perf_counter()
        vtok = np.zeros((B, K + 1), np.int32)
        vpos = np.full((B, K + 1), -1, np.int32)
        for s in active:
            vtok[s.idx, 0] = s.generated[-1]
            vtok[s.idx, 1:] = drafts[s.idx]
            vpos[s.idx] = s.n_past + np.arange(K + 1)
        saved_cur: dict[int, tuple] = {}
        if self.paged:
            mgr = self.pkv
            try:
                for s in active:
                    mgr.ensure_resident(s.idx)
                    mgr.pin(s.idx, True)
                saved_cur = {s.idx: mgr.save_cursor(s.idx) for s in active}
                mgr.plan_step({s.idx: K + 1 for s in active})
                vlogits, cache = self._decode(
                    self.model.params, jnp.asarray(vtok), jnp.asarray(vpos),
                    mgr.cache)
                mgr.finish_step(cache)
            finally:
                for s in active:
                    mgr.pin(s.idx, False)
        else:
            vlogits, self.cache = self._decode(
                self.model.params, jnp.asarray(vtok), jnp.asarray(vpos),
                self.cache)
        vlogits = np.asarray(vlogits, np.float32)

        keep_t = np.zeros(B, np.int32)
        for s in self.slots:
            keep_t[s.idx] = s.n_past
        for s in active:
            L = int(lens[s.idx])
            n_past0 = s.n_past
            accepted = 0
            for i in range(L + 1):
                t = s.sampler.sample(vlogits[s.idx, i])
                self._emit(s, t)
                if i < L and t == int(drafts[s.idx, i]) and \
                        s.state == SlotState.GENERATING:
                    accepted += 1
                    continue
                break
            self.metrics["n_spec_drafted"] += L
            self.metrics["n_spec_accepted"] += accepted
            s.n_past = n_past0 + accepted + 1
            s.cache_tokens.extend(int(x) for x in vtok[s.idx, :accepted + 1])
            keep_t[s.idx] = s.n_past
            if self.paged:
                self.pkv.rollback(s.idx, saved_cur[s.idx], accepted + 1,
                                  K + 1)
        if not self.paged:
            self.cache = self._truncate(self.cache, jnp.asarray(keep_t))
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _spec_translate_step(self, active: list[_Slot]) -> bool:
        """Speculative round with draft-vocab translation (the reference's
        retokenization path, common/speculative.cpp:200-222,351-359): each
        slot's pending target tokens are detokenized → retokenized into the
        draft vocab, the draft proposes K draft-vocab tokens, and the proposal
        is translated back to target ids (variable length) for one batched
        verify pass. Drafted draft-cache entries are rolled back each round;
        accepted text is committed next round via the tail."""
        t0 = time.perf_counter()
        K, B = self.n_draft, self.n_slots
        tr = self.spec_translator
        dparams = self.draft_model.params

        tails = {s.idx: tr.tgt_to_dft(s.draft_tail) for s in active}
        live = [s for s in active if tails[s.idx]]
        drafts_d = np.zeros((B, K), np.int32)
        if live:
            # commit pending text into the draft cache (bucketed width to
            # bound recompiles), draft token 0 from the last fed position
            wmax = max(len(tails[s.idx]) for s in live)
            W = 2
            while W < wmax:
                W *= 2
            tok = np.zeros((B, W), np.int32)
            dpos = np.full((B, W), -1, np.int32)
            tlen = np.ones(B, np.int32)
            bpos = np.zeros(B, np.int32)
            for s in live:
                tl = tails[s.idx][:W]
                tok[s.idx, :len(tl)] = tl
                dpos[s.idx, :len(tl)] = s.d_past + np.arange(len(tl))
                tlen[s.idx] = len(tl)
                bpos[s.idx] = s.d_past + len(tl) - 1
            drafts_dev, self.d_cache = self._d_rollout(
                dparams, jnp.asarray(tok), jnp.asarray(dpos),
                jnp.asarray(tlen), jnp.asarray(bpos), self.d_cache)
            dd = np.asarray(drafts_dev)
            for s in live:
                drafts_d[s.idx] = dd[s.idx]
                s.d_past += len(tails[s.idx][:W])  # committed; drafts roll back
                s.draft_tail = []

        # translate proposals back to target ids (variable length)
        drafts = np.zeros((B, K), np.int32)
        lens = np.zeros(B, np.int32)
        for s in live:
            tgt = tr.dft_to_tgt([int(x) for x in drafts_d[s.idx]])[:K]
            lens[s.idx] = len(tgt)
            drafts[s.idx, :len(tgt)] = tgt

        # batched target verify over [last_emitted, draft...]
        vtok = np.zeros((B, K + 1), np.int32)
        vpos = np.full((B, K + 1), -1, np.int32)
        for s in active:
            vtok[s.idx, 0] = s.generated[-1]
            vtok[s.idx, 1:] = drafts[s.idx]
            vpos[s.idx] = s.n_past + np.arange(K + 1)
        vlogits, self.cache = self._decode(self.model.params, jnp.asarray(vtok),
                                           jnp.asarray(vpos), self.cache)
        vlogits = np.asarray(vlogits, np.float32)

        keep_t = np.zeros(B, np.int32)
        keep_d = np.zeros(B, np.int32)
        for s in self.slots:
            keep_t[s.idx] = s.n_past
            keep_d[s.idx] = s.d_past
        for s in active:
            L = int(lens[s.idx])
            n_past0 = s.n_past
            accepted = 0
            for i in range(L + 1):
                t = s.sampler.sample(vlogits[s.idx, i])
                self._emit(s, t)
                if i < L and t == int(drafts[s.idx, i]) and \
                        s.state == SlotState.GENERATING:
                    accepted += 1
                    continue
                break
            self.metrics["n_spec_drafted"] += L
            self.metrics["n_spec_accepted"] += accepted
            n_emitted = accepted + 1
            s.n_past = n_past0 + n_emitted
            s.cache_tokens.extend(int(x) for x in vtok[s.idx, :n_emitted])
            keep_t[s.idx] = s.n_past
            keep_d[s.idx] = s.d_past           # drop drafted entries only
            if s.state == SlotState.GENERATING:
                s.draft_tail = s.draft_tail + [int(x) for x in
                                               s.generated[-n_emitted:]]
        self.cache = self._truncate(self.cache, jnp.asarray(keep_t))
        self.d_cache = self._truncate(self.d_cache, jnp.asarray(keep_d))
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _spec_decode_step(self, active: list[_Slot]) -> bool:
        """One speculative round for every generating slot, batched:
        draft-catch-up (≤2 tokens) → K−1 greedy draft steps → one target
        verify pass over K+1 positions → per-slot accept + rollback."""
        t0 = time.perf_counter()
        K, B = self.n_draft, self.n_slots
        dparams = self.draft_model.params

        # --- one fused dispatch: catch-up (tail ≤ 2 by invariant) + K-1
        # greedy draft steps scanned on-device (no per-step host argmax)
        tok = np.zeros((B, 2), np.int32)
        dpos = np.full((B, 2), -1, np.int32)
        tlen = np.ones(B, np.int32)
        bpos = np.zeros(B, np.int32)
        for s in active:
            for j, t in enumerate(s.draft_tail[:2]):
                tok[s.idx, j] = t
                dpos[s.idx, j] = s.d_past + j
            tlen[s.idx] = len(s.draft_tail[:2])
            bpos[s.idx] = s.d_past + tlen[s.idx] - 1
        drafts_dev, self.d_cache = self._d_rollout(
            dparams, jnp.asarray(tok), jnp.asarray(dpos), jnp.asarray(tlen),
            jnp.asarray(bpos), self.d_cache)
        drafts = np.asarray(drafts_dev)                      # (B, K)
        for s in active:
            s.d_past += len(s.draft_tail[:2]) + K - 1

        # --- target verify over [last_emitted, d_0 .. d_{K-1}]
        vtok = np.zeros((B, K + 1), np.int32)
        vpos = np.full((B, K + 1), -1, np.int32)
        for s in active:
            vtok[s.idx, 0] = s.generated[-1]
            vtok[s.idx, 1:] = drafts[s.idx]
            vpos[s.idx] = s.n_past + np.arange(K + 1)
        saved_cur: dict[int, tuple] = {}
        if self.paged:
            mgr = self.pkv
            try:
                for s in active:
                    mgr.ensure_resident(s.idx)
                    mgr.pin(s.idx, True)
                saved_cur = {s.idx: mgr.save_cursor(s.idx) for s in active}
                mgr.plan_step({s.idx: K + 1 for s in active})
                vlogits, cache = self._decode(
                    self.model.params, jnp.asarray(vtok), jnp.asarray(vpos),
                    mgr.cache)
                mgr.finish_step(cache)
            finally:
                for s in active:
                    mgr.pin(s.idx, False)
        else:
            vlogits, self.cache = self._decode(
                self.model.params, jnp.asarray(vtok), jnp.asarray(vpos),
                self.cache)
        vlogits = np.asarray(vlogits, np.float32)            # (B, K+1, V)

        keep_t = np.zeros(B, np.int32)
        keep_d = np.zeros(B, np.int32)
        for s in self.slots:
            keep_t[s.idx] = s.n_past
            keep_d[s.idx] = s.d_past
        for s in active:
            n_past0, d_fed = s.n_past, s.d_past
            accepted = 0
            for i in range(K + 1):
                t = s.sampler.sample(vlogits[s.idx, i])
                emit_done = False
                self._emit(s, t)
                emit_done = s.state != SlotState.GENERATING
                if i < K and t == int(drafts[s.idx, i]) and not emit_done:
                    accepted += 1
                    continue
                break
            self.metrics["n_spec_drafted"] += K
            self.metrics["n_spec_accepted"] += accepted
            n_emitted = accepted + 1
            s.n_past = n_past0 + n_emitted
            s.cache_tokens.extend(int(x) for x in vtok[s.idx, :n_emitted])
            keep_t[s.idx] = s.n_past
            keep_d[s.idx] = min(s.n_past, d_fed)
            s.d_past = int(keep_d[s.idx])
            if s.state == SlotState.GENERATING:
                # tokens the draft hasn't consumed yet (1 or 2 by invariant)
                seq_from = s.d_past - s.n_prompt
                seq_to = s.n_past + 1 - s.n_prompt
                s.draft_tail = [int(x) for x in s.generated[seq_from:seq_to]]
            if self.paged:
                self.pkv.rollback(s.idx, saved_cur[s.idx],
                                  s.n_past - n_past0, K + 1)
        if not self.paged:
            self.cache = self._truncate(self.cache, jnp.asarray(keep_t))
        self.d_cache = self._truncate(self.d_cache, jnp.asarray(keep_d))
        self.metrics["decode_s"] += time.perf_counter() - t0
        self.metrics["n_decode_steps"] += 1
        return True

    def _emit(self, slot: _Slot, token: int):
        req = slot.req
        slot.generated.append(token)
        slot.n_sampled += 1
        self.metrics["n_tokens_generated"] += 1
        if len(slot.generated) == 1:
            slot.t_first_token = time.perf_counter()
        tok = self.model.tokenizer
        piece = ""
        if tok is not None:
            piece = tok.token_to_piece(token).decode("utf-8", errors="replace")
            slot.text += piece
        if req.stream:
            try:
                req.stream(token, piece)
            except Exception:
                pass
        vocab = tok.vocab if tok else None
        eog = req.stop_eog and vocab is not None and vocab.is_eog(token)
        hit_stop = any(ss in slot.text for ss in req.stop_strings)
        done = eog or hit_stop or len(slot.generated) >= req.max_tokens
        if done or (slot.n_past + 1 > self.n_ctx and not self.ctx_shift):
            self._finish(slot, "stop" if (eog or hit_stop) else "length")

    def _finish(self, slot: _Slot, finish_reason: str):
        req = slot.req
        text = slot.text
        for ss in req.stop_strings:
            i = text.find(ss)
            if i >= 0:
                text = text[:i]
        req._result.update({
            "tokens": list(slot.generated),
            "text": text,
            "finish_reason": finish_reason,
            "n_prompt": slot.n_prompt,
            "n_generated": len(slot.generated),
            "ttft_s": slot.t_first_token - slot.t_start,
            "total_s": time.perf_counter() - slot.t_start,
        })
        req._done.set()
        slot.state = SlotState.IDLE
        slot.req = None
        slot.sampler = None
