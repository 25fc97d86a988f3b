"""Lookahead decoding (examples/lookahead/lookahead.cpp counterpart).

Jacobi-iteration parallel decoding with an n-gram pool: each step evaluates,
in ONE batched forward pass with a tree-attention mask,
  - the current input token,
  - up to G verification n-grams drafted from the pool,
  - a W-wide, (N−1)-level lookahead window whose levels shift down each step
    (the Jacobi trajectories that mint new n-grams).
Accepted verification tokens advance multiple positions per pass; no draft
model needed. Mask layout reproduces lookahead.cpp:173-196; pool update
is :371-423 (ring of G n-grams per head token, dedup); acceptance loop is
:259-329. On TPU the whole tree is a single fixed-shape dispatch — batch
width is nearly free on the MXU while the KV read stays one stream.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..models.registry import get_forward
from .kv_cache import kv_cache_init, kv_gather_slots

NEG = -1e30


class LookaheadDecoder:
    def __init__(self, model, W: int = 8, N: int = 4, G: int = 8,
                 n_ctx: int = 1024, kv_dtype=None):
        self.model = model
        self.hp = model.hparams
        self.W, self.N, self.G = W, N, G
        self.n_ctx = n_ctx
        self.kv_dtype = kv_dtype or jnp.float32
        self.fwd = get_forward(self.hp.arch)
        # batch layout: [input] [G*(N-1) verify] [W-1 level-0] [W*(N-2) levels]
        self.T = 1 + G * (N - 1) + (W - 1) + W * (N - 2)
        self._step = jax.jit(functools.partial(self._step_impl, self.hp),
                             static_argnums=(0,), donate_argnums=(4,))
        self._gather = jax.jit(kv_gather_slots, donate_argnums=(0,))
        self.n_accept = 0
        self.n_steps = 0

    @staticmethod
    def _step_impl(hp, fwd, params, tokens, pos, cache, mask):
        return fwd(params, hp, tokens, pos, cache, attn_mask=mask)

    def _prefill(self, ids, cache):
        P = 64
        logits = None
        off = 0
        while off < len(ids):
            chunk = ids[off:off + P]
            t = np.zeros((1, P), np.int32)
            p = np.full((1, P), -1, np.int32)
            t[0, :len(chunk)] = chunk
            p[0, :len(chunk)] = np.arange(off, off + len(chunk))
            logits, cache = self.fwd(self.model.params, self.hp,
                                     jnp.asarray(t), jnp.asarray(p), cache)
            last = len(chunk) - 1
            off += len(chunk)
        return np.asarray(logits[0, last], np.float32), cache

    def generate(self, prompt_ids: list[int], n_gen: int) -> list[int]:
        W, N, G, T = self.W, self.N, self.G, self.T
        hp = self.hp
        cache = kv_cache_init(hp.n_layer, 1, self.n_ctx, hp.n_head_kv,
                              hp.head_dim, hp.head_dim_v, dtype=self.kv_dtype)
        last_logits, cache = self._prefill(list(prompt_ids), cache)
        n_past = len(prompt_ids)
        out = list(prompt_ids)
        cur = int(last_logits.argmax())
        out.append(cur)

        # Jacobi window levels [N-1][W] and the n-gram pool
        tokens_j = [[100 + i for i in range(W)] for _ in range(N - 1)]
        pool: dict[int, list[list[int]]] = {}  # head token -> ring of ≤G grams

        while len(out) - len(prompt_ids) < n_gen:
            if n_past + T + 1 > self.n_ctx:
                break  # window no longer fits; caller sizes n_ctx
            g_list = pool.get(cur, [])[:G]
            g_cur = len(g_list)
            toks = np.zeros(T, np.int32)
            pos = np.full(T, -1, np.int32)
            seqs: list[set] = [set()] * T
            toks[0], pos[0] = cur, n_past
            seqs[0] = set(range(W + G + 1))        # input joins every branch
            vidx = np.zeros((g_cur, N), np.int32)  # batch index per gram pos
            b = 1
            for g in range(g_cur):
                vidx[g, 0] = 0
                for j in range(N - 1):
                    toks[b], pos[b] = g_list[g][j], n_past + 1 + j
                    seqs[b] = {W + 1 + g}
                    vidx[g, j + 1] = b
                    b += 1
            b = 1 + G * (N - 1)                    # fixed offset for level-0
            look0 = b
            for i in range(1, W):
                toks[b], pos[b] = tokens_j[0][i], n_past + i
                seqs[b] = set(range(i + 1, W + 1))
                b += 1
            lookj = b
            for j in range(1, N - 1):
                for i in range(W):
                    toks[b], pos[b] = tokens_j[j][i], n_past + j + i
                    seqs[b] = {i + 1}
                    b += 1

            # tree-attention mask: prefix causal + same-branch batch entries
            n_kv = n_past
            S = self.n_ctx
            mask = np.full((1, 1, T, S), NEG, np.float32)
            mask[0, 0, :, :n_kv] = 0.0             # committed prefix visible
            for t in range(T):
                if pos[t] < 0:
                    mask[0, 0, t, :] = NEG
                    mask[0, 0, t, 0] = 0.0         # keep softmax finite
                    continue
                for s in range(T):
                    if pos[s] < 0 or pos[s] > pos[t]:
                        continue
                    if seqs[t] & seqs[s]:
                        mask[0, 0, t, n_kv + s] = 0.0
            logits, cache = self._step(
                self.fwd, self.model.params, jnp.asarray(toks[None]),
                jnp.asarray(pos[None]), cache, jnp.asarray(mask))
            lg = np.asarray(logits[0], np.float32)
            self.n_steps += 1

            active = [True] * g_cur
            accepted_slots: list[int] = []
            n_acc = 0
            ids_round: list[int] = []
            nid = int(lg[0].argmax())
            for v in range(N):
                if v > 0:
                    gi = next((g for g in range(g_cur) if active[g]), None)
                    if gi is None:
                        break
                    nid = int(lg[vidx[gi, v]].argmax())
                    accepted_slots.append(int(vidx[gi, v]))
                    n_acc += 1
                    self.n_accept += 1
                ids_round.append(nid)
                out.append(nid)
                if len(out) - len(prompt_ids) >= n_gen + 1:
                    break
                for g in range(g_cur):
                    if active[g]:
                        if v == N - 1 or (v < N - 1 and nid != g_list[g][v]):
                            active[g] = False
                # shift the Jacobi window down one level
                prev0 = list(tokens_j[0])
                for j in range(N - 2):
                    tokens_j[j] = tokens_j[j + 1]
                if v == 0:
                    tokens_j[N - 2] = [
                        int(lg[lookj + (N - 3) * W + i].argmax()) if N > 2
                        else int(lg[(look0 + i - 1) if i else 0].argmax())
                        for i in range(W)]
                else:
                    tokens_j[N - 2] = list(tokens_j[0])
                # mint n-grams from the trajectories (v == 0 only)
                if v == 0:
                    for f in range(W):
                        head = prev0[f]
                        gram = [tokens_j[j][f] for j in range(N - 1)]
                        ring = pool.setdefault(head, [])
                        if gram in ring:
                            continue
                        ring.append(gram)
                        if len(ring) > G:
                            ring.pop(0)
            # commit: prefix + input slot + accepted verify slots
            idx = np.arange(S, dtype=np.int32)
            keep = [n_kv + 0] + [n_kv + s for s in accepted_slots]
            idx[n_kv:n_kv + len(keep)] = keep
            cache = self._gather(cache, jnp.asarray(idx[None]),
                                 jnp.asarray([n_kv + len(keep)], np.int32))
            n_past += len(keep)
            cur = out[-1] if ids_round else cur
        return out[:len(prompt_ids) + n_gen]
