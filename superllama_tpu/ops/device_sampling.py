"""On-device (in-graph) sampling — the reference's "backend sampling"
(llama_set_sampler, include/llama.h:1021/1270: sampling fused into the compute
graph so the per-token loop never leaves the device).

All transforms are jit-safe pure functions over (B, V) logits. The host-side
chain (runtime/sampling.py) remains the full-featured reference; these cover
the hot serving configs: greedy, temperature, top-k, top-p, min-p.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def greedy(logits: jax.Array) -> jax.Array:
    """(B, V) → (B,) int32."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _mask_top_p(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus: keep the smallest set of tokens with cumulative prob ≥ p."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep while the cumulative mass *before* this token is < p
    keep = cum - probs < p
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < thresh, -jnp.inf, logits)


def _mask_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    mx = jnp.max(logits, axis=-1, keepdims=True)
    return jnp.where(logits < mx + jnp.log(min_p), -jnp.inf, logits)


@partial(jax.jit, static_argnames=("temp", "top_k", "top_p", "min_p"))
def sample(logits: jax.Array, key: jax.Array, *, temp: float = 1.0,
           top_k: int = 0, top_p: float = 1.0, min_p: float = 0.0) -> jax.Array:
    """One sampled token per row. temp ≤ 0 → greedy."""
    lf = logits.astype(jnp.float32)
    if temp <= 0.0:
        return greedy(lf)
    if top_k > 0:
        lf = _mask_top_k(lf, top_k)
    if min_p > 0.0:
        lf = _mask_min_p(lf, min_p)
    if top_p < 1.0:
        lf = _mask_top_p(lf, top_p)
    lf = lf / temp
    return jax.random.categorical(key, lf, axis=-1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Per-row parameterized sampler chain for the serving engine's jitted decode
# block (backend sampling, llama.h:1021/1270): every parameter is a (B,)
# array so slots with different settings share ONE compiled graph. Chain
# order matches runtime/sampling.py make_chain (common/sampling.cpp):
# logit_bias → penalties → top-k → top-p → min-p → temp → dist.
#
# The cutting stages operate on the top-N_CAND candidates (lax.top_k once);
# exact whenever the row's top_k ≤ N_CAND (the standard serving configs —
# llama.cpp default top_k = 40). Rows with top_k == 0 are treated as
# top_k = N_CAND; the host chain remains the full-distribution reference.

N_CAND = 128   # candidates surviving to the cutting stages
RING = 64      # recent-token window for penalties (llama.cpp default)
N_BIAS = 16    # max per-row logit-bias entries on the fast path


def chain_params(rows: list[dict | None], n_vocab: int) -> dict:
    """Build the per-row parameter arrays from request sampling configs.

    ``rows[i] is None`` → inert row (greedy, no penalties); the engine fills
    idle slots this way. Raises ValueError for configs the fast path cannot
    express (caller should gate with :func:`chain_supported`)."""
    B = len(rows)
    p = {
        "temp": np.zeros(B, np.float32),
        "top_k": np.full(B, N_CAND, np.int32),
        "top_p": np.ones(B, np.float32),
        "min_p": np.zeros(B, np.float32),
        "pen_repeat": np.ones(B, np.float32),
        "pen_freq": np.zeros(B, np.float32),
        "pen_present": np.zeros(B, np.float32),
        "pen_last_n": np.zeros(B, np.int32),
        "bias_ids": np.full((B, N_BIAS), -1, np.int32),
        "bias_vals": np.zeros((B, N_BIAS), np.float32),
    }
    p.update({
        "typ_p": np.ones(B, np.float32),
        "xtc_p": np.zeros(B, np.float32),
        "xtc_thr": np.full(B, 0.1, np.float32),
        "dynatemp_range": np.zeros(B, np.float32),
        "dynatemp_exp": np.ones(B, np.float32),
        "n_sigma": np.full(B, -1.0, np.float32),
    })
    for i, cfg in enumerate(rows):
        if cfg is None:
            continue
        if not chain_supported(cfg):
            raise ValueError(f"row {i}: config not fast-path expressible")
        if cfg.get("greedy") or cfg.get("temp", 1.0) <= 0.0:
            p["temp"][i] = 0.0
        else:
            p["temp"][i] = cfg.get("temp", 1.0)
        tk = int(cfg.get("top_k", 40))
        p["top_k"][i] = tk if 0 < tk <= N_CAND else N_CAND
        p["top_p"][i] = cfg.get("top_p", 0.95)
        p["min_p"][i] = cfg.get("min_p", 0.05)
        p["pen_repeat"][i] = cfg.get("penalty_repeat", 1.0)
        p["pen_freq"][i] = cfg.get("penalty_freq", 0.0)
        p["pen_present"][i] = cfg.get("penalty_present", 0.0)
        n = int(cfg.get("penalty_last_n", 64))
        p["pen_last_n"][i] = min(n, RING) if n >= 0 else RING
        p["typ_p"][i] = cfg.get("typical_p", 1.0)
        p["xtc_p"][i] = cfg.get("xtc_probability", 0.0)
        p["xtc_thr"][i] = cfg.get("xtc_threshold", 0.1)
        p["dynatemp_range"][i] = cfg.get("dynatemp_range", 0.0)
        p["dynatemp_exp"][i] = cfg.get("dynatemp_exponent", 1.0)
        ns = cfg.get("top_n_sigma", -1.0)
        p["n_sigma"][i] = ns if ns and ns > 0 else -1.0
        if ns and ns > 0:
            # the host chain's top-n-sigma branch is top-k → temp → nσ and
            # skips typical/top-p/min-p/xtc (make_chain) — mirror that
            p["typ_p"][i] = 1.0
            p["top_p"][i] = 1.0
            p["min_p"][i] = 0.0
            p["xtc_p"][i] = 0.0
        for j, (tid, b) in enumerate((cfg.get("logit_bias") or {}).items()):
            if 0 <= int(tid) < n_vocab:
                p["bias_ids"][i, j] = int(tid)
                p["bias_vals"][i, j] = float(b)
    return p


_UNSUPPORTED = ("dry_multiplier", "mirostat")


def chain_supported(cfg: dict) -> bool:
    """True when the sampling config is expressible by the on-device chain
    (everything except the stateful DRY / mirostat / adaptive-p samplers)."""
    for k in _UNSUPPORTED:
        if cfg.get(k):
            return False
    if cfg.get("adaptive_p_target", -1.0) >= 0.0:
        return False
    if len(cfg.get("logit_bias") or {}) > N_BIAS:
        return False
    return True


def chain_step(logits: jax.Array, ring: jax.Array, keys: jax.Array,
               p: dict) -> tuple[jax.Array, jax.Array]:
    """One chain application: (B, V) logits → (B,) tokens + updated ring.

    ``ring`` (B, RING) int32: recent tokens, most recent in the LAST column,
    -1 = empty. ``keys`` (B,) per-row PRNG keys for this step."""
    B, V = logits.shape
    lf = logits.astype(jnp.float32)

    # logit bias (sparse per-row adds)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    bid = jnp.maximum(p["bias_ids"], 0)
    bval = jnp.where(p["bias_ids"] >= 0, p["bias_vals"], 0.0)
    lf = lf.at[rows, bid].add(bval)

    # penalties over the ring window (llama_sampler_init_penalties semantics)
    age = (RING - 1 - jnp.arange(RING, dtype=jnp.int32))[None, :]   # (1, RING)
    valid = (ring >= 0) & (age < p["pen_last_n"][:, None])
    counts = jnp.zeros((B, V), jnp.float32).at[
        rows, jnp.maximum(ring, 0)].add(valid.astype(jnp.float32))
    hit = counts > 0
    rep = p["pen_repeat"][:, None]
    lf = jnp.where(hit, jnp.where(lf > 0, lf / rep, lf * rep), lf)
    lf = lf - (counts * p["pen_freq"][:, None]
               + hit.astype(jnp.float32) * p["pen_present"][:, None])

    # cutting stages over the top-N_CAND candidates
    vals, idx = jax.lax.top_k(lf, N_CAND)                 # (B, N) desc
    rank = jnp.arange(N_CAND, dtype=jnp.int32)[None, :]
    vals = jnp.where(rank < p["top_k"][:, None], vals, -jnp.inf)

    # locally-typical (llama_sampler_init_typical): keep the smallest-|surprise
    # − entropy| set with cumulative prob ≥ typ_p; inert when typ_p ≥ 1
    probs = jax.nn.softmax(vals, axis=-1)
    surprise = jnp.where(jnp.isfinite(vals), -jnp.log(
        jnp.maximum(probs, 1e-30)), jnp.inf)
    entropy = jnp.sum(jnp.where(jnp.isfinite(vals), probs * surprise, 0.0),
                      axis=-1, keepdims=True)
    shifted = jnp.abs(surprise - entropy)
    sh_idx = jnp.argsort(shifted, axis=-1, stable=True)
    p_ord = jnp.take_along_axis(probs, sh_idx, axis=-1)
    keep_ord = (jnp.cumsum(p_ord, axis=-1) - p_ord) < p["typ_p"][:, None]
    rows_b = jnp.arange(B, dtype=jnp.int32)[:, None]
    keep_typ = jnp.zeros((B, N_CAND), bool).at[rows_b, sh_idx].set(keep_ord)
    vals = jnp.where(keep_typ, vals, -jnp.inf)

    probs = jax.nn.softmax(vals, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    vals = jnp.where(cum_before < p["top_p"][:, None], vals, -jnp.inf)
    # min-p: thresh = max + log(p); row max is vals[:, 0] (pre-cut max
    # survives every cut — rank 0, cum_before 0)
    minp = jnp.where(p["min_p"][:, None] > 0,
                     vals[:, :1] + jnp.log(jnp.maximum(p["min_p"][:, None], 1e-30)),
                     -jnp.inf)
    vals = jnp.where(vals >= minp, vals, -jnp.inf)

    # XTC (llama_sampler_init_xtc): with probability xtc_p drop every token
    # whose prob ≥ threshold except the LEAST likely of them
    probs = jax.nn.softmax(vals, axis=-1)
    u_xtc = jax.vmap(lambda k: jax.random.uniform(
        jax.random.fold_in(k, 7), ()))(keys)
    above = probs >= p["xtc_thr"][:, None]
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    last_above = jnp.max(jnp.where(above, rank, -1), axis=-1, keepdims=True)
    fire = ((p["xtc_p"][:, None] > 0.0) & (u_xtc[:, None] < p["xtc_p"][:, None])
            & (p["xtc_thr"][:, None] <= 0.5) & (n_above >= 2))
    vals = jnp.where(fire & above & (rank < last_above), -jnp.inf, vals)

    # temperature: static or entropy-scaled (llama.h temp_ext)
    temp = p["temp"][:, None]
    probs = jax.nn.softmax(vals, axis=-1)
    finite = jnp.isfinite(vals)
    ent = -jnp.sum(jnp.where(finite, probs * jnp.log(
        jnp.maximum(probs, 1e-30)), 0.0), axis=-1, keepdims=True)
    n_fin = jnp.sum(finite, axis=-1, keepdims=True).astype(jnp.float32)
    max_ent = jnp.where(n_fin > 1, jnp.log(jnp.maximum(n_fin, 2.0)), 1.0)
    norm_ent = jnp.where(max_ent > 0, ent / max_ent, 0.0)
    delta = p["dynatemp_range"][:, None]
    dyn_t = ((temp - delta)
             + 2.0 * delta * norm_ent ** p["dynatemp_exp"][:, None])
    eff_t = jnp.where(delta > 0.0, jnp.maximum(dyn_t, 1e-3), temp)
    scaled = vals / jnp.maximum(eff_t, 1e-6)

    # top-n-sigma AFTER temperature (the host chain's nσ branch order)
    ns = p["n_sigma"][:, None]
    mean_s = (jnp.sum(jnp.where(finite, scaled, 0.0), -1, keepdims=True)
              / jnp.maximum(n_fin, 1.0))
    var_s = (jnp.sum(jnp.where(finite, (scaled - mean_s) ** 2, 0.0), -1,
                     keepdims=True) / jnp.maximum(n_fin, 1.0))
    max_s = jnp.max(jnp.where(finite, scaled, -jnp.inf), -1, keepdims=True)
    sig_cut = max_s - ns * jnp.sqrt(var_s)
    scaled = jnp.where((ns > 0.0) & (scaled < sig_cut), -jnp.inf, scaled)

    # dist (Gumbel-max over the survivors); temp ≤ 0 → greedy (rank 0)
    gumbel = -jnp.log(-jnp.log(
        jax.vmap(lambda k: jax.random.uniform(
            k, (N_CAND,), jnp.float32, 1e-7, 1.0 - 1e-7))(keys)))
    j_samp = jnp.argmax(scaled + gumbel, axis=-1)
    j = jnp.where(p["temp"] > 0, j_samp, 0).astype(jnp.int32)
    tok = idx[jnp.arange(B), j].astype(jnp.int32)

    ring = jnp.concatenate([ring[:, 1:], tok[:, None]], axis=1)
    return tok, ring
