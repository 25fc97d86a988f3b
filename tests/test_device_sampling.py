"""On-device sampler chain conformance vs the host (numpy) reference chain
(backend sampling, llama.h:1021/1270): typical / XTC / dynatemp / top-n-sigma
now run in-graph; each stage's survivor set must match the host sampler's.

Method: with temp→0⁺ the Gumbel draw is dominated by the max surviving
logit, so the device token equals the host chain's best survivor — which
differs from plain argmax exactly when the stage cuts the global max."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.ops import device_sampling as dsamp
from superllama_tpu.runtime.sampling import XTC, Typical, TopK, TopNSigma

V = 512
RNG = np.random.default_rng(11)


def _device_pick(logits_row: np.ndarray, cfg: dict, seed: int = 3) -> int:
    cfg = dict(cfg)
    cfg.setdefault("temp", 0.01)       # ≈ argmax over survivors
    cfg.setdefault("top_k", dsamp.N_CAND)
    cfg.setdefault("top_p", 1.0)
    cfg.setdefault("min_p", 0.0)
    cfg.setdefault("penalty_last_n", 0)
    p = {k: jnp.asarray(v)
         for k, v in dsamp.chain_params([cfg], V).items()}
    ring = jnp.full((1, dsamp.RING), -1, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(seed), 1)
    tok, _ = dsamp.chain_step(jnp.asarray(logits_row[None]), ring, keys, p)
    return int(tok[0])


def _host_best(logits_row: np.ndarray, samplers) -> int:
    out = logits_row.astype(np.float64).copy()
    for s in samplers:
        out = s.apply(out, None)
    return int(np.argmax(out))


def test_typical_cuts_the_peak():
    # one dominant token + a flat mid band: typical keeps the band (its
    # surprise is near the entropy) and can drop the peak
    # distinct band values so the |surprise − entropy| ordering is robust
    # across f32/f64 (near-ties would legitimately reorder)
    logits = np.full(V, -10.0, np.float32)
    logits[:64] = 2.0 + np.linspace(-0.6, 0.6, 64, dtype=np.float32)
    logits[7] = 4.0                       # global max, atypical
    host = _host_best(logits, [TopK(dsamp.N_CAND), Typical(0.5)])
    dev = _device_pick(logits, {"typical_p": 0.5})
    assert dev == host
    assert dev != int(np.argmax(logits))  # the stage actually did something


def test_xtc_drops_top_choices():
    logits = np.full(V, -8.0, np.float32)
    logits[3], logits[9], logits[21] = 5.0, 4.6, 4.2   # probs ≫ threshold
    host_x = XTC(1.0, 0.2, seed=0)
    host_x._rng = type("R", (), {"random": staticmethod(lambda: 0.0)})()
    host = _host_best(logits, [TopK(dsamp.N_CAND), host_x])
    dev = _device_pick(logits, {"xtc_probability": 1.0, "xtc_threshold": 0.2})
    assert dev == host
    assert dev != int(np.argmax(logits))


def test_top_n_sigma_matches():
    logits = RNG.normal(0, 2.0, V).astype(np.float32)
    cfg = {"top_n_sigma": 1.0, "temp": 0.01, "top_k": 40}
    # host branch: top-k → temp → nσ; temp scaling divides all logits so the
    # σ cut is scale-invariant — compare best survivor directly
    host = _host_best(logits, [TopK(40), TopNSigma(1.0)])
    dev = _device_pick(logits, cfg)
    assert dev == host


def test_dynatemp_samples_within_topk():
    logits = RNG.normal(0, 1.5, V).astype(np.float32)
    top = set(np.argsort(logits)[-20:].tolist())
    for seed in range(5):
        dev = _device_pick(logits, {"temp": 0.8, "dynatemp_range": 0.5,
                                    "top_k": 20}, seed=seed)
        assert dev in top


def test_chain_supported_widened():
    assert dsamp.chain_supported({"typical_p": 0.8})
    assert dsamp.chain_supported({"xtc_probability": 0.3})
    assert dsamp.chain_supported({"top_n_sigma": 2.0})
    assert dsamp.chain_supported({"dynatemp_range": 0.4})
    assert not dsamp.chain_supported({"mirostat": 2})
    assert not dsamp.chain_supported({"dry_multiplier": 0.5})
    assert not dsamp.chain_supported({"adaptive_p_target": 0.3})


def test_greedy_rows_unaffected():
    logits = RNG.normal(0, 1.0, V).astype(np.float32)
    dev = _device_pick(logits, {"temp": 0.0})
    assert dev == int(np.argmax(logits))
