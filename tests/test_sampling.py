"""Sampler chain tests (strategy of the reference's test-sampling.cpp:
construct known distributions, assert the surviving candidate sets)."""

import numpy as np
import pytest

from superllama_tpu.runtime.sampling import (
    DRY,
    Dist,
    Greedy,
    LogitBias,
    MinP,
    MirostatV2,
    Penalties,
    SamplerChain,
    SamplerContext,
    Temperature,
    TopK,
    TopNSigma,
    TopP,
    Typical,
    XTC,
    make_chain,
)


def _ctx(tokens=()):
    return SamplerContext(recent_tokens=list(tokens))


def _probs_to_logits(p):
    return np.log(np.asarray(p, np.float32))


def _surviving(logits):
    return set(np.flatnonzero(np.isfinite(logits)).tolist())


def test_top_k():
    logits = _probs_to_logits([0.4, 0.3, 0.2, 0.1])
    assert _surviving(TopK(2).apply(logits, _ctx())) == {0, 1}
    assert _surviving(TopK(0).apply(logits, _ctx())) == {0, 1, 2, 3}
    assert _surviving(TopK(10).apply(logits, _ctx())) == {0, 1, 2, 3}


def test_top_p():
    logits = _probs_to_logits([0.4, 0.3, 0.2, 0.1])
    assert _surviving(TopP(0.39).apply(logits, _ctx())) == {0}
    assert _surviving(TopP(0.69).apply(logits, _ctx())) == {0, 1}
    assert _surviving(TopP(0.71).apply(logits, _ctx())) == {0, 1, 2}
    assert _surviving(TopP(1.0).apply(logits, _ctx())) == {0, 1, 2, 3}


def test_min_p():
    logits = _probs_to_logits([0.5, 0.25, 0.2, 0.05])
    # threshold 0.3 → p/p_max >= 0.3 → p >= 0.15
    assert _surviving(MinP(0.3).apply(logits, _ctx())) == {0, 1, 2}
    assert _surviving(MinP(0.6).apply(logits, _ctx())) == {0}


def test_typical():
    logits = _probs_to_logits([0.97, 0.01, 0.01, 0.01])
    out = Typical(0.5).apply(logits, _ctx())
    assert 0 in _surviving(out)


def test_temperature_greedy_spike():
    logits = _probs_to_logits([0.1, 0.7, 0.2])
    out = Temperature(0.0).apply(logits, _ctx())
    assert _surviving(out) == {1}


def test_top_n_sigma():
    logits = np.array([10.0, 9.9, 0.0, -5.0], np.float32)
    out = TopNSigma(1.0).apply(logits, _ctx())
    assert 0 in _surviving(out) and 3 not in _surviving(out)


def test_penalties_repeat():
    logits = np.array([2.0, 1.0, -1.0], np.float32)
    ctx = _ctx([0, 2, 2])
    out = Penalties(last_n=64, repeat=2.0).apply(logits, ctx)
    assert out[0] == pytest.approx(1.0)    # positive → divided
    assert out[2] == pytest.approx(-2.0)   # negative → multiplied
    assert out[1] == pytest.approx(1.0)    # untouched


def test_penalties_freq_presence():
    logits = np.zeros(3, np.float32)
    ctx = _ctx([1, 1, 2])
    out = Penalties(last_n=64, repeat=1.0, freq=0.5, presence=0.25).apply(logits, ctx)
    assert out[1] == pytest.approx(-(2 * 0.5 + 0.25))
    assert out[2] == pytest.approx(-(1 * 0.5 + 0.25))
    assert out[0] == pytest.approx(0.0)


def test_logit_bias():
    logits = np.zeros(4, np.float32)
    out = LogitBias({2: 5.0, 3: -np.inf}).apply(logits, _ctx())
    assert out[2] == 5.0 and out[3] == -np.inf


def test_dry_penalizes_repetition():
    # context: A B C A B → candidate C continues the repeat A B → penalize C
    logits = np.zeros(5, np.float32)
    ctx = _ctx([1, 2, 3, 1, 2])
    out = DRY(multiplier=1.0, base=2.0, allowed_length=2).apply(logits, ctx)
    assert out[3] < 0.0                    # token 3 (C) penalized
    assert all(out[t] == 0.0 for t in (0, 1, 2, 4))


def test_xtc_removes_top():
    logits = _probs_to_logits([0.5, 0.3, 0.1, 0.1])
    s = XTC(p=1.0, threshold=0.2, seed=0)
    out = s.apply(logits, _ctx())
    # both 0 and 1 exceed threshold; the least likely of them (1) is kept
    assert _surviving(out) == {1, 2, 3}


def test_dist_statistics():
    probs = np.array([0.6, 0.3, 0.1], np.float64)
    chain = SamplerChain([Dist(seed=42)])
    counts = np.zeros(3)
    for _ in range(3000):
        counts[chain.sample(np.log(probs).astype(np.float32))] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, probs, atol=0.03)


def test_mirostat_converges():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 3, 200).astype(np.float32)
    s = MirostatV2(tau=3.0, eta=0.2, seed=1)
    surprises = []
    for _ in range(300):
        tok = s.sample(logits, _ctx())
        p = np.exp(logits - logits.max())
        p /= p.sum()
        surprises.append(-np.log2(p[tok]))
    # late-window average surprise should be near tau
    assert abs(np.mean(surprises[100:]) - 3.0) < 1.0


def test_greedy_chain_deterministic():
    chain = make_chain(greedy=True)
    logits = np.array([0.1, 2.0, 0.3], np.float32)
    assert chain.sample(logits) == 1
    assert chain.sample(logits) == 1


def test_default_chain_runs():
    chain = make_chain(seed=7, temp=0.8, top_k=20, top_p=0.9, min_p=0.02,
                       penalty_repeat=1.1, dry_multiplier=0.8)
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, 128).astype(np.float32)
    toks = [chain.sample(logits) for _ in range(20)]
    assert all(0 <= t < 128 for t in toks)
    # repetition should be discouraged: not all the same token
    assert len(set(toks)) > 1
