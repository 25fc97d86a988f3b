"""Lookahead decoding (examples/lookahead counterpart): greedy output must be
IDENTICAL to plain greedy decoding — the tree pass is an optimization, never
a distribution change — and repetitive text must actually accept n-grams."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.loader import LoadedModel
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.kv_cache import kv_cache_init
from superllama_tpu.runtime.lookahead import LookaheadDecoder


@pytest.fixture(scope="module")
def model():
    hp = tiny_test_hparams(n_layer=2)
    pn = synthetic_params(hp, dtype=np.float32, seed=13)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in pn.items()}
    return LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})


def _plain_greedy(model, prompt, n):
    hp = model.hparams
    cache = kv_cache_init(hp.n_layer, 1, 512, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    toks = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(len(prompt), dtype=jnp.int32)[None]
    logits, cache = llama_forward(model.params, hp, toks, pos, cache)
    out = list(prompt)
    t = int(jnp.argmax(logits[0, -1]))
    out.append(t)
    for i in range(n - 1):
        logits, cache = llama_forward(
            model.params, hp, jnp.asarray([[t]], jnp.int32),
            jnp.asarray([[len(out) - 1]], jnp.int32), cache)
        t = int(jnp.argmax(logits[0, -1]))
        out.append(t)
    return out


def test_lookahead_identical_to_greedy(model):
    rng = np.random.default_rng(4)
    prompt = [int(x) for x in rng.integers(0, model.hparams.n_vocab, 12)]
    n = 24
    ref = _plain_greedy(model, prompt, n)
    la = LookaheadDecoder(model, W=4, N=3, G=4, n_ctx=512)
    got = la.generate(prompt, n)
    assert got == ref
    assert la.n_steps > 0


def test_lookahead_accepts_on_repetition(model):
    """A tiny random model falls into cycles quickly — the n-gram pool must
    catch them and accept multi-token steps."""
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(0, model.hparams.n_vocab, 8)]
    la = LookaheadDecoder(model, W=4, N=3, G=4, n_ctx=512)
    got = la.generate(prompt, 48)
    ref = _plain_greedy(model, prompt, 48)
    assert got == ref
    assert la.n_accept > 0, "no n-grams accepted on cyclic continuation"
    assert la.n_steps < 48  # fewer passes than tokens
