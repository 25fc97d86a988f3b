"""Self-extend / grouped attention: seq_div & seq_add rope-rerun exactness
(1-layer model: cached layer-0 K/V are mask-independent, so a position-edited
cache must match a cache prefilled directly with the edited positions), plus
the passkey-style SelfExtend driver (examples/passkey counterpart)."""

import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.llama import llama_forward
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.ops import jnp_ref as ops
from superllama_tpu.runtime.kv_cache import (
    kv_cache_init,
    seq_add_rerope,
    seq_cp,
    seq_div,
)

S = 32


@pytest.fixture(scope="module")
def one_layer_model():
    hp = tiny_test_hparams(n_layer=1)
    params = synthetic_params(hp, dtype=np.float32, seed=9)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in params.items()}
    inv_freq, mscale = ops.rope_frequencies(hp.head_dim, hp.n_rot,
                                            hp.rope_freq_base, 1.0)
    return hp, params, inv_freq, mscale


def _prefill(hp, params, toks, pos):
    cache = kv_cache_init(hp.n_layer, 1, S, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, jnp.float32)
    _, cache = llama_forward(params, hp, jnp.asarray(toks[None]),
                             jnp.asarray(pos[None]), cache, flash=False)
    return cache


def _next_logits(hp, params, cache, tok, p):
    lg, _ = llama_forward(params, hp, jnp.asarray([[tok]], jnp.int32),
                          jnp.asarray([[p]], jnp.int32), cache, flash=False)
    return np.asarray(lg[0, 0])


def test_seq_div_rope_rerun(one_layer_model):
    hp, params, inv_freq, mscale = one_layer_model
    rng = np.random.default_rng(0)
    toks = rng.integers(0, hp.n_vocab, 8).astype(np.int32)
    pos = np.arange(8, dtype=np.int32)

    c = _prefill(hp, params, toks, pos)
    c = seq_div(c, 0, 0, 8, 2, inv_freq, hp.rope_type, mscale)
    got = _next_logits(hp, params, c, 5, 4)

    ref_cache = _prefill(hp, params, toks, pos // 2)
    ref = _next_logits(hp, params, ref_cache, 5, 4)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_seq_add_rope_rerun(one_layer_model):
    hp, params, inv_freq, mscale = one_layer_model
    rng = np.random.default_rng(1)
    toks = rng.integers(0, hp.n_vocab, 8).astype(np.int32)
    pos = np.arange(8, dtype=np.int32)

    c = _prefill(hp, params, toks, pos)
    c = seq_add_rerope(c, 0, 4, 8, -2, inv_freq, hp.rope_type, mscale)
    got = _next_logits(hp, params, c, 3, 6)

    shifted = pos.copy()
    shifted[4:] -= 2
    ref_cache = _prefill(hp, params, toks, shifted)
    ref = _next_logits(hp, params, ref_cache, 3, 6)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_seq_cp():
    c = kv_cache_init(1, 2, 8, 2, 4, 4, jnp.float32)
    c = c._replace(pos=c.pos.at[0].set(jnp.arange(8)),
                   cursor=c.cursor.at[0].set(8),
                   k=c.k.at[0, 0].set(1.0))
    c2 = seq_cp(c, 0, 1)
    assert int(c2.cursor[1]) == 8
    np.testing.assert_array_equal(np.asarray(c2.pos[1]), np.arange(8))
    np.testing.assert_array_equal(np.asarray(c2.k[0, 1]), np.asarray(c2.k[0, 0]))


def test_self_extend_past_window():
    """Grouped attention keeps max position ≈ w + (n−1)·w/n ≪ n_tokens while
    decoding stays finite (passkey long-context mechanism)."""
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.runtime.context import Context
    from superllama_tpu.runtime.self_extend import SelfExtend

    hp = tiny_test_hparams(n_layer=2)
    params = synthetic_params(hp, dtype=np.float32, seed=11)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in params.items()}
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})
    ctx = Context(model, n_ctx=96, kv_dtype=jnp.float32)
    se = SelfExtend(ctx, ga_n=4, ga_w=16)
    rng = np.random.default_rng(2)
    prompt = list(rng.integers(0, hp.n_vocab, 64))
    out = se.generate(prompt, 8, chunk=16)
    assert len(out) == 72
    max_pos = int(np.asarray(ctx.cache.pos).max())
    assert max_pos < 64, max_pos  # positions compressed below raw length
