"""RWKV6/RWKV7: wkv recurrence vs naive per-token oracle + model-level state
consistency (chunked prefill == one-shot; Context decode).

The oracles transcribe the scalar semantics of the reference CPU kernels
ggml_compute_forward_rwkv_wkv6/7 (ggml/src/ggml-cpu/ops.cpp:9410,9901).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.hparams import HParams
from superllama_tpu.models.rwkv import rwkv6_forward, rwkv7_forward, wkv6, wkv7
from superllama_tpu.runtime.recurrent import RWKVCache, rwkv_cache_init

B, H, D, T = 2, 3, 8, 5


def _r(rng, *shape):
    return rng.normal(0, 0.5, shape).astype(np.float32)


def test_wkv6_vs_oracle():
    rng = np.random.default_rng(0)
    r, k, v = _r(rng, B, T, H, D), _r(rng, B, T, H, D), _r(rng, B, T, H, D)
    u = _r(rng, H, D)
    w = np.exp(-np.exp(_r(rng, B, T, H, D)))        # decay in (0,1)
    S0 = _r(rng, B, H, D, D)

    # oracle: state[i=key][j=val]; y_j += r_i (u_i k_i v_j + S[i,j])
    S = S0.copy()
    y = np.zeros((B, T, H, D), np.float32)
    for t in range(T):
        for b in range(B):
            for h in range(H):
                for i in range(D):
                    for j in range(D):
                        kv = k[b, t, h, i] * v[b, t, h, j]
                        y[b, t, h, j] += r[b, t, h, i] * (
                            kv * u[h, i] + S[b, h, i, j])
                S[b, h] = S[b, h] * w[b, t, h][:, None] + np.outer(
                    k[b, t, h], v[b, t, h])

    got_y, got_S = wkv6(jnp.asarray(r), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(u), jnp.asarray(w), jnp.asarray(S0))
    np.testing.assert_allclose(np.asarray(got_y), y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_S), S, rtol=1e-4, atol=1e-5)


def test_wkv7_vs_oracle():
    rng = np.random.default_rng(1)
    r, k, v = _r(rng, B, T, H, D), _r(rng, B, T, H, D), _r(rng, B, T, H, D)
    a, bb = _r(rng, B, T, H, D), _r(rng, B, T, H, D)
    w = np.exp(-0.6 / (1 + np.exp(-_r(rng, B, T, H, D))))
    S0 = _r(rng, B, H, D, D)

    # oracle: state[i=val][j=key]; sa_i = Σ_j a_j S[i,j];
    # S[i,j] = w_j S[i,j] + v_i k_j + sa_i b_j; y_i = Σ_j S[i,j] r_j
    S = S0.copy()
    y = np.zeros((B, T, H, D), np.float32)
    for t in range(T):
        for b in range(B):
            for h in range(H):
                sa = S[b, h] @ a[b, t, h]
                S[b, h] = (S[b, h] * w[b, t, h][None, :]
                           + np.outer(v[b, t, h], k[b, t, h])
                           + np.outer(sa, bb[b, t, h]))
                y[b, t, h] = S[b, h] @ r[b, t, h]

    got_y, got_S = wkv7(jnp.asarray(r), jnp.asarray(w), jnp.asarray(k),
                        jnp.asarray(v), jnp.asarray(a), jnp.asarray(bb),
                        jnp.asarray(S0))
    np.testing.assert_allclose(np.asarray(got_y), y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_S), S, rtol=1e-4, atol=1e-5)


# --- model level --------------------------------------------------------------

E, NL, V, ED = 24, 2, 64, 16  # n_embd, layers, vocab, lora extra dim


def _hp(arch):
    return HParams(arch=arch, n_vocab=V, n_ctx_train=128, n_embd=E,
                   n_layer=NL, n_head=0, n_head_kv=0, n_ff=2 * E, n_rot=0,
                   head_dim=0, head_dim_v=0, wkv_head_size=8,
                   rescale_every_n_layers=2 if arch == "rwkv6" else 0)


def _rwkv6_params(rng):
    def lin(i, o):
        return jnp.asarray(_r(rng, i, o) * 0.2)

    layers = []
    for _ in range(NL):
        layers.append({
            "attn_norm": jnp.ones(E), "attn_norm_b": jnp.zeros(E),
            "attn_norm_2": jnp.ones(E), "attn_norm_2_b": jnp.zeros(E),
            "time_mix_w1": lin(E, 5 * ED),
            "time_mix_w2": jnp.asarray(_r(rng, 5, ED, E) * 0.2),
            "time_mix_lerp_x": jnp.asarray(_r(rng, E) * 0.1 + 0.5),
            "time_mix_lerp_fused": jnp.asarray(_r(rng, 5, 1, E) * 0.1 + 0.5),
            "time_mix_first": jnp.asarray(_r(rng, E)),
            "time_mix_decay": jnp.asarray(_r(rng, E)),
            "time_mix_decay_w1": lin(E, ED),
            "time_mix_decay_w2": lin(ED, E),
            "time_mix_key": lin(E, E), "time_mix_value": lin(E, E),
            "time_mix_receptance": lin(E, E), "time_mix_gate": lin(E, E),
            "time_mix_ln": jnp.ones(E), "time_mix_ln_b": jnp.zeros(E),
            "time_mix_output": lin(E, E),
            "channel_mix_lerp_k": jnp.asarray(_r(rng, E) * 0.1 + 0.5),
            "channel_mix_lerp_r": jnp.asarray(_r(rng, E) * 0.1 + 0.5),
            "channel_mix_key": lin(E, 2 * E),
            "channel_mix_value": lin(2 * E, E),
            "channel_mix_receptance": lin(E, E),
        })
    return {
        "token_embd": jnp.asarray(_r(rng, V, E) * 0.3),
        "token_embd_norm": jnp.ones(E), "token_embd_norm_b": jnp.zeros(E),
        "output_norm": jnp.ones(E), "output_norm_b": jnp.zeros(E),
        "output": jnp.asarray(_r(rng, E, V) * 0.3),
        "layers": layers,
    }


def _rwkv7_params(rng):
    def lin(i, o):
        return jnp.asarray(_r(rng, i, o) * 0.2)

    layers = []
    for il in range(NL):
        layer = {
            "attn_norm": jnp.ones(E), "attn_norm_b": jnp.zeros(E),
            "attn_norm_2": jnp.ones(E), "attn_norm_2_b": jnp.zeros(E),
            "time_mix_lerp_fused": jnp.asarray(_r(rng, 6, 1, E) * 0.1 + 0.5),
            "time_mix_w0": jnp.asarray(_r(rng, E)),
            "time_mix_w1": lin(E, ED), "time_mix_w2": lin(ED, E),
            "time_mix_a0": jnp.asarray(_r(rng, E)),
            "time_mix_a1": lin(E, ED), "time_mix_a2": lin(ED, E),
            "time_mix_g1": lin(E, ED), "time_mix_g2": lin(ED, E),
            "time_mix_k_k": jnp.asarray(_r(rng, E) * 0.5 + 1.0),
            "time_mix_k_a": jnp.asarray(_r(rng, E) * 0.5),
            "time_mix_r_k": jnp.asarray(_r(rng, E) * 0.5),
            "time_mix_key": lin(E, E), "time_mix_value": lin(E, E),
            "time_mix_receptance": lin(E, E),
            "time_mix_ln": jnp.ones(E), "time_mix_ln_b": jnp.zeros(E),
            "time_mix_output": lin(E, E),
            "channel_mix_lerp_k": jnp.asarray(_r(rng, E) * 0.1 + 0.5),
            "channel_mix_key": lin(E, 2 * E),
            "channel_mix_value": lin(2 * E, E),
        }
        if il > 0:
            layer.update({
                "time_mix_v0": jnp.asarray(_r(rng, E)),
                "time_mix_v1": lin(E, ED), "time_mix_v2": lin(ED, E),
            })
        layers.append(layer)
    return {
        "token_embd": jnp.asarray(_r(rng, V, E) * 0.3),
        "token_embd_norm": jnp.ones(E), "token_embd_norm_b": jnp.zeros(E),
        "output_norm": jnp.ones(E), "output_norm_b": jnp.zeros(E),
        "output": jnp.asarray(_r(rng, E, V) * 0.3),
        "layers": layers,
    }


@pytest.mark.parametrize("arch", ["rwkv6", "rwkv7"])
def test_chunked_prefill_matches_oneshot(arch):
    rng = np.random.default_rng(2)
    hp = _hp(arch)
    params = _rwkv6_params(rng) if arch == "rwkv6" else _rwkv7_params(rng)
    fwd = rwkv6_forward if arch == "rwkv6" else rwkv7_forward
    toks = rng.integers(0, V, 12)

    cache = rwkv_cache_init(NL, 1, E, E // 8, 8)
    one, _ = fwd(params, hp, jnp.asarray(toks[None]), None, cache)

    cache = rwkv_cache_init(NL, 1, E, E // 8, 8)
    outs = []
    for lo, hi in ((0, 5), (5, 6), (6, 12)):
        lg, cache = fwd(params, hp, jnp.asarray(toks[None, lo:hi]), None, cache)
        outs.append(np.asarray(lg))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(one), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ["rwkv6", "rwkv7"])
def test_context_generate(arch):
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.runtime.context import Context

    rng = np.random.default_rng(3)
    hp = _hp(arch)
    params = _rwkv6_params(rng) if arch == "rwkv6" else _rwkv7_params(rng)
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})
    ctx = Context(model, n_ctx=64)
    assert isinstance(ctx.cache, RWKVCache)
    out = ctx.greedy_generate([1, 2, 3], 8, stop_eog=False)
    assert len(out) == 11
    # decode continuation must equal teacher-forced one-shot logits argmax
    fwd = rwkv6_forward if arch == "rwkv6" else rwkv7_forward
    cache = rwkv_cache_init(NL, 1, E, E // 8, 8)
    lg, _ = fwd(params, hp, jnp.asarray([out[:-1]]), None, cache)
    forced = np.asarray(jnp.argmax(lg[0], axis=-1))[len([1, 2, 3]) - 1:]
    assert list(forced) == out[3:]
