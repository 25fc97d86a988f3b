"""Expert-parallel sparse MoE (parallel/moe.py): parity with the single-
device grouped-GEMM path on dp/sp/tp/ep meshes, capacity semantics, and the
per-device FLOP reduction vs the dense formulation (VERDICT r3 item 5;
reference semantics: ggml_mul_mat_id indexed expert GEMMs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.llama import moe_ffn, moe_ffn_dense, moe_ffn_sparse
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.parallel.mesh import make_mesh, shard_params


def _setup(n_expert=8, k=2, n_embd=64, n_ff=128, seed=3):
    hp = tiny_test_hparams(
        n_expert=n_expert, n_expert_used=k, n_vocab=128, n_embd=n_embd,
        n_head=4, n_head_kv=2, head_dim=16, head_dim_v=16, n_rot=16,
        n_ff=n_ff)
    pn = synthetic_params(hp, dtype=np.float32, seed=seed)
    layer = {kk: jnp.asarray(v) for kk, v in pn["layers"][0].items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 16, hp.n_embd)), jnp.float32)
    return hp, layer, x


@pytest.mark.parametrize("dp,sp,tp,ep", [(2, 1, 2, 2), (1, 1, 1, 8),
                                         (1, 2, 2, 2), (2, 1, 4, 1)])
def test_sharded_matches_sparse(dp, sp, tp, ep):
    hp, layer, x = _setup()
    ref = moe_ffn_sparse(x, layer, hp)
    mesh = make_mesh(8, dp=dp, sp=sp, tp=tp, ep=ep)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh
        hp.extra["moe_capacity"] = float(max(ep, 1))   # exact: no drops
        got = moe_ffn(x, lay_s, hp)
    hp.extra.pop("moe_mesh")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_matches_dense_formulation():
    hp, layer, x = _setup()
    dense = moe_ffn_dense(x, layer, hp)
    mesh = make_mesh(8, dp=1, sp=1, tp=2, ep=4)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh
        hp.extra["moe_capacity"] = 4.0
        got = moe_ffn(x, lay_s, hp)
    hp.extra.pop("moe_mesh")
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)


def test_capacity_drop_is_graceful():
    """Undersized capacity (C < 1) must drop overflow rows, not crash or
    corrupt: output stays finite and equals the reference wherever the
    routed rows fit."""
    hp, layer, x = _setup()
    mesh = make_mesh(8, dp=1, sp=1, tp=1, ep=8)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh
        hp.extra["moe_capacity"] = 0.5
        got = moe_ffn(x, lay_s, hp)
    hp.extra.pop("moe_mesh")
    hp.extra.pop("moe_capacity")
    assert np.isfinite(np.asarray(got)).all()
    assert got.shape == x.shape


def test_flop_reduction_vs_dense():
    """Per-device expert FLOPs scale with K·C/E of dense (the point of the
    sparse path): compiled flops < 60% of the dense einsum on the same mesh."""
    hp, layer, x = _setup(n_expert=8, k=2, n_ff=256)
    mesh = make_mesh(8, dp=2, sp=1, tp=2, ep=2)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh
        hp.extra["moe_capacity"] = 2.0
        fl_sparse = jax.jit(lambda xx: moe_ffn(xx, lay_s, hp)).lower(
            x).compile().cost_analysis().get("flops", 0.0)
        hp.extra.pop("moe_mesh")
        hp.extra["moe_dense"] = True
        fl_dense = jax.jit(lambda xx: moe_ffn(xx, lay_s, hp)).lower(
            x).compile().cost_analysis().get("flops", 0.0)
        hp.extra.pop("moe_dense")
    assert fl_sparse < 0.6 * fl_dense, (fl_sparse, fl_dense)


def test_before_ffn_weighting():
    """llama4-style input-weighted experts ride the sharded path too."""
    hp, layer, x = _setup()
    hp.extra["expert_weights_before_ffn"] = True
    ref = moe_ffn_sparse(x, layer, hp)
    mesh = make_mesh(8, dp=2, sp=1, tp=2, ep=2)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh
        hp.extra["moe_capacity"] = 2.0
        got = moe_ffn(x, lay_s, hp)
    hp.extra.pop("moe_mesh")
    hp.extra.pop("expert_weights_before_ffn")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_default_capacity_is_exact_under_skewed_routing():
    """With NO moe_capacity override the sharded path must reproduce the
    reference's exact no-drop semantics even under maximally imbalanced
    routing (ADVICE r4: the old C=2.0 default silently dropped rows).
    Zeroed router logits tie-break to experts {0,1} for EVERY token — the
    worst case for a per-device capacity bound."""
    hp, layer, x = _setup()
    layer = dict(layer)
    layer["ffn_gate_inp"] = jnp.zeros_like(layer["ffn_gate_inp"])
    ref = moe_ffn_sparse(x, layer, hp)
    mesh = make_mesh(8, dp=1, sp=1, tp=1, ep=8)
    with mesh:
        lay_s = shard_params({"layers": [dict(layer)]}, mesh)["layers"][0]
        hp.extra["moe_mesh"] = mesh          # note: no moe_capacity set
        got = moe_ffn(x, lay_s, hp)
    hp.extra.pop("moe_mesh")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
