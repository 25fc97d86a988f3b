"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch rotation via
ppermute must equal sequential layer application; sp-axis mesh shards the
sequence dimension without changing results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.parallel.pipeline import (
    make_pp_mesh,
    mlp_stage_fn,
    pipeline_apply,
    shard_stages,
    stack_stages,
)

E, NL = 16, 8


@pytest.fixture(scope="module")
def mlp_layers():
    rng = np.random.default_rng(0)
    return [{"w": jnp.asarray(rng.normal(0, 0.3, (E, E)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(0, 0.1, E).astype(np.float32))}
            for _ in range(NL)]


def _sequential(layers, x):
    for l in layers:
        x = jax.nn.gelu(x @ l["w"] + l["b"])
    return x


@pytest.mark.parametrize("n_stages,n_micro", [(8, 4), (4, 8), (2, 2)])
def test_pipeline_matches_sequential(mlp_layers, n_stages, n_micro):
    mesh = make_pp_mesh(n_stages)
    stages = shard_stages(stack_stages(mlp_layers, n_stages), mesh)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (n_micro * 2, E)).astype(np.float32))
    got = pipeline_apply(mlp_stage_fn(), stages, x, mesh, n_micro)
    ref = _sequential(mlp_layers, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_under_jit(mlp_layers):
    mesh = make_pp_mesh(4)
    stages = shard_stages(stack_stages(mlp_layers, 4), mesh)
    x = jnp.ones((8, E), jnp.float32)
    f = jax.jit(lambda s, x: pipeline_apply(mlp_stage_fn(), s, x, mesh, 4))
    got = f(stages, x)
    ref = _sequential(mlp_layers, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_axis_sharding(mlp_layers):
    """Sequence-parallel mesh: activations sharded over sp give identical
    training-step results (GSPMD inserts the collectives)."""
    import numpy as onp

    from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
    from superllama_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
    from superllama_tpu.training.train import Trainer

    hp = tiny_test_hparams()
    params = synthetic_params(hp, dtype=onp.float32, seed=0)
    rng = onp.random.default_rng(0)
    tokens = rng.integers(0, hp.n_vocab, (4, 16)).astype(onp.int32)

    losses = []
    for kw in (dict(dp=1, sp=1, tp=8, ep=1), dict(dp=1, sp=2, tp=2, ep=2),
               dict(dp=2, sp=2, tp=2, ep=1)):
        mesh = make_mesh(8, **kw)
        with mesh:
            p = shard_params(
                {k: (jnp.asarray(v) if not isinstance(v, list) else
                     [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
                 for k, v in params.items()}, mesh)
            tr = Trainer(hp, p, optimizer="adamw", lr=1e-3)
            t = jax.device_put(tokens, batch_sharding(mesh))
            losses.append(float(tr.train_step(t[:, :-1], t[:, 1:])))
    assert max(losses) - min(losses) < 1e-4, losses


# --------- llama transformer pipeline (VERDICT r1 item 6: real stages) -------


def test_llama_pipeline_matches_sequential():
    """4-stage llama decoder pipeline over the 8-device mesh: prefill + two
    KV-cached decode steps must match the sequential llama_forward."""
    import numpy as onp

    from superllama_tpu.models.llama import llama_forward
    from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
    from superllama_tpu.parallel.pipeline import (
        llama_cache_init, llama_stage_fn, make_pp_mesh, pipeline_apply_kv,
        shard_stages, stack_stages,
    )
    from superllama_tpu.runtime.kv_cache import kv_cache_init

    PP, NL, B, T, S, NMB = 4, 8, 8, 6, 32, 4
    hp = tiny_test_hparams(n_layer=NL)
    pn = synthetic_params(hp, dtype=onp.float32, seed=11)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in pn.items()}
    rng = onp.random.default_rng(0)
    tokens = rng.integers(1, hp.n_vocab, (B, T)).astype(onp.int32)

    # ---- sequential reference: prefill + 2 decode steps
    cache = kv_cache_init(hp.n_layer, B, S, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    ref_logits, cache = llama_forward(params, hp, jnp.asarray(tokens), pos, cache)
    ref_steps = [onp.asarray(ref_logits)]
    nxt = jnp.argmax(ref_logits[:, -1], -1).astype(jnp.int32)[:, None]
    for i in range(2):
        lg, cache = llama_forward(params, hp, nxt,
                                  jnp.full((B, 1), T + i, jnp.int32), cache)
        ref_steps.append(onp.asarray(lg))
        nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]

    # ---- pipeline: embed → staged layers → final norm + head
    from superllama_tpu.ops import jnp_ref as ops

    mesh = make_pp_mesh(PP)
    stages = shard_stages(stack_stages(
        [dict(l) for l in params["layers"]], PP), mesh)
    state = llama_cache_init(PP, NL // PP, B, S, hp)
    state = {k: jax.device_put(v, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("pp"))) for k, v in state.items()}
    sfn = llama_stage_fn(hp)

    def head(h):
        h = ops.rms_norm(h, params["output_norm"], hp.rms_eps)
        return h @ params["output"]

    h = params["token_embd"][jnp.asarray(tokens)]
    got, state = pipeline_apply_kv(sfn, stages, state, h, pos, mesh, NMB)
    got_steps = [onp.asarray(head(got))]
    nxt = jnp.argmax(head(got)[:, -1], -1).astype(jnp.int32)[:, None]
    for i in range(2):
        h = params["token_embd"][nxt]
        got, state = pipeline_apply_kv(
            sfn, stages, state, h, jnp.full((B, 1), T + i, jnp.int32),
            mesh, NMB)
        got_steps.append(onp.asarray(head(got)))
        nxt = jnp.argmax(head(got)[:, -1], -1).astype(jnp.int32)[:, None]

    for i, (r, g) in enumerate(zip(ref_steps, got_steps)):
        err = onp.abs(r - g).max()
        assert err < 1e-3, (i, err)
