"""Diffusion LM (LLaDA/Dream): bidirectional forward + demasking loop
(examples/diffusion/diffusion-cli.cpp counterpart)."""

import jax.numpy as jnp
import numpy as np
import pytest

from superllama_tpu.models.llada import llada_forward
from superllama_tpu.models.synthetic import synthetic_params, tiny_test_hparams
from superllama_tpu.runtime.diffusion import (
    BLOCK_BASED,
    ENTROPY_BASED,
    MARGIN_BASED,
    ORIGIN,
    DiffusionParams,
    diffusion_generate,
)

MASK = 3


@pytest.fixture(scope="module")
def llada_model():
    hp = tiny_test_hparams(arch="llada")
    params = synthetic_params(hp, dtype=np.float32, seed=5)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in params.items()}
    return hp, params


def test_bidirectional_attention(llada_model):
    """A later token must influence an earlier position's logits
    (non-causal, llada.cpp:19)."""
    hp, params = llada_model
    t1 = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    t2 = jnp.asarray([[5, 6, 7, 9]], jnp.int32)
    l1, _ = llada_forward(params, hp, t1)
    l2, _ = llada_forward(params, hp, t2)
    assert not np.allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]))


def test_rnd1_registered_bidirectional():
    """RND1 (qwen3moe-derived diffusion, rnd1.cpp): registry resolves to the
    diffusion forward; MoE + per-head qk norms run; attention is
    bidirectional."""
    from superllama_tpu.models.registry import get_forward

    fwd = get_forward("rnd1")
    hp = tiny_test_hparams(arch="rnd1", n_expert=4, n_expert_used=2,
                           rope_type=2)
    params = synthetic_params(hp, dtype=np.float32, seed=11)
    params = {k: (jnp.asarray(v) if not isinstance(v, list) else
                  [{a: jnp.asarray(b) for a, b in l.items()} for l in v])
              for k, v in params.items()}
    t1 = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    t2 = jnp.asarray([[5, 6, 7, 9]], jnp.int32)
    l1, _ = fwd(params, hp, t1)
    l2, _ = fwd(params, hp, t2)
    assert not np.allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]))
    out = diffusion_generate(fwd, params, hp, [5, 6], DiffusionParams(
        steps=3, max_length=8, mask_token_id=MASK))
    assert MASK not in out


@pytest.mark.parametrize("kwargs", [
    dict(),                                            # confidence + timestep
    dict(algorithm=ENTROPY_BASED),
    dict(algorithm=MARGIN_BASED),
    dict(algorithm=ORIGIN),
    dict(schedule=BLOCK_BASED, block_length=8, steps=4),
    dict(cfg_scale=1.5),
    dict(shift_logits=True),                           # dream
    dict(temperature=0.8, top_k=8, top_p=0.9, alg_temp=0.5, seed=7),
    dict(add_gumbel_noise=True, temperature=0.5),
])
def test_diffusion_fills_all_masks(llada_model, kwargs):
    hp, params = llada_model
    prompt = [10, 11, 12, 13]
    dp = DiffusionParams(steps=kwargs.pop("steps", 8), max_length=16,
                         mask_token_id=MASK, **kwargs)
    out = diffusion_generate(llada_forward, params, hp, prompt, dp)
    assert len(out) == 16
    assert out[:4] == prompt                 # prompt untouched
    assert MASK not in out[4:]               # fully demasked


def test_diffusion_deterministic_greedy(llada_model):
    hp, params = llada_model
    prompt = [10, 11, 12]
    dp = DiffusionParams(steps=6, max_length=12, mask_token_id=MASK)
    out1 = diffusion_generate(llada_forward, params, hp, prompt, dp)
    out2 = diffusion_generate(llada_forward, params, hp, prompt, dp)
    assert out1 == out2


def test_step_callback_and_progress(llada_model):
    hp, params = llada_model
    seen = []
    dp = DiffusionParams(steps=5, max_length=10, mask_token_id=MASK)
    diffusion_generate(llada_forward, params, hp, [1, 2], dp,
                       step_callback=lambda s, n, t: seen.append(s))
    assert seen and seen[0] == 0


def test_cli_diffusion(tmp_path, capsys, llada_model):
    """End-to-end: llada GGUF → `superllama_tpu diffusion` demasks a reply."""
    from superllama_tpu.cli import main as cli_main
    from superllama_tpu.gguf import GGUFReader
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.models.saver import save_model_gguf

    hp, params = llada_model
    r = GGUFReader("/root/reference/models/ggml-vocab-llama-spm.gguf")
    md = {k: v for k, v in r.metadata.items() if k.startswith("tokenizer.")}
    r.close()
    md.update({
        "general.architecture": "llada",
        "llada.embedding_length": hp.n_embd,
        "llada.block_count": hp.n_layer,
        "llada.attention.head_count": hp.n_head,
        "llada.attention.head_count_kv": hp.n_head_kv,
        "llada.feed_forward_length": hp.n_ff,
        "llada.context_length": hp.n_ctx_train,
        "llada.rope.dimension_count": hp.n_rot,
        "llada.vocab_size": hp.n_vocab,
        "tokenizer.ggml.mask_token_id": MASK,
    })
    # vocab fixture has 32000 tokens but hp.n_vocab is tiny; truncate
    md["tokenizer.ggml.tokens"] = md["tokenizer.ggml.tokens"][:hp.n_vocab]
    md["tokenizer.ggml.scores"] = md["tokenizer.ggml.scores"][:hp.n_vocab]
    md["tokenizer.ggml.token_type"] = md["tokenizer.ggml.token_type"][:hp.n_vocab]
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata=md)
    path = tmp_path / "llada.gguf"
    save_model_gguf(model, str(path))

    rc = cli_main(["diffusion", "-m", str(path), "-p", "hi", "--steps", "4",
                   "--max-length", "12", "--kv-dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert isinstance(out, str)
