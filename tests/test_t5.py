"""T5 encoder-decoder vs HF transformers (random tiny weights): encoder
hidden states, teacher-forced decoder logits, incremental decode parity.

Validates graph structure (t5-enc/t5-dec.cpp counterpart) AND the relative
position bucket math (llama_relative_position_bucket)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from superllama_tpu.models.hparams import HParams
from superllama_tpu.models.t5 import t5_cross_kv, t5_decode, t5_encode
from superllama_tpu.runtime.kv_cache import kv_cache_init

V, E, DKV, FF, NL, NH, NB = 96, 32, 8, 64, 2, 4, 8


@pytest.fixture(scope="module")
def t5_pair():
    cfg = transformers.T5Config(
        vocab_size=V, d_model=E, d_kv=DKV, d_ff=FF, num_layers=NL,
        num_decoder_layers=NL, num_heads=NH, relative_attention_num_buckets=NB,
        relative_attention_max_distance=128, feed_forward_proj="relu",
        tie_word_embeddings=False, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, dropout_rate=0.0)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    t = lambda k: jnp.asarray(sd[k].T)
    a = lambda k: jnp.asarray(sd[k])

    enc_layers, dec_layers = [], []
    for i in range(NL):
        p = f"encoder.block.{i}.layer."
        layer = {
            "attn_norm_enc": a(p + "0.layer_norm.weight"),
            "wq_enc": t(p + "0.SelfAttention.q.weight"),
            "wk_enc": t(p + "0.SelfAttention.k.weight"),
            "wv_enc": t(p + "0.SelfAttention.v.weight"),
            "wo_enc": t(p + "0.SelfAttention.o.weight"),
            "ffn_norm_enc": a(p + "1.layer_norm.weight"),
            "ffn_up_enc": t(p + "1.DenseReluDense.wi.weight"),
            "ffn_down_enc": t(p + "1.DenseReluDense.wo.weight"),
        }
        if i == 0:
            layer["attn_rel_b_enc"] = a(
                p + "0.SelfAttention.relative_attention_bias.weight")
        enc_layers.append(layer)
        p = f"decoder.block.{i}.layer."
        layer = {
            "attn_norm": a(p + "0.layer_norm.weight"),
            "wq": t(p + "0.SelfAttention.q.weight"),
            "wk": t(p + "0.SelfAttention.k.weight"),
            "wv": t(p + "0.SelfAttention.v.weight"),
            "wo": t(p + "0.SelfAttention.o.weight"),
            "attn_norm_cross": a(p + "1.layer_norm.weight"),
            "wq_cross": t(p + "1.EncDecAttention.q.weight"),
            "wk_cross": t(p + "1.EncDecAttention.k.weight"),
            "wv_cross": t(p + "1.EncDecAttention.v.weight"),
            "wo_cross": t(p + "1.EncDecAttention.o.weight"),
            "ffn_norm": a(p + "2.layer_norm.weight"),
            "ffn_up": t(p + "2.DenseReluDense.wi.weight"),
            "ffn_down": t(p + "2.DenseReluDense.wo.weight"),
        }
        if i == 0:
            layer["attn_rel_b"] = a(
                p + "0.SelfAttention.relative_attention_bias.weight")
        dec_layers.append(layer)

    params = {
        "token_embd": a("shared.weight"),
        "output": t("lm_head.weight"),
        "output_norm_enc": a("encoder.final_layer_norm.weight"),
        "output_norm": a("decoder.final_layer_norm.weight"),
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
    }
    hp = HParams(arch="t5", n_vocab=V, n_ctx_train=512, n_embd=E, n_layer=NL,
                 n_head=NH, n_head_kv=NH, n_ff=FF, n_rot=0, head_dim=DKV,
                 head_dim_v=DKV, rms_eps=1e-6, n_rel_attn_bkts=NB,
                 dec_n_layer=NL, dec_start_token_id=0)
    return hf, hp, params


def test_encoder_parity(t5_pair):
    hf, hp, params = t5_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(2, V, (2, 11))
    with torch.no_grad():
        ref = hf.encoder(torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, hp, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_decoder_teacher_forced_parity(t5_pair):
    hf, hp, params = t5_pair
    rng = np.random.default_rng(1)
    src = rng.integers(2, V, (2, 9))
    tgt = rng.integers(2, V, (2, 7))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(src),
                 decoder_input_ids=torch.tensor(tgt)).logits.numpy()
    enc = t5_encode(params, hp, jnp.asarray(src, jnp.int32))
    ckv = t5_cross_kv(params, hp, enc)
    cache = kv_cache_init(NL, 2, 16, NH, DKV, DKV, jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(7, dtype=jnp.int32)[None], (2, 7))
    got, _ = t5_decode(params, hp, jnp.asarray(tgt, jnp.int32), pos, cache, ckv)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=1e-4)


def test_incremental_decode_matches_oneshot(t5_pair):
    _, hp, params = t5_pair
    rng = np.random.default_rng(2)
    src = rng.integers(2, V, (1, 6))
    tgt = rng.integers(2, V, (1, 5))
    enc = t5_encode(params, hp, jnp.asarray(src, jnp.int32))
    ckv = t5_cross_kv(params, hp, enc)

    cache = kv_cache_init(NL, 1, 16, NH, DKV, DKV, jnp.float32)
    pos = jnp.arange(5, dtype=jnp.int32)[None]
    one, _ = t5_decode(params, hp, jnp.asarray(tgt, jnp.int32), pos, cache, ckv)

    cache = kv_cache_init(NL, 1, 16, NH, DKV, DKV, jnp.float32)
    steps = []
    for i in range(5):
        lg, cache = t5_decode(params, hp, jnp.asarray(tgt[:, i:i+1], jnp.int32),
                              jnp.asarray([[i]], jnp.int32), cache, ckv)
        steps.append(np.asarray(lg))
    got = np.concatenate(steps, axis=1)
    np.testing.assert_allclose(got, np.asarray(one), rtol=2e-4, atol=1e-4)


def test_t5model_generate_matches_hf(t5_pair):
    from superllama_tpu.models.loader import LoadedModel
    from superllama_tpu.models.t5 import T5Model

    hf, hp, params = t5_pair
    rng = np.random.default_rng(3)
    src = rng.integers(2, V, (1, 8))
    with torch.no_grad():
        ref = hf.generate(torch.tensor(src), max_length=9, do_sample=False,
                          num_beams=1)
    model = LoadedModel(hparams=hp, params=params, tokenizer=None, metadata={})
    got = T5Model(model, n_ctx=32).generate(list(src[0]), n_gen=8)
    ref_ids = list(ref[0].numpy())[1:]  # strip decoder_start
    if 1 in ref_ids:  # our generate stops before emitting eos
        ref_ids = ref_ids[:ref_ids.index(1)]
    assert got[:len(ref_ids)] == ref_ids


def test_t5_converter_roundtrip(tmp_path):
    """HF→GGUF→load path for T5 (enc./dec. namespaces, rel-pos bias on
    block 0, convert_hf_to_gguf T5Model counterpart) must reproduce the
    hand-mapped params' logits exactly."""
    from superllama_tpu.gguf import GGMLType
    from superllama_tpu.models import load_model
    from superllama_tpu.tools.convert_hf import convert_state_dict

    cfg = transformers.T5Config(
        vocab_size=V, d_model=E, d_kv=DKV, d_ff=FF, num_layers=NL,
        num_decoder_layers=NL, num_heads=NH, relative_attention_num_buckets=NB,
        relative_attention_max_distance=128, feed_forward_proj="relu",
        tie_word_embeddings=False, decoder_start_token_id=0, eos_token_id=1,
        pad_token_id=0, dropout_rate=0.0,
        architectures=["T5ForConditionalGeneration"])
    torch.manual_seed(4)
    hf = transformers.T5ForConditionalGeneration(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    path = tmp_path / "t5.gguf"
    convert_state_dict(str(path), cfg, sd, GGMLType.F32)
    model = load_model(str(path))
    hp2, params2 = model.hparams, model.params
    assert hp2.n_rel_attn_bkts == NB and hp2.dec_n_layer == NL

    rng = np.random.default_rng(0)
    src = rng.integers(2, V, size=(1, 10)).astype(np.int64)
    tgt = np.concatenate([[[0]], rng.integers(2, V, size=(1, 5))],
                         axis=1).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(src),
                 decoder_input_ids=torch.tensor(tgt)).logits[0].numpy()
    enc = t5_encode(params2, hp2, jnp.asarray(src, jnp.int32))
    ckv = t5_cross_kv(params2, hp2, enc)
    cache = kv_cache_init(NL, 1, 16, NH, DKV, DKV, jnp.float32)
    pos = jnp.arange(tgt.shape[1], dtype=jnp.int32)[None]
    got, _ = t5_decode(params2, hp2, jnp.asarray(tgt, jnp.int32), pos,
                       cache, ckv)
    got = np.asarray(got[0], np.float32)
    assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 5e-4
