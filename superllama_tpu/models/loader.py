"""GGUF → device params loader.

Counterpart of llama_model_loader + llama_model::load_tensors
(src/llama-model-loader.cpp, src/llama-model.cpp:2471): reads tensors by name,
dequantizes (or keeps packed for the fused Pallas path), transposes matmul
weights to (in, out) so forward passes use plain ``x @ w``, and places arrays
on device (optionally sharded — see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader
from ..ops.qtensor import REPACKABLE, repack
from ..tokenizer import Tokenizer, vocab_from_gguf
from .hparams import HParams, hparams_from_gguf


@dataclass
class LoadedModel:
    hparams: HParams
    params: dict[str, Any]
    tokenizer: Tokenizer
    metadata: dict[str, Any]
    name: str = ""


def _get(reader: GGUFReader, name: str, dtype, transpose: bool = True,
         sharder: Callable[[str, np.ndarray], jax.Array] | None = None,
         keep_quantized: bool = False):
    ti = reader.tensors.get(name)
    if ti is None:
        return None
    # fused-kernel path: keep 2-D matmul weights packed (ops/qtensor.py)
    if (keep_quantized and transpose and len(ti.ne) == 2
            and ti.ggml_type in REPACKABLE):
        put = (lambda a: sharder(name, a)) if sharder is not None else None
        return repack(ti.raw(), ti.ggml_type, ti.shape, device_put=put,
                      sharded=sharder is not None)
    arr = ti.astype_f32()
    if transpose and arr.ndim == 2:
        arr = arr.T                       # (out,in) → (in,out)
    elif transpose and arr.ndim == 3:
        arr = arr.transpose(0, 2, 1)      # (E,out,in) → (E,in,out)
    if sharder is not None:
        return sharder(name, arr.astype(_np_dtype(dtype)))
    return jnp.asarray(arr, dtype=dtype)


def _first(*vals):
    for v in vals:
        if v is not None:
            return v
    return None


def _np_dtype(jdt):
    return np.dtype(jnp.dtype(jdt).name) if jnp.dtype(jdt) != jnp.bfloat16 else jnp.bfloat16


def load_model(path: str, dtype=jnp.float32, keep_quantized: bool = False,
               sharder: Callable[[str, np.ndarray], jax.Array] | None = None) -> LoadedModel:
    """Load a GGUF model: hparams + tokenizer + params pytree.

    keep_quantized=True keeps repackable 2-D weights packed as QTensors for
    the fused Pallas dequant+matmul path (≈bits-per-weight HBM traffic);
    other tensors are dequantized to ``dtype``.

    ``sharder(name, np_array) -> jax.Array`` lets parallel/ place each tensor
    onto a mesh with the right PartitionSpec; default is single-device put.

    Encrypted models (server/security.py AES-256-GCM container) are
    transparently decrypted when SLT_MODEL_KEY is set.
    """
    from ..server.security import maybe_decrypt

    path = maybe_decrypt(path)
    reader = GGUFReader(path)
    extra_readers: list[GGUFReader] = []
    if int(reader.metadata.get("split.count", 1) or 1) > 1:
        # multi-shard model (*-00001-of-0000N.gguf): merge tensor indices
        from ..tools.gguf_split import shard_paths

        for p in shard_paths(path):
            if p == path:
                continue
            r2 = GGUFReader(p)
            extra_readers.append(r2)
            reader.tensors.update(r2.tensors)
    hp = hparams_from_gguf(reader)
    # synthetic/test models may carry no tokenizer metadata
    tok = (
        Tokenizer(vocab_from_gguf(reader))
        if "tokenizer.ggml.tokens" in reader.metadata
        else None
    )

    g = lambda name, t=True: _get(reader, name, dtype, t, sharder, keep_quantized)

    if hp.arch == "wavtokenizer-dec":
        # audio codec decoder (src/llama-model.cpp:5925-6022 tensor list)
        params = {
            "token_embd": g("token_embd.weight", t=False),
            "conv1d": g("conv1d.weight", t=False),
            "conv1d_b": g("conv1d.bias", t=False),
            "token_embd_norm": g("token_embd_norm.weight", t=False),
            "token_embd_norm_b": g("token_embd_norm.bias", t=False),
            "output_norm": g("output_norm.weight", t=False),
            "output_norm_b": g("output_norm.bias", t=False),
            "output": g("output.weight"),
            "output_b": g("output.bias", t=False),
            "posnet": [],
            "convnext": [],
        }
        for il in range(hp.posnet_n_layer):
            p = f"posnet.{il}."
            layer = {
                "norm1_w": g(p + "norm1.weight", t=False),
                "norm1_b": g(p + "norm1.bias", t=False),
                "conv1": g(p + "conv1.weight", t=False),
                "conv1_b": g(p + "conv1.bias", t=False),
                "norm2_w": g(p + "norm2.weight", t=False),
                "norm2_b": g(p + "norm2.bias", t=False),
                "conv2": g(p + "conv2.weight", t=False),
                "conv2_b": g(p + "conv2.bias", t=False),
                "attn_norm_w": g(p + "attn_norm.weight", t=False),
                "attn_norm_b": g(p + "attn_norm.bias", t=False),
                "attn_q": g(p + "attn_q.weight", t=False),
                "attn_q_b": g(p + "attn_q.bias", t=False),
                "attn_k": g(p + "attn_k.weight", t=False),
                "attn_k_b": g(p + "attn_k.bias", t=False),
                "attn_v": g(p + "attn_v.weight", t=False),
                "attn_v_b": g(p + "attn_v.bias", t=False),
                "attn_o": g(p + "attn_output.weight", t=False),
                "attn_o_b": g(p + "attn_output.bias", t=False),
                "norm_w": g(p + "norm.weight", t=False),
                "norm_b": g(p + "norm.bias", t=False),
            }
            params["posnet"].append(
                {k: v for k, v in layer.items() if v is not None})
        for il in range(hp.convnext_n_layer):
            p = f"convnext.{il}."
            layer = {
                "dw": g(p + "dw.weight", t=False),
                "dw_b": g(p + "dw.bias", t=False),
                "norm": g(p + "norm.weight", t=False),
                "norm_b": g(p + "norm.bias", t=False),
                "pw1": g(p + "pw1.weight"),
                "pw1_b": g(p + "pw1.bias", t=False),
                "pw2": g(p + "pw2.weight"),
                "pw2_b": g(p + "pw2.bias", t=False),
                "gamma": g(p + "gamma.weight", t=False),
            }
            params["convnext"].append(
                {k: v for k, v in layer.items() if v is not None})
        md = dict(reader.metadata)
        name = md.get("general.name", "")
        reader.close()
        return LoadedModel(hparams=hp, params=params, tokenizer=None,
                           metadata=md, name=name)

    if hp.arch in ("t5", "t5encoder"):
        # encoder-decoder namespaces enc./dec. (src/llama-arch.cpp:409-435)
        params = {
            "token_embd": g("token_embd.weight", t=False),
            "output": g("output.weight"),
            "output_norm_enc": g("enc.output_norm.weight", t=False),
            "output_norm": g("dec.output_norm.weight", t=False),
            "enc_layers": [],
            "dec_layers": [],
        }
        for il in range(hp.n_layer):
            p = f"enc.blk.{il}."
            layer = {
                "attn_norm_enc": g(p + "attn_norm.weight", t=False),
                "wq_enc": g(p + "attn_q.weight"),
                "wk_enc": g(p + "attn_k.weight"),
                "wv_enc": g(p + "attn_v.weight"),
                "wo_enc": g(p + "attn_o.weight"),
                "attn_rel_b_enc": g(p + "attn_rel_b.weight", t=False),
                "ffn_norm_enc": g(p + "ffn_norm.weight", t=False),
                "ffn_gate_enc": g(p + "ffn_gate.weight"),
                "ffn_up_enc": g(p + "ffn_up.weight"),
                "ffn_down_enc": g(p + "ffn_down.weight"),
            }
            params["enc_layers"].append(
                {k: v for k, v in layer.items() if v is not None})
        for il in range(hp.dec_n_layer or hp.n_layer):
            p = f"dec.blk.{il}."
            layer = {
                "attn_norm": g(p + "attn_norm.weight", t=False),
                "wq": g(p + "attn_q.weight"),
                "wk": g(p + "attn_k.weight"),
                "wv": g(p + "attn_v.weight"),
                "wo": g(p + "attn_o.weight"),
                "attn_rel_b": g(p + "attn_rel_b.weight", t=False),
                "attn_norm_cross": g(p + "cross_attn_norm.weight", t=False),
                "wq_cross": g(p + "cross_attn_q.weight"),
                "wk_cross": g(p + "cross_attn_k.weight"),
                "wv_cross": g(p + "cross_attn_v.weight"),
                "wo_cross": g(p + "cross_attn_o.weight"),
                "ffn_norm": g(p + "ffn_norm.weight", t=False),
                "ffn_gate": g(p + "ffn_gate.weight"),
                "ffn_up": g(p + "ffn_up.weight"),
                "ffn_down": g(p + "ffn_down.weight"),
            }
            params["dec_layers"].append(
                {k: v for k, v in layer.items() if v is not None})
        md = dict(reader.metadata)
        tok_t5 = (Tokenizer(vocab_from_gguf(reader))
                  if "tokenizer.ggml.tokens" in reader.metadata else None)
        name = md.get("general.name", "")
        reader.close()
        return LoadedModel(hparams=hp, params=params, tokenizer=tok_t5,
                           metadata=md, name=name)

    params: dict[str, Any] = {
        "token_embd": g("token_embd.weight", t=False),   # (V, E) row-lookup
        "output_norm": g("output_norm.weight", t=False),
        "output_norm_b": g("output_norm.bias", t=False),
        "output": g("output.weight"),                     # None → tied embeddings
        "output_b": g("output.bias", t=False),            # phi2 lm-head bias
        "rope_freqs": g("rope_freqs.weight", t=False),    # llama3 freq factors
        # encoder (bert-family) extras
        "token_embd_norm": g("token_embd_norm.weight", t=False),
        "token_embd_norm_b": g("token_embd_norm.bias", t=False),
        "position_embd": g("position_embd.weight", t=False),
        "token_types": g("token_types.weight", t=False),
        "cls": g("cls.weight"),
        "cls_b": g("cls.bias", t=False),
        "cls_out": g("cls.output.weight"),
        "cls_out_b": g("cls.output.bias", t=False),
        # gemma3n AltUp globals
        "per_layer_token_embd": g("per_layer_token_embd.weight", t=False),
        "per_layer_model_proj": g("per_layer_model_proj.weight"),
        "per_layer_proj_norm": g("per_layer_proj_norm.weight", t=False),
        "altup_proj": g("altup_proj.weight"),
        "altup_unembd_proj": g("altup_unembd_proj.weight"),
        "layers": [],
    }
    for il in range(hp.n_layer):
        p = f"blk.{il}."
        layer = {
            "attn_norm": g(p + "attn_norm.weight", t=False),
            "attn_norm_b": g(p + "attn_norm.bias", t=False),
            "wq": g(p + "attn_q.weight"),
            "wk": g(p + "attn_k.weight"),
            "wv": g(p + "attn_v.weight"),
            "wo": g(p + "attn_output.weight"),
            "bq": g(p + "attn_q.bias", t=False),
            "bk": g(p + "attn_k.bias", t=False),
            "bv": g(p + "attn_v.bias", t=False),
            "bo": g(p + "attn_output.bias", t=False),
            "attn_q_norm": g(p + "attn_q_norm.weight", t=False),
            "attn_k_norm": g(p + "attn_k_norm.weight", t=False),
            "ffn_norm": g(p + "ffn_norm.weight", t=False),
            "ffn_norm_b": g(p + "ffn_norm.bias", t=False),
            "ffn_gate": g(p + "ffn_gate.weight"),
            "ffn_up": g(p + "ffn_up.weight"),
            "ffn_down": g(p + "ffn_down.weight"),
            "ffn_gate_b": g(p + "ffn_gate.bias", t=False),
            "ffn_up_b": g(p + "ffn_up.bias", t=False),
            "ffn_down_b": g(p + "ffn_down.bias", t=False),
            # attention sinks (gpt-oss)
            "attn_sinks": g(p + "attn_sinks.weight", t=False),
            # MLA (deepseek2)
            "wq_a": g(p + "attn_q_a.weight"),
            "wq_b": g(p + "attn_q_b.weight"),
            "attn_q_a_norm": g(p + "attn_q_a_norm.weight", t=False),
            "wkv_a": g(p + "attn_kv_a_mqa.weight"),
            "wkv_b": g(p + "attn_kv_b.weight"),
            "attn_kv_a_norm": g(p + "attn_kv_a_norm.weight", t=False),
            # SSM (mamba)
            "ssm_in": g(p + "ssm_in.weight"),
            "ssm_conv1d": g(p + "ssm_conv1d.weight"),
            "ssm_conv1d_b": g(p + "ssm_conv1d.bias", t=False),
            "ssm_x": g(p + "ssm_x.weight"),
            "ssm_dt": g(p + "ssm_dt.weight"),
            "ssm_dt_b": g(p + "ssm_dt.bias", t=False),
            # canonical ecosystem names carry no ".weight" suffix
            # (llama-arch.cpp "no suffix for these"); accept both
            "ssm_a": _first(g(p + "ssm_a", t=False),
                            g(p + "ssm_a.weight", t=False)),
            "ssm_d": _first(g(p + "ssm_d", t=False),
                            g(p + "ssm_d.weight", t=False)),
            "ssm_out": g(p + "ssm_out.weight"),
            # qwen3next gated delta net: fused [beta|alpha] projection
            "ssm_beta_alpha": g(p + "ssm_ba.weight"),
            "ssm_norm": g(p + "ssm_norm.weight", t=False),  # mamba2 grouped
            # jamba/plamo2 hybrid: RMS norms on the dt/B/C selection streams
            # (plamo2 ships them suffix-less, llama-arch tn(TENSOR, i))
            "ssm_dt_norm": _first(g(p + "ssm_dt_norm.weight", t=False),
                                  g(p + "ssm_dt_norm", t=False)),
            "ssm_b_norm": _first(g(p + "ssm_b_norm.weight", t=False),
                                 g(p + "ssm_b_norm", t=False)),
            "ssm_c_norm": _first(g(p + "ssm_c_norm.weight", t=False),
                                 g(p + "ssm_c_norm", t=False)),
            # MoE
            "ffn_gate_inp": g(p + "ffn_gate_inp.weight"),
            "ffn_gate_inp_b": g(p + "ffn_gate_inp.bias", t=False),
            # deepseek-v3 e_score_correction_bias (selection-only bias)
            "exp_probs_b": g(p + "exp_probs_b.bias", t=False),
            "ffn_gate_exps": g(p + "ffn_gate_exps.weight"),
            "ffn_up_exps": g(p + "ffn_up_exps.weight"),
            "ffn_down_exps": g(p + "ffn_down_exps.weight"),
            "ffn_gate_exps_b": g(p + "ffn_gate_exps.bias", t=False),
            "ffn_up_exps_b": g(p + "ffn_up_exps.bias", t=False),
            "ffn_down_exps_b": g(p + "ffn_down_exps.bias", t=False),
            # shared expert (qwen2moe/deepseek2)
            "ffn_gate_shexp": g(p + "ffn_gate_shexp.weight"),
            "ffn_up_shexp": g(p + "ffn_up_shexp.weight"),
            "ffn_down_shexp": g(p + "ffn_down_shexp.weight"),
            "ffn_gate_inp_shexp": g(p + "ffn_gate_inp_shexp.weight"),
            # post-norms (gemma2/3, olmo2, glm4, grok) — ecosystem names with
            # legacy fallbacks (llama-arch.cpp:338,342,350 name table)
            "attn_post_norm": _first(
                g(p + "post_attention_norm.weight", t=False),
                g(p + "attn_post_norm.weight", t=False),
                g(p + "post_attention_norm", t=False),   # plamo3: no suffix
                g(p + "attn_output_norm.weight", t=False)
                if hp.arch == "grok" else None),
            "ffn_post_norm": _first(
                g(p + "post_ffw_norm.weight", t=False),
                g(p + "ffn_post_norm.weight", t=False),
                g(p + "post_ffw_norm", t=False),          # plamo3: no suffix
                g(p + "layer_output_norm.weight", t=False)
                if hp.arch == "grok" else None),
            # chameleon per-head qk LayerNorm biases
            "attn_q_norm_b": g(p + "attn_q_norm.bias", t=False),
            "attn_k_norm_b": g(p + "attn_k_norm.bias", t=False),
            # arctic parallel-MoE branch norm
            "ffn_norm_exps": g(p + "ffn_norm_exps.weight", t=False),
            # afmoe attention gate (σ-gated attn output pre-wo)
            "attn_gate": g(p + "attn_gate.weight"),
            # gemma3n: AltUp + LAUREL + per-layer-input tensors
            "altup_router": g(p + "altup_router.weight"),
            "altup_router_norm": g(p + "altup_router_norm.weight", t=False),
            "altup_predict_coef": g(p + "altup_predict_coef.weight"),
            "altup_correct_coef": g(p + "altup_correct_coef.weight"),
            "altup_correct_scale": g(p + "altup_correct_scale.weight",
                                     t=False),
            "per_layer_inp_gate": g(p + "inp_gate.weight"),
            "per_layer_proj": g(p + "proj.weight"),
            "per_layer_post_norm": g(p + "post_norm.weight", t=False),
            "laurel_l": g(p + "laurel_l.weight"),
            "laurel_r": g(p + "laurel_r.weight"),
            "laurel_post_norm": g(p + "laurel_post_norm.weight", t=False),
            # lfm2 shortconv mixer (conv kernel → (L_cache, n_embd))
            "shortconv_conv": g(p + "shortconv.conv.weight"),
            "shortconv_in": g(p + "shortconv.in_proj.weight"),
            "shortconv_out": g(p + "shortconv.out_proj.weight"),
            # grovemoe adjugate ("chunk") expert bank
            "ffn_gate_chexps": g(p + "ffn_gate_chexps.weight"),
            "ffn_up_chexps": g(p + "ffn_up_chexps.weight"),
            "ffn_down_chexps": g(p + "ffn_down_chexps.weight"),
            # bitnet sub-norms (pre-wo / pre-down RMS)
            "attn_sub_norm": g(p + "attn_sub_norm.weight", t=False),
            "ffn_sub_norm": g(p + "ffn_sub_norm.weight", t=False),
        }
        if hp.arch == "bitnet":
            # fold the optional per-tensor ternary scales ("blk.N.*.scale",
            # bitnet create_tensors llama-model.cpp:5027) into the weights
            from ..ops.qtensor import QTensor as _QT

            for wkey, gname in (
                    ("wq", "attn_q"), ("wk", "attn_k"), ("wv", "attn_v"),
                    ("wo", "attn_output"), ("ffn_gate", "ffn_gate"),
                    ("ffn_up", "ffn_up"), ("ffn_down", "ffn_down")):
                sc = _get(reader, p + gname + ".scale", dtype, False)
                if sc is not None and wkey in layer:
                    w_ = layer[wkey]
                    if isinstance(w_, _QT):
                        raise NotImplementedError(
                            "bitnet scale folding needs dense weights; load "
                            "with keep_quantized=False")
                    layer[wkey] = w_ * jnp.asarray(sc).reshape(())
        if hp.extra.get("xielu"):  # apertus per-layer activation params
            xn, xp_, xb, xe = hp.extra["xielu"]
            layer["xielu"] = np.asarray(
                [xn[il], xp_[il], xb[il], xe[il]], np.float32)
        if hp.arch.startswith("rwkv") or hp.arch == "arwkv7":
            layer.update({
                "attn_norm_2": g(p + "attn_norm_2.weight", t=False),
                "attn_norm_2_b": g(p + "attn_norm_2.bias", t=False),
                # time mix (rwkv6 names; rwkv7 reuses key/value/receptance/
                # output/ln and adds the w/a/v/g low-rank stacks)
                "time_mix_w1": g(p + "time_mix_w1.weight"),
                "time_mix_w2": g(p + "time_mix_w2.weight"),
                "time_mix_lerp_x": g(p + "time_mix_lerp_x.weight", t=False),
                "time_mix_lerp_w": g(p + "time_mix_lerp_w.weight", t=False),
                "time_mix_lerp_k": g(p + "time_mix_lerp_k.weight", t=False),
                "time_mix_lerp_v": g(p + "time_mix_lerp_v.weight", t=False),
                "time_mix_lerp_r": g(p + "time_mix_lerp_r.weight", t=False),
                "time_mix_lerp_g": g(p + "time_mix_lerp_g.weight", t=False),
                "time_mix_lerp_fused": g(p + "time_mix_lerp_fused.weight", t=False),
                "time_mix_first": g(p + "time_mix_first.weight", t=False),
                "time_mix_decay": g(p + "time_mix_decay.weight", t=False),
                "time_mix_decay_w1": g(p + "time_mix_decay_w1.weight"),
                "time_mix_decay_w2": g(p + "time_mix_decay_w2.weight"),
                "time_mix_key": g(p + "time_mix_key.weight"),
                "time_mix_value": g(p + "time_mix_value.weight"),
                "time_mix_receptance": g(p + "time_mix_receptance.weight"),
                # qrwkv (rwkv6qwen2) optional r/k/v biases
                "time_mix_key_b": g(p + "time_mix_key.bias", t=False),
                "time_mix_value_b": g(p + "time_mix_value.bias", t=False),
                "time_mix_receptance_b": g(p + "time_mix_receptance.bias",
                                           t=False),
                "time_mix_gate": g(p + "time_mix_gate.weight"),
                "time_mix_ln": g(p + "time_mix_ln.weight", t=False),
                "time_mix_ln_b": g(p + "time_mix_ln.bias", t=False),
                "time_mix_output": g(p + "time_mix_output.weight"),
                # rwkv7 additions
                "time_mix_w0": g(p + "time_mix_w0.weight", t=False),
                "time_mix_a0": g(p + "time_mix_a0.weight", t=False),
                "time_mix_a1": g(p + "time_mix_a1.weight"),
                "time_mix_a2": g(p + "time_mix_a2.weight"),
                "time_mix_v0": g(p + "time_mix_v0.weight", t=False),
                "time_mix_v1": g(p + "time_mix_v1.weight"),
                "time_mix_v2": g(p + "time_mix_v2.weight"),
                "time_mix_g1": g(p + "time_mix_g1.weight"),
                "time_mix_g2": g(p + "time_mix_g2.weight"),
                "time_mix_k_k": g(p + "time_mix_k_k.weight", t=False),
                "time_mix_k_a": g(p + "time_mix_k_a.weight", t=False),
                "time_mix_r_k": g(p + "time_mix_r_k.weight", t=False),
                # channel mix
                "channel_mix_lerp_k": g(p + "channel_mix_lerp_k.weight", t=False),
                "channel_mix_lerp_r": g(p + "channel_mix_lerp_r.weight", t=False),
                "channel_mix_key": g(p + "channel_mix_key.weight"),
                "channel_mix_value": g(p + "channel_mix_value.weight"),
                "channel_mix_receptance": g(p + "channel_mix_receptance.weight"),
            })
        if hp.arch in ("bert", "nomic-bert", "nomic-bert-moe",
                       "jina-bert-v2", "jina-bert-v3"):
            layer.update({
                # bert post-norm LayerNorms carry biases under encoder names
                "attn_post_norm": g(p + "attn_output_norm.weight", t=False),
                "attn_post_norm_b": g(p + "attn_output_norm.bias", t=False),
                "ffn_post_norm": g(p + "layer_output_norm.weight", t=False),
                "ffn_post_norm_b": g(p + "layer_output_norm.bias", t=False),
                "ffn_up_b": g(p + "ffn_up.bias", t=False),
                "ffn_down_b": g(p + "ffn_down.bias", t=False),
                # jina-v2 second attention norm (double residual)
                "attn_norm_2": g(p + "attn_norm_2.weight", t=False),
                "attn_norm_2_b": g(p + "attn_norm_2.bias", t=False),
            })
        layer = {k: v for k, v in layer.items() if v is not None}
        # ecosystem phi3-style fused tensors: split into the standard names
        if "wq" not in layer:
            qkv = _get(reader, p + "attn_qkv.weight", dtype, True, None, False)
            if qkv is not None and (hp.arch == "qwen3next"
                                    and hp.is_recurrent_layer(il)):
                # qwen3next delta-net layers: attn_qkv is the fused
                # [q|k|v] linear-attention projection, NOT head-split
                layer["ssm_qkv"] = qkv
            elif qkv is not None:             # (E_in, (H + 2·Hkv)·D)
                nq = hp.n_head_il(il) * hp.head_dim
                nk = hp.n_head_kv_il(il) * hp.head_dim
                layer["wq"] = qkv[:, :nq]
                layer["wk"] = qkv[:, nq:nq + nk]
                layer["wv"] = qkv[:, nq + nk:]
                bqkv = _get(reader, p + "attn_qkv.bias", dtype, False,
                            None, False)
                if bqkv is not None:          # qwen/codeshell fused bias
                    layer["bq"] = bqkv[:nq]
                    layer["bk"] = bqkv[nq:nq + nk]
                    layer["bv"] = bqkv[nq + nk:]
        if "ffn_gate" not in layer and "ffn_up" in layer:
            up = layer["ffn_up"]          # fused gate_up (phi3): gate ∥ up
            if isinstance(up, jax.Array) and hp.n_ff and up.shape[-1] == 2 * hp.n_ff:
                layer["ffn_gate"] = up[..., :hp.n_ff]
                layer["ffn_up"] = up[..., hp.n_ff:]
        params["layers"].append(layer)

    if hp.arch == "neo-bert" and params.get("output_norm") is None:
        # neo-bert's final RMS norm ships as enc.output_norm
        params["output_norm"] = _get(reader, "enc.output_norm.weight",
                                     dtype, False)
    if hp.arch in ("lfm2", "lfm2moe") and params.get("output_norm") is None:
        # lfm2 ships its FINAL norm under the historical name
        # "token_embd_norm" (llama-arch.cpp:318 LLM_TENSOR_OUTPUT_NORM_LFM2)
        params["output_norm"] = params.pop("token_embd_norm")
        params["token_embd_norm"] = None

    md = dict(reader.metadata)
    name = md.get("general.name", "")
    reader.close()
    for r2 in extra_readers:
        r2.close()
    return LoadedModel(hparams=hp, params=params, tokenizer=tok, metadata=md, name=name)
