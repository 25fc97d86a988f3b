"""Llama-family forward pass (llama/llama2/llama3/tinyllama/mistral/mixtral,
qwen2/qwen3 incl. MoE variants via optional tensors).

Behavioral reference: src/models/llama.cpp + the shared builder verbs in
src/llama-graph.h:714-855 (build_norm/build_ffn/build_moe_ffn/build_attn).
The design is TPU-native: a pure jittable function over a params pytree and a
functional KV cache; no graph IR — XLA is the graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import jnp_ref as ops
from ..ops.flash_attention import flash_attention, flash_decode_attention
from ..ops.qmatmul import qmatmul
from ..ops.qtensor import QTensor, dequant_qtensor
from ..runtime.kv_cache import (
    ISWACache,
    KVCache,
    causal_mask,
    iswa_layer_split,
    kv_advance,
    kv_layer,
    kv_ring_advance,
    kv_ring_slots,
    kv_update_layer,
    kv_write_slots,
)
from .hparams import ROPE_SCALING_YARN, HParams


def mm(x: jax.Array, w) -> jax.Array:
    """Matmul dispatch: dense array or fused-dequant QTensor. Decode-sized
    batches take the int8-activation GEMV kernel (mmvq analog). Mesh-sharded
    QTensors (multi-chip load) take dequant+dot — every op in that path is
    GSPMD-partitionable, so XLA shards the dequant with the codes and inserts
    the tp-axis psum for row-split weights (the NCCL allreduce analog)."""
    if isinstance(w, QTensor):
        if w.sharded:
            wd = dequant_qtensor(w, x.dtype if x.dtype == jnp.bfloat16
                                 else None)
            return jnp.dot(x, wd,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        rows = x.size // x.shape[-1]
        return qmatmul(x, w, act_quant=rows <= 16)
    return x @ w


def _im(imx: dict | None, key: str, x: jax.Array) -> None:
    """Imatrix hook: accumulate per-input-channel Σx² + token counts for the
    weight named ``key`` (IMatrixCollector::collect_imatrix counterpart,
    tools/imatrix/imatrix.cpp:219 — here a trace-time accumulation instead of
    a sched eval-callback)."""
    if imx is None:
        return
    xf = x.astype(jnp.float32).reshape(-1, x.shape[-1])
    imx[key] = imx.get(key, 0) + jnp.sum(xf * xf, axis=0)
    imx[key + ".__count"] = imx.get(key + ".__count", 0) + xf.shape[0]


def _norm(x: jax.Array, obj: dict, key: str, hp: HParams) -> jax.Array:
    """Norm dispatch (build_norm counterpart): RMSNorm or LayerNorm(+bias)
    per hp.norm_type. A missing weight means no norm for RMS archs
    (olmo2-style post-norm blocks) or a non-parametric LayerNorm (olmo)."""
    w = obj.get(key)
    if hp.norm_type == "ln":
        return ops.layer_norm(x, w, obj.get(key + "_b"), hp.norm_eps)
    if w is None:
        return x
    out = ops.rms_norm(x, w, hp.rms_eps)
    b = obj.get(key + "_b")                  # phimoe: RMS norm WITH bias
    return out if b is None else out + b


def _glu(gate: jax.Array, up: jax.Array, hp: HParams) -> jax.Array:
    if hp.act == "swiglu_oai":
        return ops.swiglu_oai(gate, up, hp.swiglu_alpha, hp.swiglu_limit)
    return ops.GLU_FNS[hp.act](gate, up)


def dense_ffn(x: jax.Array, layer: dict, hp: HParams | None = None,
              imx: dict | None = None, pfx: str = "") -> jax.Array:
    _im(imx, pfx + "ffn_up.weight", x)
    gate = mm(x, layer["ffn_gate"]) if "ffn_gate" in layer else None
    up = mm(x, layer["ffn_up"])
    if "ffn_up_b" in layer:
        up = up + layer["ffn_up_b"]
    if gate is not None:
        if "ffn_gate_b" in layer:
            gate = gate + layer["ffn_gate_b"]
        act = _glu(gate, up, hp) if hp is not None else ops.swiglu(gate, up)
    elif "xielu" in layer:  # apertus per-layer [alpha_n, alpha_p, beta, eps]
        xp = layer["xielu"]
        act = ops.xielu(up, xp[0], xp[1], xp[2], xp[3])
    else:
        act = ops.ACT_FNS[hp.act if hp is not None else "gelu"](up)
    if "ffn_sub_norm" in layer:  # bitnet: RMS before the down-projection
        act = ops.rms_norm(act, layer["ffn_sub_norm"],
                           hp.rms_eps if hp is not None else 1e-5)
    _im(imx, pfx + "ffn_down.weight", act)
    out = mm(act, layer["ffn_down"])
    if "ffn_down_b" in layer:
        out = out + layer["ffn_down_b"]
    return out


def _moe_route(x: jax.Array, layer: dict, hp: HParams,
               router_x: jax.Array | None = None):
    """Router: top-k expert ids + combine weights (shared by both MoE paths).

    Follows build_moe_ffn's gating pipeline (src/llama-graph.cpp:1090-1180):
    softmax/sigmoid gating, the DeepSeek-V3 selection bias (exp_probs_b added
    only for SELECTION, weights stay unbiased), grouped expert selection
    (top-2-sum group scores, non-selected groups masked), and the llama4
    variant (top-k on raw logits, sigmoid applied after)."""
    # smallthinker routes from the PRE-NORM layer input (smallthinker.cpp:33)
    logits = mm(x if router_x is None else router_x,
                layer["ffn_gate_inp"])                          # (B,T,E)
    if "ffn_gate_inp_b" in layer:
        logits = logits + layer["ffn_gate_inp_b"]
    lf = logits.astype(jnp.float32)
    if hp.extra.get("moe_topk_raw"):  # llama4: top-k on raw logits
        probs = jax.nn.sigmoid(lf)
        top_l, top_i = jax.lax.top_k(lf, hp.n_expert_used)
        top_w = jax.nn.sigmoid(top_l)
    else:
        probs = (jax.nn.softmax(lf, axis=-1) if hp.expert_gating_softmax
                 else jax.nn.sigmoid(lf))
        sel = probs
        if "exp_probs_b" in layer:  # DeepSeek-V3 e_score_correction_bias
            sel = sel + layer["exp_probs_b"].astype(jnp.float32)
        if hp.n_expert_groups > 1:
            B, T, E = sel.shape
            G = hp.n_expert_groups
            gsel = sel.reshape(B, T, G, E // G)
            g2, _ = jax.lax.top_k(gsel, min(2, E // G))   # top-2 per group
            gscore = g2.sum(-1)                           # (B,T,G)
            _, gi = jax.lax.top_k(gscore, hp.n_group_used)
            keep = jnp.zeros((B, T, G), bool).at[
                jnp.arange(B)[:, None, None], jnp.arange(T)[None, :, None],
                gi].set(True)
            sel = jnp.where(keep[..., None], gsel, -jnp.inf).reshape(B, T, E)
        _, top_i = jax.lax.top_k(sel, hp.n_expert_used)   # (B,T,K)
        top_w = jnp.take_along_axis(probs, top_i, axis=-1)
    if hp.expert_weights_norm:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    if hp.expert_weights_scale != 1.0:  # deepseek2 routed_scaling_factor
        top_w = top_w * hp.expert_weights_scale
    return probs, top_w, top_i


def _moe_shared_expert(x: jax.Array, layer: dict, hp: HParams, out: jax.Array):
    if "ffn_up_shexp" in layer:  # always-on shared expert
        shexp = {
            "ffn_gate": layer.get("ffn_gate_shexp"),
            "ffn_up": layer["ffn_up_shexp"],
            "ffn_down": layer["ffn_down_shexp"],
        }
        shexp = {k: v for k, v in shexp.items() if v is not None}
        sh = dense_ffn(x, shexp, hp)
        if "ffn_gate_inp_shexp" in layer:
            gsig = jax.nn.sigmoid(mm(x, layer["ffn_gate_inp_shexp"]))
            if gsig.ndim == sh.ndim - 1:   # 1-D {n_embd} gate (qwen3next)
                gsig = gsig[..., None]
            sh = sh * gsig
        out = out + sh
    return out


def _experts_apply(x: jax.Array, top_w: jax.Array, top_i: jax.Array,
                   layer: dict, hp: HParams, bank: str = "exps",
                   n_expert: int | None = None) -> jax.Array:
    """Run the routed experts of ``layer[f"ffn_*_{bank}"]`` over x with
    grouped GEMMs (jax.lax.ragged_dot) given selection (top_w, top_i).
    Duplicate expert ids per token (grovemoe chunk mapping) accumulate."""
    B, T, Dm = x.shape
    E = n_expert or hp.n_expert
    K = top_i.shape[-1]
    S = B * T
    xf = x.reshape(S, Dm)
    ei = top_i.reshape(S * K)
    order = jnp.argsort(ei)                     # stable: keeps token order
    tok = order // K                            # source token per sorted row
    ei_s = ei[order]
    xs = xf[tok]                                # (S·K, D)
    w_s = top_w.reshape(S * K)[order]
    before = bool(hp.extra.get("expert_weights_before_ffn"))
    if before:  # llama4: scale the expert INPUT by its router weight
        xs = xs * w_s[:, None].astype(xs.dtype)
    counts = jnp.bincount(ei, length=E)
    f32 = jnp.float32
    up = jax.lax.ragged_dot(xs, layer[f"ffn_up_{bank}"], counts,
                            preferred_element_type=f32)
    if f"ffn_up_{bank}_b" in layer:
        up = up + layer[f"ffn_up_{bank}_b"][ei_s]
    if f"ffn_gate_{bank}" in layer:
        gate = jax.lax.ragged_dot(xs, layer[f"ffn_gate_{bank}"], counts,
                                  preferred_element_type=f32)
        if f"ffn_gate_{bank}_b" in layer:
            gate = gate + layer[f"ffn_gate_{bank}_b"][ei_s]
        act = _glu(gate.astype(x.dtype), up.astype(x.dtype), hp)
    else:   # gate-less experts (nemotron_h_moe relu², nomic-bert-moe gelu)
        act = ops.ACT_FNS[hp.act](up.astype(x.dtype))
    down = jax.lax.ragged_dot(act, layer[f"ffn_down_{bank}"], counts,
                              preferred_element_type=f32)
    if f"ffn_down_{bank}_b" in layer:
        down = down + layer[f"ffn_down_{bank}_b"][ei_s]
    contrib = down if before else down * w_s[:, None]
    y = jnp.zeros((S, down.shape[-1]), f32).at[tok].add(contrib)
    return y.astype(x.dtype).reshape(B, T, -1)


def moe_ffn_sparse(x: jax.Array, layer: dict, hp: HParams,
                   router_x: jax.Array | None = None) -> jax.Array:
    """Grouped-GEMM MoE: compute ONLY the K routed experts per token.

    The TPU analog of the reference's indexed expert GEMMs (ggml mul_mat_id /
    ggml-cuda topk-moe + mmid): token rows are sorted by expert and fed to
    ``jax.lax.ragged_dot`` (Mosaic grouped matmul), so FLOPs are S·K·D·F
    instead of the dense path's S·E·D·F — the K/E reduction that makes
    Mixtral-class serving viable (BASELINE config 4)."""
    _, top_w, top_i = _moe_route(x, layer, hp, router_x)
    out = _experts_apply(x, top_w, top_i, layer, hp)
    return _moe_shared_expert(x, layer, hp, out)


def grove_moe(x: jax.Array, layer: dict, hp: HParams,
              router_x: jax.Array | None = None) -> jax.Array:
    """GroveMoE adjugate experts (grovemoe.cpp:84-120 + the GROVEMOE
    branches in build_moe_ffn): selection on sigmoid(logits), combine
    weights from softmax(logits) renormalized; the chunk ("adjugate")
    expert bank then runs on the FIRST pass's output, routed by big-expert
    id // n_group_experts with weights read at the chunk-id positions, and
    is added with expert_group_scale."""
    g = hp.extra["grove"]
    ng, scale = g["n_group_experts"], g["scale"]
    E, K = hp.n_expert, hp.n_expert_used
    n_chunk = E // ng
    logits = mm(x if router_x is None else router_x,
                layer["ffn_gate_inp"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    sel = jax.nn.sigmoid(logits)

    _, ti = jax.lax.top_k(sel, K)
    w = jnp.take_along_axis(probs, ti, axis=-1)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    first = _experts_apply(x, w, ti, layer, hp)

    k2 = min(K, n_chunk)
    _, ti2 = jax.lax.top_k(sel, k2)
    ci = ti2 // ng                              # chunk expert per selection
    w2 = jnp.take_along_axis(probs, ci, axis=-1)
    w2 = w2 / jnp.sum(w2, axis=-1, keepdims=True)
    second = _experts_apply(first, w2, ci, layer, hp, bank="chexps",
                            n_expert=n_chunk)
    return first + scale * second


def moe_ffn(x: jax.Array, layer: dict, hp: HParams,
            router_x: jax.Array | None = None) -> jax.Array:
    """Mixture-of-experts FFN (semantics of build_moe_ffn, llama-graph.h:738).

    Dispatch: grouped-GEMM sparse path by default (K/E of the dense FLOPs);
    the dense formulation (every expert computes, selection weights zero out
    unused experts) remains for expert-sharded meshes where GSPMD partitions
    the dense einsums into per-device expert slabs + collectives
    (hp.extra["moe_dense"]) and as the conformance reference. Router
    softmax-over-top-k (renormalize) vs raw softmax weights follows
    hp.expert_weights_norm; gpt-oss's softmax(top-k(logits)) is
    algebraically the renormalized form.
    """
    if "ffn_up_chexps" in layer:               # grovemoe adjugate experts
        return grove_moe(x, layer, hp, router_x)
    mesh = hp.extra.get("moe_mesh")
    if mesh is not None and isinstance(layer.get("ffn_up_exps"), jax.Array):
        # expert-parallel sparse path (parallel/moe.py): shard_map over the
        # ep/tp axes keeps the K/E grouped-GEMM FLOP reduction on sharded
        # meshes (the dense fallback burned E/K× FLOPs — VERDICT r3 item 5)
        from ..parallel.moe import _axis, sharded_moe_ffn
        ep, tp = _axis(mesh, "ep"), _axis(mesh, "tp")
        E, F = hp.n_expert, layer["ffn_up_exps"].shape[-1]
        B, T = x.shape[:2]
        if ((ep > 1 or tp > 1) and E % ep == 0 and F % tp == 0
                and B % _axis(mesh, "dp") == 0
                and T % _axis(mesh, "sp") == 0):
            return sharded_moe_ffn(x, layer, hp, mesh, router_x)
    if not hp.extra.get("moe_dense"):
        return moe_ffn_sparse(x, layer, hp, router_x)
    return moe_ffn_dense(x, layer, hp, router_x)


def moe_ffn_dense(x: jax.Array, layer: dict, hp: HParams,
                  router_x: jax.Array | None = None) -> jax.Array:
    B, T, E = *x.shape[:2], hp.n_expert
    probs, top_w, top_i = _moe_route(x, layer, hp, router_x)
    # scatter top-k weights back to dense (B,T,E)
    w = jnp.zeros_like(probs).at[
        jnp.arange(B)[:, None, None], jnp.arange(T)[None, :, None], top_i
    ].set(top_w)
    if hp.extra.get("expert_weights_before_ffn"):  # llama4 input scaling
        xe = x[:, :, None, :] * w[..., None].astype(x.dtype)   # (B,T,E,D)
        gate = jnp.einsum("bted,edf->btef", xe, layer["ffn_gate_exps"],
                          preferred_element_type=jnp.float32)
        up = jnp.einsum("bted,edf->btef", xe, layer["ffn_up_exps"],
                        preferred_element_type=jnp.float32)
        act = _glu(gate.astype(x.dtype), up.astype(x.dtype), hp)
        down = jnp.einsum("btef,efo->bteo", act, layer["ffn_down_exps"],
                          preferred_element_type=jnp.float32)
        out = down.sum(axis=2).astype(x.dtype)
        return _moe_shared_expert(x, layer, hp, out)
    gate = jnp.einsum("btd,edf->btef", x, layer["ffn_gate_exps"], preferred_element_type=jnp.float32)
    up = jnp.einsum("btd,edf->btef", x, layer["ffn_up_exps"], preferred_element_type=jnp.float32)
    if "ffn_gate_exps_b" in layer:
        gate = gate + layer["ffn_gate_exps_b"][None, None]
    if "ffn_up_exps_b" in layer:
        up = up + layer["ffn_up_exps_b"][None, None]
    act = _glu(gate.astype(x.dtype), up.astype(x.dtype), hp)  # (B,T,E,F)
    down = jnp.einsum("btef,efo->bteo", act, layer["ffn_down_exps"], preferred_element_type=jnp.float32)
    if "ffn_down_exps_b" in layer:
        down = down + layer["ffn_down_exps_b"][None, None]
    out = jnp.einsum("bteo,bte->bto", down, w).astype(x.dtype)
    return _moe_shared_expert(x, layer, hp, out)


def rope_setup(params: dict, hp: HParams):
    """Rope frequency tables for the full-attention and SWA layer classes:
    (inv_freq, mscale, inv_freq_swa, mscale_swa). Handles yarn/linear scaling
    and llama-3.1 per-dim frequency factors (rope_freqs.weight, applied as
    ggml_rope_ext freq_factors: theta_i /= factor_i)."""
    D = hp.head_dim
    if hp.rope_scaling == ROPE_SCALING_YARN and hp.rope_orig_ctx > 0:
        inv_freq, mscale = ops.rope_frequencies(
            D, hp.n_rot, hp.rope_freq_base, 1.0 / hp.rope_scale_factor,
            ext_factor=1.0, attn_factor=hp.rope_attn_factor, orig_ctx=hp.rope_orig_ctx,
        )
    else:
        scale = 1.0 / hp.rope_scale_factor if hp.rope_scaling == "linear" else 1.0
        inv_freq, mscale = ops.rope_frequencies(D, hp.n_rot, hp.rope_freq_base, scale)
    if params.get("rope_freqs") is not None:
        inv_freq = inv_freq / params["rope_freqs"].astype(inv_freq.dtype)
    # SWA layers may use a different (unscaled) rope base — gemma3 local layers
    if hp.rope_freq_base_swa > 0.0:
        inv_freq_swa, mscale_swa = ops.rope_frequencies(
            D, hp.n_rot, hp.rope_freq_base_swa, 1.0)
    else:
        inv_freq_swa, mscale_swa = inv_freq, mscale
    return inv_freq, mscale, inv_freq_swa, mscale_swa


def llama_forward(
    params: dict,
    hp: HParams,
    tokens: jax.Array,   # (B, T) int32
    pos: jax.Array,      # (B, T) int32; -1 marks padding rows/cols
    cache: KVCache,
    flash: bool | None = None,
    imatrix: dict | None = None,
    embeds: jax.Array | None = None,
    hidden_sink: list | None = None,
    attn_mask: jax.Array | None = None,
    mrope_pos3: jax.Array | None = None,
    s_window: int | None = None,
    deepstack_add: jax.Array | None = None,
) -> tuple[jax.Array, KVCache]:
    """One forward step (prefill or decode). Returns (logits (B,T,V), cache).

    ``imatrix``: pass a dict to accumulate per-weight input-activation Σx²
    statistics during the trace (imatrix collection, tools/imatrix
    counterpart); keys are GGUF weight names.

    ``embeds``: (B, T, E) input embeddings overriding the token lookup — the
    multimodal path (mtmd chunked image-token injection counterpart) feeds
    vision-projector outputs here; ``tokens`` is then only used for shape.

    ``attn_mask``: additive (B, 1, T, S) mask REPLACING the internal causal
    mask (tree attention — lookahead decoding's sequence-membership mask).

    ``s_window``: static cap on how many cache slots attention READS (the
    engine's decode-length bucketing): writes land in the full cache, but
    K/V/pos are sliced to [:s_window] for the attention — at n_past ≪ n_ctx
    this removes the dead-slot KV traffic entirely. Caller guarantees every
    valid slot index < s_window. Plain KVCache only (iSWA/paged are already
    window-bounded by construction).

    flash=None auto-selects the Pallas flash-attention kernel on TPU for
    prefill-sized T (where the T×S logits matrix dominates memory). Decode
    (T < 32) stays on XLA-fused attention: measured end-to-end on v5e the
    q-tile-parallel flash kernel LOSES at decode shapes (its grid has no
    sequence parallelism at T=1; depth-8k 8B decode 81.5 vs 87.5 tok/s) —
    tools/flash_decode_probe cells measured under host contention had
    suggested otherwise. The sequence-parallel split-KV decode kernel
    (fattn-vec analog) is ops/flash_attention.flash_decode_attention.
    """
    B, T = tokens.shape
    if flash is None:
        flash = jax.default_backend() == "tpu" and T >= 32
    if hp.alibi or attn_mask is not None:
        flash = False  # bias/custom masks ride the additive-mask attn path
    H, Hkv, D, Dv = hp.n_head, hp.n_head_kv, hp.head_dim, hp.head_dim_v
    # quantized-KV decode rides the split-KV kernel: codes stream from HBM
    # at 1 B (Q8_0) / 0.5 B (Q4_0) per element instead of materializing a
    # 2 B/elem dequantized cache every step (type_k/type_v consumed directly
    # by fattn in the reference, include/llama.h:372-373)
    flash_dec = (not flash
                 and not hp.extra.get("flash_decode_off")    # A/B escape
                 and (jax.default_backend() == "tpu"
                      or bool(hp.extra.get("flash_decode")))  # tests: interpret
                 and not hp.alibi and attn_mask is None
                 and Hkv > 0 and T * (H // max(Hkv, 1)) <= 32)

    inv_freq, mscale, inv_freq_swa, mscale_swa = rope_setup(params, hp)
    kq_scale = hp.f_attn_scale if hp.f_attn_scale > 0.0 else 1.0 / (D ** 0.5)

    safe_pos = jnp.maximum(pos, 0)
    if embeds is not None:
        x = embeds.astype(params["token_embd"].dtype) * hp.f_embedding_scale
    else:
        x = params["token_embd"][tokens] * hp.f_embedding_scale
    if params.get("position_embd") is not None:  # learned positions (gpt2)
        x = x + params["position_embd"][safe_pos]
    if params.get("token_embd_norm") is not None:  # bloom embedding LN
        x = ops.layer_norm(x, params["token_embd_norm"],
                           params.get("token_embd_norm_b"), hp.norm_eps)
    mask_chunk = None
    iswa = isinstance(cache, ISWACache)
    paged = not iswa and not isinstance(cache, KVCache)  # PagedKVCache
    if paged:
        if hp.alibi:
            raise NotImplementedError("alibi models need the regular KV cache")
        from ..ops.paged_attention import paged_flash_attention
        from ..runtime.paged_kv import paged_advance, paged_update_layer
        cache, pslots, poffs = paged_advance(cache, pos)
    elif iswa:
        # two-tier cache: full layers append, SWA layers ring on pos % S_swa
        full_layers, swa_layers = iswa_layer_split(hp)
        fidx = {il: i for i, il in enumerate(full_layers)}
        sidx = {il: i for i, il in enumerate(swa_layers)}
        slots_full = kv_write_slots(cache.full, T)
        slots_swa = kv_ring_slots(pos, cache.swa.max_seq)
        cache = ISWACache(full=kv_advance(cache.full, slots_full, pos),
                          swa=kv_ring_advance(cache.swa, slots_swa, pos))
        if not flash:
            mask_full = causal_mask(cache.full.pos, pos)
            mask_swa = causal_mask(cache.swa.pos, pos, hp.swa_window)
    else:
        slots = kv_write_slots(cache, T)
        cache = kv_advance(cache, slots, pos)
        if s_window is not None and s_window >= cache.pos.shape[1]:
            s_window = None
        wpos = cache.pos[:, :s_window] if s_window else cache.pos
        if not flash:  # flash masks positionally in-kernel; no HBM mask needed
            mask_full = causal_mask(wpos, pos)
            mask_swa = causal_mask(wpos, pos, hp.swa_window) if hp.swa_window else mask_full
        if attn_mask is not None:
            # caller-supplied additive mask (B,1,T,S): tree attention for
            # lookahead decoding / custom sequence-membership visibility
            mask_full = mask_swa = attn_mask.astype(jnp.float32)
        l4c = (hp.extra.get("llama4") or {}).get("chunk", 0)
        if l4c and not flash:
            # llama4 chunked attention on rope layers: visible only within
            # the same attention_chunk_size window
            kp_ = jnp.maximum(wpos, 0)[:, None, None, :]
            qp_ = jnp.maximum(pos, 0)[:, None, :, None]
            mask_chunk = mask_full + jnp.where(
                kp_ // l4c == qp_ // l4c, 0.0, -jnp.inf).astype(jnp.float32)
        if hp.alibi:
            # ALiBi as a per-head additive bias slope·k_pos (shift-invariant
            # equivalent of −slope·(q_pos − k_pos)); ggml slope schedule
            n2 = 1 << (H.bit_length() - 1)
            m0 = 2.0 ** (-hp.max_alibi_bias / n2)
            m1 = 2.0 ** (-hp.max_alibi_bias / (2 * n2))
            slopes = jnp.asarray(
                [m0 ** (i + 1) if i < n2 else m1 ** (2 * (i - n2) + 1)
                 for i in range(H)], jnp.float32)
            kp = jnp.maximum(wpos, 0).astype(jnp.float32)
            mask_full = mask_full + slopes[None, :, None, None] * kp[:, None, None, :]
            mask_swa = mask_full

    swin = bool(hp.extra.get("swin_norm"))   # chameleon: norms AFTER blocks
    for il, layer in enumerate(params["layers"]):
        pfx = f"blk.{il}."
        x_in = x                             # pre-attention residual (arctic)
        # per-layer head/FFN widths (deci/openelm/mimo2: GGUF array KVs)
        H_l, Hkv_l = hp.n_head_il(il), hp.n_head_kv_il(il)
        if hp.n_head_arr is not None and hp.n_ff_il(il) == 0 and H_l > 0:
            # deci FFN-free layer (Nemotron-Ultra): the reference builder
            # computes attention but `continue`s BEFORE the residual add and
            # before inpL is updated (deci.cpp:96-99) — the layer is a no-op
            # on the hidden state, so skip it entirely
            continue
        h = x if swin else _norm(x, layer, "attn_norm", hp)
        if hp.n_head_arr is not None and (H_l == 0 or Hkv_l == 0):
            if H_l == 0:
                # deci attention-free layer: FFN on the raw layer input
                # (deci.cpp:35 cur=inpL; no attention residual)
                attn = None
                ffn_inp = x
            else:
                # deci "linear attention": wo over the attn-norm output
                # (deci.cpp:43-44), normal residual
                ffn_inp = x + mm(h, layer["wo"])
            h2 = _norm(ffn_inp, layer, "ffn_norm", hp)
            x = ffn_inp + dense_ffn(h2, layer, hp, imatrix, pfx)
            cv = params.get("cvec")
            if cv is not None:
                x = x + cv[il]
            if hidden_sink is not None:
                hidden_sink.append(x)
            continue

        _im(imatrix, pfx + "attn_q.weight", h)
        q = mm(h, layer["wq"])
        k = mm(h, layer["wk"])
        v = mm(h, layer["wv"])
        if "bq" in layer:
            q = q + layer["bq"]
        if "bk" in layer:
            k = k + layer["bk"]
        if "bv" in layer:
            v = v + layer["bv"]
        if hp.f_clamp_kqv > 0.0:  # dbrx/mpt clip_qkv
            c = hp.f_clamp_kqv
            q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
        qn = layer.get("attn_q_norm")
        per_head_qk_norm = cham_qk_norm = False
        if qn is not None and qn.ndim == 2:
            # chameleon: per-head LayerNorm with (H, D) weight + bias,
            # applied after head split and before rope (chameleon.cpp:40-63)
            cham_qk_norm = True
        elif qn is not None and qn.shape[-1] == H * D:
            # olmo2-style full-width q/k norms (applied before head split)
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
        else:
            per_head_qk_norm = qn is not None
        q = q.reshape(B, T, H_l, D)
        k = k.reshape(B, T, Hkv_l, D)
        v = v.reshape(B, T, Hkv_l, Dv)
        if Hkv_l < Hkv:   # pad phantom kv heads up to the cache width
            pad = ((0, 0), (0, 0), (0, Hkv - Hkv_l), (0, 0))
            k, v = jnp.pad(k, pad), jnp.pad(v, pad)
        qk_post_rope = hp.extra.get("qk_norm_post_rope")  # maincoder
        if per_head_qk_norm and not qk_post_rope:
            # qwen3-style per-head norms
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)
        elif cham_qk_norm:
            q = ops.layer_norm(q, layer["attn_q_norm"],
                               layer.get("attn_q_norm_b"), hp.norm_eps)
            k = ops.layer_norm(k, layer["attn_k_norm"],
                               layer.get("attn_k_norm_b"), hp.norm_eps)

        swa = hp.swa_window if hp.is_swa_layer(il) else 0
        f, ms = (inv_freq_swa, mscale_swa) if swa else (inv_freq, mscale)
        if hp.extra.get("rope_swa_only") and hp.swa_window > 0:
            # exaone4/exaone-moe: rope ONLY on sliding-window layers; the
            # global-attention layers are NoPE (exaone4.cpp:34)
            nope = not hp.is_swa_layer(il)
        elif hp.extra.get("no_rope_mod_zero"):  # smallthinker: il % step == 0
            nope = (hp.n_no_rope_layer_step > 0
                    and il % hp.n_no_rope_layer_step == 0)
        else:
            nope = (hp.n_no_rope_layer_step > 0
                    and (il + 1) % hp.n_no_rope_layer_step == 0)  # smollm3
        if mrope_pos3 is not None or (hp.extra.get("imrope") and not nope):
            from .qwen2vl import mrope_apply  # M-RoPE (qwen2-vl image spans)

            sec = tuple(hp.extra["mrope_sections"])
            inter = bool(hp.extra.get("imrope"))   # qwen3vl interleaved
            # IMROPE is NOT plain NEOX even for text: the interleaved
            # mapping leaves e-slots on the zero stream — so text positions
            # replicate into t/h/w (llm_graph_input_pos::set_input)
            p3 = (mrope_pos3 if mrope_pos3 is not None
                  else jnp.broadcast_to(safe_pos[None], (3, B, T)))
            q = mrope_apply(q, p3, f, sec, interleaved=inter)
            k = mrope_apply(k, p3, f, sec, interleaved=inter)
        elif hp.rope_type >= 0 and hp.n_rot > 0 and not nope:
            q = ops.apply_rope(q, safe_pos, f, hp.rope_type, ms)
            k = ops.apply_rope(k, safe_pos, f, hp.rope_type, ms)
        l4 = hp.extra.get("llama4")
        if l4 is not None:
            if not nope:  # L2 qk-norm after rope (Llama4TextL2Norm)
                q = (q * jax.lax.rsqrt(
                    jnp.mean(q.astype(jnp.float32) ** 2, -1, keepdims=True)
                    + 1e-6).astype(q.dtype))
                k = (k * jax.lax.rsqrt(
                    jnp.mean(k.astype(jnp.float32) ** 2, -1, keepdims=True)
                    + 1e-6).astype(k.dtype))
            elif l4.get("temp_tuning"):  # temperature tuning on NoPE layers
                ts = (jnp.log1p(jnp.floor(
                    (safe_pos.astype(jnp.float32) + 1.0) / l4["floor_scale"]))
                    * l4["attn_scale"] + 1.0)
                q = (q * ts[:, :, None, None]).astype(q.dtype)

        if per_head_qk_norm and qk_post_rope:  # maincoder: norms AFTER rope
            q = ops.rms_norm(q, layer["attn_q_norm"], hp.rms_eps)
            k = ops.rms_norm(k, layer["attn_k_norm"], hp.rms_eps)

        sinks = layer.get("attn_sinks")
        if paged:
            cache = paged_update_layer(cache, il, pslots, poffs, k, v)
            attn = paged_flash_attention(
                q, cache.k_pages[il], cache.v_pages[il], pos, cache.page_pos,
                cache.table, scale=kq_scale, swa_window=swa,
                logit_softcap=hp.attn_logit_softcap, sinks=sinks,
            )
        else:
            fdec = False
            if iswa and swa:
                li = sidx[il]
                cache = cache._replace(swa=kv_update_layer(
                    cache.swa, li, slots_swa, k, v, mode="drop"))
                ck, cv, cpos = cache.swa.k[li], cache.swa.v[li], cache.swa.pos
            elif iswa:
                li = fidx[il]
                cache = cache._replace(full=kv_update_layer(
                    cache.full, li, slots_full, k, v))
                ck, cv, cpos = cache.full.k[li], cache.full.v[li], cache.full.pos
            else:
                cache = kv_update_layer(cache, il, slots, k, v)
                # q8 rides the kernel (measured +4% at depth 8k end-to-end
                # AND beats the bf16 cache: the bandwidth saving is real).
                # q4 stays on the materialize path: the per-32-group nibble
                # unpack is VPU-bound at 126 GB/s and LOSES 4x end-to-end
                # (15.0 vs 58.4 tok/s at depth 8k) — docs/ops_perf.json.
                fdec = (flash_dec
                        and ((getattr(cache, "quantized", False)
                              and not cache.q4)
                             or bool(hp.extra.get("flash_decode_float")))
                        and not l4c and Hkv_l == Hkv)
                ck, cv = (cache.k[il], cache.v[il]) \
                    if ((flash and cache.quantized and not cache.q4) or fdec) \
                    else kv_layer(cache, il, k.dtype)
                cpos = cache.pos
                if s_window:   # read-side slot cap (decode-length bucketing)
                    ck, cv, cpos = (ck[:, :, :s_window], cv[:, :, :s_window],
                                    wpos)
            if Hkv_l < Hkv:  # strip phantom kv heads (per-layer head counts)
                ck, cv = ck[:, :Hkv_l], cv[:, :Hkv_l]
            if not iswa and not paged and fdec:
                qargs = ({"k_scale": cache.k_scale[il],
                          "v_scale": cache.v_scale[il]}
                         if getattr(cache, "quantized", False) else {})
                if s_window and qargs:
                    qargs = {kq: vq[:, :, :s_window]
                             for kq, vq in qargs.items()}
                attn = flash_decode_attention(
                    q, ck, cv, pos, cpos, scale=kq_scale, swa_window=swa,
                    logit_softcap=hp.attn_logit_softcap, sinks=sinks, **qargs)
            elif flash:
                # Q8_0 caches stream int8 codes into the kernel (per-tile
                # VMEM dequant — HBM traffic stays 1 byte/element)
                qargs = ({"k_scale": cache.k_scale[il],
                          "v_scale": cache.v_scale[il]}
                         if (getattr(cache, "quantized", False)
                             and not cache.q4) else {})
                if s_window and not iswa and qargs:
                    qargs = {k: v[:, :, :s_window] for k, v in qargs.items()}
                attn = flash_attention(
                    q, ck, cv, pos, cpos,
                    scale=kq_scale, swa_window=swa,
                    logit_softcap=hp.attn_logit_softcap, sinks=sinks, **qargs,
                )
            else:
                # grouped-query path wins when K/V traffic dominates (long
                # context or multi-stream batches: measured +24% at B=8 and
                # 3.1x at depth 16k on 8B); the plain reference path fuses
                # better for small single-stream shapes
                attn_fn = (ops.attention_gqa
                           if (ck.shape[2] >= 1024 or B >= 2)
                           else ops.attention_ref)
                use_mask = mask_swa if swa else mask_full
                if mask_chunk is not None and not nope:
                    use_mask = mask_chunk   # llama4: rope layers are chunked
                attn = attn_fn(
                    q, ck, cv,
                    use_mask,
                    scale=kq_scale,
                    logit_softcap=hp.attn_logit_softcap, sinks=sinks,
                )
        attn = attn.reshape(B, T, H_l * Dv)
        if "attn_gate" in layer:
            # afmoe: attention output gated by σ(wqkv_gate·attn_norm_out)
            # BEFORE the o-projection (afmoe.cpp:55,95-100)
            attn = attn * jax.nn.sigmoid(mm(h, layer["attn_gate"]))
        if "attn_sub_norm" in layer:  # bitnet: RMS before the out-projection
            attn = ops.rms_norm(attn, layer["attn_sub_norm"], hp.rms_eps)
        _im(imatrix, pfx + "attn_output.weight", attn)
        attn = mm(attn, layer["wo"])
        if "bo" in layer:
            attn = attn + layer["bo"]
        if "attn_post_norm" in layer:
            attn = _norm(attn, layer, "attn_post_norm", hp)
        if swin:  # chameleon swin_norm: attn_norm applies to the OUTPUT
            attn = _norm(attn, layer, "attn_norm", hp)

        if "ffn_norm_exps" in layer:
            # arctic: dense FFN on the attention residual PLUS a parallel MoE
            # branch normed from the pre-attention input (arctic.cpp:66-97)
            ffn_inp = x_in + attn
            dense = dense_ffn(_norm(ffn_inp, layer, "ffn_norm", hp),
                              layer, hp, imatrix, pfx)
            moe_in = ops.rms_norm(x_in, layer["ffn_norm_exps"], hp.rms_eps)
            x = (ffn_inp + dense) + moe_ffn(moe_in, layer, hp)
            cv = params.get("cvec")
            if cv is not None:
                x = x + cv[il]
            if hidden_sink is not None:
                hidden_sink.append(x)
            continue

        # parallel residual (gptneox/falcon/phi2/command-r): FFN reads its own
        # norm of x when the model ships one (gptneox, falcon-40b ln_mlp),
        # else the shared attn-norm output; one residual add
        if hp.parallel_residual:
            h2 = _norm(x, layer, "ffn_norm", hp) if "ffn_norm" in layer else h
        else:
            x = x + attn * hp.f_residual_scale
            h2 = x if swin else _norm(x, layer, "ffn_norm", hp)
        if "ffn_gate_exps" in layer:
            _im(imatrix, pfx + "ffn_up_exps.weight", h2)
            ffn = moe_ffn(h2, layer, hp,
                          router_x=x_in
                          if hp.extra.get("moe_router_prenorm") else None)
            mdp = hp.extra.get("moe_dense_parallel_scale")
            if mdp and "ffn_up" in layer:
                # grok: dense FFN + MoE from the same input, summed and
                # scaled by sqrt(2)/2 (grok.cpp:88-99)
                ffn = (ffn + dense_ffn(h2, layer, hp)) * mdp
        else:
            ffn = dense_ffn(h2, layer, hp, imatrix, pfx)
        if "ffn_post_norm" in layer:
            ffn = _norm(ffn, layer, "ffn_post_norm", hp)
        if swin:  # chameleon swin_norm: ffn_norm applies to the OUTPUT
            ffn = _norm(ffn, layer, "ffn_norm", hp)
        if hp.parallel_residual:
            x = x + attn + ffn
        else:
            x = x + ffn * hp.f_residual_scale
        # control vector (llama_adapter_cvec::apply_to — per-layer steer add)
        cv = params.get("cvec")
        if cv is not None:
            x = x + cv[il]
        if hidden_sink is not None:  # cvector-generator per-layer taps
            hidden_sink.append(x)
        if deepstack_add is not None and il < deepstack_add.shape[0]:
            # Qwen3-VL DeepStack: vision taps added to the hidden state of
            # the first n_deepstack layers at image positions (zeros
            # elsewhere; Qwen3VLTextModel._deepstack_process)
            x = x + deepstack_add[il].astype(x.dtype)

    x = _norm(x, params, "output_norm", hp)
    w_out = params.get("output")
    logits = mm(x, w_out) if w_out is not None else x @ params["token_embd"].T
    if params.get("output_b") is not None:  # phi2 lm head bias
        logits = logits + params["output_b"]
    if hp.logit_scale != 1.0:
        logits = logits * hp.logit_scale
    if hp.final_logit_softcap > 0.0:
        logits = hp.final_logit_softcap * jnp.tanh(
            logits.astype(jnp.float32) / hp.final_logit_softcap
        ).astype(logits.dtype)
    sup = hp.extra.get("logit_suppress")
    if sup is not None and T == 1:
        # chameleon: image-token ids forced to -FLT_MAX so sampling stays
        # text-only. The reference's ggml_set_1d hack only reaches the FIRST
        # logits row (chameleon.cpp:147-156), i.e. every decode step but not
        # batch evals — replicated by gating on decode-shaped calls.
        neg = jnp.finfo(jnp.float32).min
        logits = logits.at[..., sup[0]:sup[1]].set(neg)
    return logits, cache
