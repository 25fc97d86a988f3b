"""Flash attention Pallas kernel (ggml_flash_attn_ext counterpart, ggml.h:2325;
fattn-*.cu family redesigned for MXU/VMEM).

Design:
 - grid (B, H_kv, T_blocks, S_blocks); each program handles one kv-head's
   query group (GQA: G = H/H_kv query heads share a kv head), one T×S tile
 - online softmax (running max/denominator in VMEM scratch), f32 accumulation
 - masking is positional AND purely arithmetic: causal/sliding-window/empty-
   slot constraints become additive −1e9·min(0,·) penalties computed from the
   cache-slot positions — no (T,S) mask in HBM, and no vector selects (Mosaic
   lowers vselect on this target with pathological VMEM stack usage)
 - softcap for gemma2-style models
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = 1e9  # per-unit positional penalty; violations are ≥1 position apart


def _fa_kernel(qpos_ref, kpos_ref, sinks_ref, q_ref, k_ref, v_ref, ks_ref,
               vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
               scale: float, n_s: int, swa: int, softcap: float,
               has_sinks: bool, quantized: bool):
    s_idx = pl.program_id(3)

    @pl.when(s_idx == 0)
    def _():
        # attention sinks (gpt-oss): the sink is logit #0 of the online
        # softmax — init the running max to it and the denominator to 1
        if has_sinks:
            m_ref[:] = sinks_ref[0].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, :, 0]                 # (BT, G, D)
    bt, g, d = q.shape
    k = k_ref[0, 0]                    # (BS, D)
    v = v_ref[0, 0]                    # (BS, Dv)
    if quantized:
        # Q8_0 KV: int8 codes stream from HBM, dequant per tile in VMEM
        # (i8→i32→f32: Mosaic has no direct 8-bit→float cast)
        k = k.astype(jnp.int32).astype(jnp.float32) * ks_ref[0, 0]
        v = (v.astype(jnp.int32).astype(jnp.float32)
             * vs_ref[0, 0]).astype(jnp.bfloat16)

    qf = q.reshape(bt * g, d).astype(jnp.float32)
    logits = jax.lax.dot_general(
        qf, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (BT*G, BS)
    if softcap > 0.0:
        logits = softcap * jnp.tanh(logits / softcap)

    qpf = qpos_ref[0].astype(jnp.float32)               # (BT*G, 1) row-expanded
    kpf = kpos_ref[0, :, 0][None, :].astype(jnp.float32)  # (1, BS)
    # visible ⇔ 0 ≤ kp ≤ qp (∧ kp > qp − swa); violations are ≥1 apart in
    # integer position space so a −1e9/unit additive penalty kills them
    pen = jnp.minimum(0.0, qpf - kpf) + jnp.minimum(0.0, kpf)
    if swa > 0:
        pen = pen + jnp.minimum(0.0, kpf - qpf + float(swa) - 1.0)
    logits = logits + pen * _NEG

    m_prev = m_ref[:]                  # (BT*G, 1)
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(s_idx == n_s - 1)
    def _():
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = (acc_ref[:] / denom).reshape(bt, g, acc_ref.shape[-1])
        o_ref[0, :, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "swa_window", "logit_softcap", "interpret",
                     "block_s"),
)
def flash_attention(
    q: jax.Array,          # (B, T, H, D)
    k: jax.Array,          # (B, H_kv, S, D) — KV-cache layout
    v: jax.Array,          # (B, H_kv, S, Dv)
    q_pos: jax.Array,      # (B, T) int32, -1 = padding row
    kv_pos: jax.Array,     # (B, S) int32, -1 = empty slot
    scale: float | None = None,
    swa_window: int = 0,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,   # (H,) per-head sink logit (gpt-oss)
    k_scale: jax.Array | None = None,  # (B, H_kv, S) Q8_0 per-row scales
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
    block_s: int | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    Hkv, S, Dv = k.shape[1], k.shape[2], v.shape[3]
    G = H // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    # regroup query heads by kv head: (B, T, Hkv, G, D); positions expanded to
    # row granularity outside the kernel (in-kernel reshape of small int
    # vectors triggers costly Mosaic relayouts)
    qg = q.reshape(B, T, Hkv, G, D)
    qpos_exp = jnp.repeat(q_pos, G, axis=1)[:, :, None]     # (B, T*G, 1)

    bt = min(T, max(8, 128 // G))
    if block_s is not None:
        bs = min(S, block_s)
    elif bt * G <= 32:
        # decode shapes (fattn-vec regime): each S-step does almost no MXU
        # work, so per-grid-step fixed cost dominates at bs=512 (measured
        # ~1.1 µs/step on v5e → 123 GB/s). Stream much larger K/V tiles —
        # VMEM-bounded: k+v tile ≤ ~2 MB buys full HBM bandwidth.
        cap = 8192 if k.dtype == jnp.int8 else 4096
        bs = min(S, cap)
    else:
        bs = min(S, 512)
    # S-overhang blocks would read undefined pad positions into the masking
    # arithmetic: shrink bs to the largest power-of-two divisor of S
    while S % bs:
        bs //= 2
    n_t, n_s = pl.cdiv(T, bt), pl.cdiv(S, bs)

    # per-row sink logits: row-major (bt, G) layout matches the kernel's
    # flattened (bt*G) query rows; expanded host-side to avoid in-kernel
    # relayouts of tiny vectors
    has_sinks = sinks is not None
    if has_sinks:
        sinks_exp = jnp.tile(
            sinks.reshape(Hkv, 1, G).astype(jnp.float32), (1, bt, 1)
        ).reshape(Hkv, bt * G, 1)
    else:
        sinks_exp = jnp.zeros((Hkv, bt * G, 1), jnp.float32)

    quantized = k_scale is not None
    kern = functools.partial(
        _fa_kernel, scale=float(scale), n_s=n_s, swa=int(swa_window),
        softcap=float(logit_softcap), has_sinks=has_sinks,
        quantized=quantized,
    )
    if not quantized:
        inner = kern
        kern = lambda qp, kp, sk, qr, kr, vr, o, m, l, a: inner(
            qp, kp, sk, qr, kr, vr, None, None, o, m, l, a)
    in_specs = [
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, 1), lambda b, h, t, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt * G, 1), lambda b, h, t, s: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 1, G, D), lambda b, h, t, s: (b, t, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, D), lambda b, h, t, s: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, Dv), lambda b, h, t, s: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
    ]
    args = [qpos_exp, kv_pos[:, :, None], sinks_exp, qg, k, v]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, bs, 1), lambda b, h, t, s: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bs, 1), lambda b, h, t, s: (b, h, s, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale[:, :, :, None], v_scale[:, :, :, None]]
    out = pl.pallas_call(
        kern,
        grid=(B, Hkv, n_t, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, 1, G, Dv), lambda b, h, t, s: (b, t, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Hkv, G, Dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, 1), jnp.float32),
            pltpu.VMEM((bt * G, Dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(q.nbytes + k.nbytes + v.nbytes),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(B, T, H, Dv)
