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

# Trace-time toggle for the causal tile-skip (wrap the tile body in
# pl.when(visible)). Measured on v5e at T=S=2048 bf16: the skip buys +3%
# (256×1024 tiles) to +21% (512×512) kernel rate — K/V DMA still streams
# dead tiles, so compute-skip alone can't approach 2× — but inflates the
# Mosaic compile of the 512×512 config from 25 s to 966 s. Default OFF:
# 512×512 noskip is both the fastest-compiling and near-fastest config.
_TILE_SKIP = False


def _fa_kernel(qpos_ref, kpos_ref, sinks_ref, q_ref, k_ref, v_ref, ks_ref,
               vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
               scale: float, n_s: int, swa: int, softcap: float,
               has_sinks: bool, quantized: bool, s_rem: int):
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

    # tile-level causal skip (the reference trims its kernel launch grid to
    # the causal triangle, fattn-common.cuh; a Pallas grid is rectangular, so
    # skip the COMPUTE dynamically instead — the K/V DMA still streams, but
    # prefill is MXU-bound and this halves the MXU/VPU work): a tile is dead
    # when every k slot is empty (<0) or strictly in the future of every q row
    qpi = qpos_ref[0]                        # (BT*G, 1) int32
    kpi = kpos_ref[0, :, 0][None, :]         # (1, BS) int32
    _BIG = jnp.int32(1 << 30)
    kp_min = jnp.min(jnp.where(kpi < 0, _BIG, kpi))
    vis = kp_min <= jnp.max(qpi)
    if swa > 0:
        # sliding window: also dead when every k is out the back of the window
        qp_min = jnp.min(jnp.where(qpi < 0, _BIG, qpi))
        kp_max = jnp.max(jnp.where(kpi < 0, -_BIG, kpi))
        vis = jnp.logical_and(vis, kp_max > qp_min - swa)
    def _tile_body():
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

        if s_rem:
            # partial last S-block: Pallas out-of-bounds block fill is
            # undefined (garbage bf16 can be NaN, and NaN survives any
            # additive penalty), so select-zero the overhang K/V rows; the
            # positional penalty below then kills the (finite) zero logits.
            valid = jnp.where(s_idx == n_s - 1, s_rem, k.shape[0])
            rows = jax.lax.broadcasted_iota(jnp.int32, (k.shape[0], 1), 0)
            k = jnp.where(rows < valid, k, jnp.zeros_like(k))
            v = jnp.where(rows < valid, v, jnp.zeros_like(v))

        # bf16 QK^T on the MXU (f32 accumulate) when inputs are bf16: f32
        # operands run the MXU at a fraction of bf16 rate — matches the
        # reference's f16 K·Q in fattn. f32 inputs keep the exact path (the
        # conformance tests' dtype).
        cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        logits = jax.lax.dot_general(
            q.reshape(bt * g, d).astype(cdt), k.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                          # (BT*G, BS)
        if softcap > 0.0:
            logits = softcap * jnp.tanh(logits / softcap)

        qpf = qpi.astype(jnp.float32)               # (BT*G, 1) row-expanded
        kpf = kpi.astype(jnp.float32)               # (1, BS)
        # visible ⇔ 0 ≤ kp ≤ qp (∧ kp > qp − swa); violations are ≥1 apart in
        # integer position space so a −1e9/unit additive penalty kills them
        pen = jnp.minimum(0.0, qpf - kpf) + jnp.minimum(0.0, kpf)
        if swa > 0:
            pen = pen + jnp.minimum(0.0, kpf - qpf + float(swa) - 1.0)
        if s_rem:
            # out-of-bounds columns carry garbage *positions* too (int32,
            # always finite) — an explicit ≥1-unit penalty per overhang column
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (1, k.shape[0]), 1).astype(jnp.float32)
            pen = pen + jnp.minimum(
                0.0, valid.astype(jnp.float32) - 1.0 - cols)
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

    if _TILE_SKIP:
        pl.when(vis)(_tile_body)
    else:
        _tile_body()

    @pl.when(s_idx == n_s - 1)
    def _():
        _, bt_, _, g_, _ = q_ref.shape
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = (acc_ref[:] / denom).reshape(bt_, g_, acc_ref.shape[-1])
        o_ref[0, :, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "swa_window", "logit_softcap", "interpret",
                     "block_s", "block_t"),
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
    block_t: int | None = None,    # q rows (bt·G) per tile
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

    # q-tile: 512 rows (bt·G) per step — at 128 rows × bs 512 the grid is
    # 2048 steps for T=S=2048 and the ~1 µs/step fixed cost caps the kernel
    # at ~34 TFLOP/s (measured v5e); 512-row tiles amortize it to 72 TFLOP/s
    # (sweep: 512×512 71.9, 256×1024 66.9, 128×1024 52.5 — and 512×512 also
    # Mosaic-compiles 20× faster than the wider-bs configs)
    bt = min(T, max(8, (block_t or 512) // G))
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
    # S-overhang (S % bs) is handled in-kernel: the partial last block's
    # garbage K/V rows are select-zeroed and its columns penalty-masked —
    # never shrink bs for alignment (a prime-factor S would collapse the
    # block to 8 rows and serialize the whole sweep)
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
        quantized=quantized, s_rem=S % bs,
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


# --- split-KV flash-decode kernel (fattn-vec analog) --------------------------
#
# The reference's decode-attention workhorse is a dedicated vector kernel with
# split-KV parallelism and a cross-block combine (ggml-cuda/fattn-vec.cuh +
# the parallel_blocks merge in fattn-common.cuh). The TPU redesign: a single
# TensorCore executes grid steps sequentially with double-buffered block DMA,
# so "split KV" becomes a sequential sweep of large S-chunks whose (m, l, acc)
# partials live in VMEM scratch (the combine is the online-softmax rescale) —
# HBM streaming overlaps compute with no partial-results round-trip to HBM.
#
# What actually bound the generic kernel at decode shapes was NOT parallelism
# but the VPU dequant: casting every int8 K/V element i8→i32→f32 costs ~3 VPU
# ops/element (plus Mosaic relayouts), ~17 µs per 2 MB tile → 123 GB/s. Here
# quantized K/V codes feed the MXU DIRECTLY as int8 (the MXU analog of
# mmvq/fattn-vec's integer dp4a dots):
#  - q is quantized per row to int8 (Q8_1-activation standard, like the
#    reference's quantized K·Q in fattn-vec when K is quantized)
#  - QK^T is an int8 MXU dot; scales (q_row · k_row · softmax scale) apply to
#    the small (TG, BS) f32 logits, not the big K tile
#  - p·V folds V's per-row scale into p (O(TG·BS) VPU work), quantizes p per
#    row to int8, and does an int8 MXU dot with the raw V codes
#  - Q4_0: nibble codes unpack to int8 in VPU (half the HBM traffic of Q8_0);
#    per-32-group scales make QK^T / p·V per-group dot sums
# Per-element VPU work on the streamed K/V bytes is ZERO in the Q8_0 path.


def _nib_lo_hi(c32):
    """(rows, n) int32 packed bytes → (lo-8, hi-8) int8 nibble planes."""
    lo = (c32 & 0xF) - 8
    hi = (c32 >> 4) - 8
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _nib_planes_swar(c8):
    """(rows, n) int8 packed bytes → RAW (lo, hi) nibble planes, 0..15.

    SWAR on 4-per-lane packed sublanes: pltpu.bitcast round-trips
    positionally and the shift+mask is position-independent, so the whole
    unpack is ~3 lane-ops per 4 bytes instead of the per-element i32
    detour (~7 per byte) that left the q4 decode kernel VPU-bound. The −8
    code offset is NOT applied here — callers fold it into the integer
    dot (Σ q·(c−8) = Σ q·c − 8·Σ q), keeping all arithmetic i8-packed."""
    t = pltpu.bitcast(c8, jnp.int32)
    lo = pltpu.bitcast(t & 0x0F0F0F0F, jnp.int8)
    hi = pltpu.bitcast((t >> 4) & 0x0F0F0F0F, jnp.int8)
    return lo, hi


def _gsel(gn: int, d: int):
    """(gn, d) 0/1 selector: row g lights the lanes whose packed [lo‖hi]
    column belongs to 32-group g (col c ↦ group (c mod d/2)//16). A dot
    with this expands per-group scales to lanes on the MXU — Mosaic has no
    cheap lane-repeat, and 16-wide lane slices each cost a relayout."""
    colg = (jax.lax.broadcasted_iota(jnp.int32, (gn, d), 1) % (d // 2)) // 16
    rowg = jax.lax.broadcasted_iota(jnp.int32, (gn, d), 0)
    return (colg == rowg).astype(jnp.float32)


def _fd_kernel(qpos_ref, kpos_ref, sinks_ref, q_ref, qs_ref, k_ref, v_ref,
               ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref, *,
               scale: float, n_s: int, swa: int, softcap: float,
               has_sinks: bool, mode: str, s_rem: int, d: int, dv: int):
    s_idx = pl.program_id(2)

    @pl.when(s_idx == 0)
    def _():
        if has_sinks:
            m_ref[:] = sinks_ref[0].astype(jnp.float32)
            l_ref[:] = jnp.ones_like(l_ref)
        else:
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qpi = qpos_ref[0]                        # (TG, 1) int32
    kpi = kpos_ref[0, 0, 0][None, :]         # (1, BS) int32
    _BIG = jnp.int32(1 << 30)
    kp_min = jnp.min(jnp.where(kpi < 0, _BIG, kpi))
    vis = kp_min <= jnp.max(qpi)
    if swa > 0:
        qp_min = jnp.min(jnp.where(qpi < 0, _BIG, qpi))
        kp_max = jnp.max(jnp.where(kpi < 0, -_BIG, kpi))
        vis = jnp.logical_and(vis, kp_max > qp_min - swa)

    @pl.when(vis)
    def _():
        q = q_ref[0, :, 0]                   # (T, G, D) — int8 in q8/q4 mode
        bt, g, _ = q.shape
        tg = bt * g
        q2 = q.reshape(tg, q.shape[-1])
        bs = k_ref.shape[2]

        if mode == "f":
            k = k_ref[0, 0]                  # (BS, D)
            if s_rem:
                valid = jnp.where(s_idx == n_s - 1, s_rem, bs)
                rows = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
                k = jnp.where(rows < valid, k, jnp.zeros_like(k))
            cdt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
            logits = jax.lax.dot_general(
                q2.astype(cdt), k.astype(cdt),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        elif mode == "q8":
            k = k_ref[0, 0]                  # (BS, D) int8
            ii = jax.lax.dot_general(
                q2, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)          # (TG, BS)
            # scales arrive lane-major (…, n_s, bs), zero-padded past S —
            # garbage codes beyond S are finite int8 and scale to 0
            ksr = ks_ref[0, 0, 0, 0][None, :]              # (1, BS)
            logits = (ii.astype(jnp.float32)
                      * (qs_ref[0, 0] * scale) * ksr)      # (TG,1)·(1,BS)
        else:  # q4: nibble codes → bf16 dequant in VMEM, ONE full-D dot.
            # Per-group lane-slice dots (K=32) were VPU-bound at ~125 GB/s
            # (lane relayouts per 16-col slice). Instead: expand the
            # (D//32, BS) group scales to (BS, D) lanes with a tiny 0/1
            # selector matmul (an MXU op, no lane shuffles), dequantize the
            # packed planes in two elementwise ops, and dot at full D.
            # q arrives pre-permuted host-side to the [lo‖hi] column order
            # (see flash_decode_attention), so no nibble interleave occurs.
            lo8, hi8 = _nib_planes_swar(k_ref[0, 0])       # (BS, D//2) raw
            ks = ks_ref[0, 0]                              # (D//32, BS)
            cat = jnp.concatenate([lo8, hi8], axis=-1)     # (BS, D) permuted
            ks_exp = jax.lax.dot_general(
                ks, _gsel(d // 32, d), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (BS, D)
            kdeq = ((cat.astype(jnp.bfloat16) - jnp.bfloat16(8.0))
                    * ks_exp.astype(jnp.bfloat16))
            logits = jax.lax.dot_general(
                q2.astype(jnp.bfloat16), kdeq,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

        if softcap > 0.0:
            logits = softcap * jnp.tanh(logits / softcap)

        qpf = qpi.astype(jnp.float32)
        kpf = kpi.astype(jnp.float32)
        pen = jnp.minimum(0.0, qpf - kpf) + jnp.minimum(0.0, kpf)
        if swa > 0:
            pen = pen + jnp.minimum(0.0, kpf - qpf + float(swa) - 1.0)
        # (kv_pos is -1-padded past S, so its penalty masks the overhang)
        logits = logits + pen * _NEG

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)                        # (TG, BS) f32
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[:] = m_new

        def _p_int8_dot(pv, codes):
            """Quantize pv rows to int8, integer-dot with int8 codes."""
            pmax = jnp.max(jnp.abs(pv), axis=-1, keepdims=True)
            ps = pmax / 127.0
            inv = jnp.where(pmax > 0, 127.0 / pmax, 0.0)
            p8 = jnp.round(pv * inv).astype(jnp.int8)
            ii = jnp.dot(p8, codes, preferred_element_type=jnp.int32)
            return ii.astype(jnp.float32) * ps

        if mode == "f":
            v = v_ref[0, 0]                  # (BS, Dv)
            if s_rem:
                rows = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0)
                v = jnp.where(rows < valid, v, jnp.zeros_like(v))
            upd = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        elif mode == "q8":
            v = v_ref[0, 0]                  # (BS, Dv) int8
            vs = vs_ref[0, 0, 0, 0][None, :]                # (1, BS)
            upd = _p_int8_dot(p * vs, v)
        else:  # q4 V: bf16 dequant in VMEM (same scheme as K); output
            # columns land in the permuted [lo‖hi] order, un-permuted
            # host-side after the pallas_call
            lov, hiv = _nib_planes_swar(v_ref[0, 0])        # (BS, Dv//2) raw
            vs = vs_ref[0, 0]                               # (Dv//32, BS)
            catv = jnp.concatenate([lov, hiv], axis=-1)     # (BS, Dv)
            vs_exp = jax.lax.dot_general(
                vs, _gsel(dv // 32, dv), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (BS, Dv)
            vdeq = ((catv.astype(jnp.bfloat16) - jnp.bfloat16(8.0))
                    * vs_exp.astype(jnp.bfloat16))
            upd = jnp.dot(p.astype(jnp.bfloat16), vdeq,
                          preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha + upd

    @pl.when(s_idx == n_s - 1)
    def _():
        _, bt_, _, g_, _ = q_ref.shape
        denom = jnp.maximum(l_ref[:], 1e-30)
        out = acc_ref[:] / denom                            # (TG, Dv)
        # q4 output columns land nibble-permuted; the un-permute happens
        # HOST-side after the pallas_call (a lane-crossing reshape here is
        # an unsupported Mosaic shape cast)
        o_ref[0, :, 0] = out.reshape(bt_, g_, dv).astype(o_ref.dtype)


def _q4_perm(x):
    """Permute the last dim to the nibble unpack order [all evens ‖ all
    odds] — the column order of concat(lo_plane, hi_plane) for the
    interleaved packing (byte j = e_2j lo, e_2j+1 hi)."""
    *lead, D = x.shape
    g = x.reshape(*lead, D // 2, 2)            # [(e0,o0), (e1,o1), ...]
    return jnp.swapaxes(g, -1, -2).reshape(*lead, D)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "swa_window", "logit_softcap", "interpret",
                     "block_s"),
)
def flash_decode_attention(
    q: jax.Array,          # (B, T, H, D) float — T·G ≤ 32 (decode shapes)
    k: jax.Array,          # (B, Hkv, S, D) float | int8 (Q8_0) | uint8 (Q4_0, S×D/2)
    v: jax.Array,          # (B, Hkv, S, Dv) (Q4_0: S×Dv/2)
    q_pos: jax.Array,      # (B, T) int32, -1 = padding row
    kv_pos: jax.Array,     # (B, S) int32, -1 = empty slot
    scale: float | None = None,
    swa_window: int = 0,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,
    k_scale: jax.Array | None = None,  # Q8_0: (B,Hkv,S); Q4_0: (B,Hkv,S,D/32)
    v_scale: jax.Array | None = None,
    interpret: bool | None = None,
    block_s: int | None = None,
) -> jax.Array:
    """Decode-shape attention over a (possibly quantized) KV cache.

    ggml_flash_attn_ext decode counterpart — the fattn-vec.cuh analog (see
    module comment above for the TPU redesign rationale). Supports float,
    Q8_0 (int8 + per-row scale) and Q4_0 (nibble-packed + per-32-group
    scale) KV without materializing a dequantized cache: HBM traffic is
    1 byte (Q8_0) / 0.5 byte (Q4_0) per element, like the reference's
    direct quantized-KV consumption (include/llama.h:372-373 type_k/type_v).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    Dv = v.shape[3] * (2 if k_scale is not None and k_scale.ndim == 4 else 1)
    G = H // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if k_scale is None:
        mode = "f"
    elif k_scale.ndim == 4:
        mode = "q4"
    else:
        mode = "q8"

    qg = q.reshape(B, T, Hkv, G, D)
    if mode == "f":
        q_in, qs = qg, jnp.zeros((B, Hkv, T * G, 1), jnp.float32)
    elif mode == "q4":
        # q stays float, columns permuted to the packed [lo‖hi] order; the
        # kernel dequantizes K/V to bf16 in VMEM (no int8-activation dot)
        q_in = _q4_perm(qg)
        qs = jnp.zeros((B, Hkv, T * G, 1), jnp.float32)
    else:
        qf = qg.astype(jnp.float32)
        amax = jnp.max(jnp.abs(qf), axis=-1)               # (B,T,Hkv,G)
        inv = jnp.where(amax > 0, 127.0 / amax, 0.0)
        q_in = jnp.round(qf * inv[..., None]).astype(jnp.int8)
        qs = jnp.transpose(amax / 127.0, (0, 2, 1, 3)).reshape(
            B, Hkv, T * G, 1)

    qpos_exp = jnp.repeat(q_pos, G, axis=1)[:, :, None]    # (B, T*G, 1)
    # 2048-slot KV chunks: big enough to amortize the ~1 µs/grid-step fixed
    # cost, small enough that Mosaic's int8-dot operand staging stays inside
    # the 16 MB VMEM budget (bs=8192 q8 hits a 24 MB scoped-vmem OOM)
    bs = min(S, block_s or 2048)
    n_s = pl.cdiv(S, bs)
    Sp = n_s * bs
    # per-slot operands ride lane-major (…, n_s, bs) layouts: a (bs, 1)
    # block is a 1-lane DMA and dominated the grid-step cost. Padding past
    # S: pos -1 (position penalty masks), scales 0 (zero contribution).
    # the singleton axis before bs keeps the second-minor BLOCK dim equal to
    # its array dim (Mosaic requires block dims divisible by (8, 128) or
    # equal to the array dim — a (1, bs) block over an (n_s, bs) array is
    # illegal for n_s > 1)
    kvp3 = (kv_pos if Sp == S else jnp.pad(
        kv_pos, ((0, 0), (0, Sp - S)), constant_values=-1)
    ).reshape(B, n_s, 1, bs)
    if mode == "q8":
        pads = ((0, 0), (0, 0), (0, Sp - S))
        ks_l = jnp.pad(k_scale, pads).reshape(B, Hkv, n_s, 1, bs)
        vs_l = jnp.pad(v_scale, pads).reshape(B, Hkv, n_s, 1, bs)
    elif mode == "q4":
        pads = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        ks_l = jnp.transpose(jnp.pad(k_scale, pads), (0, 1, 3, 2))
        vs_l = jnp.transpose(jnp.pad(v_scale, pads), (0, 1, 3, 2))

    has_sinks = sinks is not None
    if has_sinks:
        sinks_exp = jnp.tile(
            sinks.reshape(Hkv, 1, G).astype(jnp.float32), (1, T, 1)
        ).reshape(Hkv, T * G, 1)
    else:
        sinks_exp = jnp.zeros((Hkv, T * G, 1), jnp.float32)

    kern = functools.partial(
        _fd_kernel, scale=float(scale), n_s=n_s, swa=int(swa_window),
        softcap=float(logit_softcap), has_sinks=has_sinks, mode=mode,
        s_rem=S % bs, d=D, dv=Dv)
    if mode == "f":
        inner = kern
        kern = lambda qp, kp, sk, qr, qsr, kr, vr, o, m, l, a: inner(
            qp, kp, sk, qr, qsr, kr, vr, None, None, o, m, l, a)

    Dk = k.shape[3]          # packed width in q4 mode
    Dvp = v.shape[3]
    in_specs = [
        pl.BlockSpec((1, T * G, 1), lambda b, h, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, bs), lambda b, h, s: (b, s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T * G, 1), lambda b, h, s: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, 1, G, D), lambda b, h, s: (b, 0, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T * G, 1), lambda b, h, s: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, Dk), lambda b, h, s: (b, h, s, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bs, Dvp), lambda b, h, s: (b, h, s, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qpos_exp, kvp3, sinks_exp, q_in, qs, k, v]
    if mode == "q8":
        in_specs += [
            pl.BlockSpec((1, 1, 1, 1, bs), lambda b, h, s: (b, h, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, bs), lambda b, h, s: (b, h, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [ks_l, vs_l]
    elif mode == "q4":
        in_specs += [
            pl.BlockSpec((1, 1, D // 32, bs), lambda b, h, s: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Dv // 32, bs), lambda b, h, s: (b, h, 0, s),
                         memory_space=pltpu.VMEM),
        ]
        args += [ks_l, vs_l]
    out = pl.pallas_call(
        kern,
        grid=(B, Hkv, n_s),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, 1, G, Dv), lambda b, h, s: (b, 0, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Hkv, G, Dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((T * G, 1), jnp.float32),
            pltpu.VMEM((T * G, 1), jnp.float32),
            pltpu.VMEM((T * G, Dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(k.nbytes + v.nbytes),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(*args)
    if mode == "q4":
        # invert the nibble permutation ([evens ‖ odds] → natural)
        out = out.reshape(B, T, Hkv, G, 2, Dv // 2)
        out = jnp.swapaxes(out, -1, -2).reshape(B, T, Hkv, G, Dv)
    return out.reshape(B, T, H, Dv)
