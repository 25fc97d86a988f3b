"""Fit runtime parameters to device memory (tools/fit-params counterpart).

The reference fits ``-c``/``-ngl`` to free VRAM via llama_params_fit
(tools/fit-params/fit-params.cpp:30-39). The TPU equivalents are context
length (KV bytes) and — when the weights alone exceed HBM — the
layer-streaming residency (runtime/layer_stream.py). Prints recommended CLI
arguments; pure metadata math, no model load.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..gguf import GGMLType, GGUFReader
from ..models.hparams import hparams_from_gguf
from ..ops.qtensor import REPACKABLE

# repacked bytes per wire byte: codes stay packed, but block scales expand to
# f32 SoA planes (ops/qtensor.py layouts)
_REPACK_FACTOR = {
    GGMLType.Q4_0: 1.55, GGMLType.Q4_1: 1.5, GGMLType.Q5_0: 2.3,
    GGMLType.Q5_1: 2.2, GGMLType.Q8_0: 1.1, GGMLType.MXFP4: 2.1,
    GGMLType.IQ4_NL: 2.1, GGMLType.Q2_K: 2.8, GGMLType.Q3_K: 2.2,
    GGMLType.Q4_K: 1.33, GGMLType.Q5_K: 1.45, GGMLType.Q6_K: 1.95,
}


@dataclass
class FitResult:
    weight_bytes: int
    per_layer_bytes: int
    kv_bytes_per_token: int
    n_ctx: int
    n_resident: int          # < n_layer → layer streaming needed
    fits_resident: bool


def fit_params(path: str, hbm_bytes: int = 16 << 30, n_slots: int = 1,
               kv_dtype_bytes: int = 2, utilization: float = 0.85,
               min_ctx: int = 512) -> FitResult:
    r = GGUFReader(path)
    hp = hparams_from_gguf(r)
    weight = 0
    per_layer = 0
    for name, ti in r.tensors.items():
        b = ti.n_bytes
        if len(ti.shape) == 2 and ti.ggml_type in REPACKABLE:
            b = int(b * _REPACK_FACTOR.get(ti.ggml_type, 1.6))
        elif ti.ggml_type in (GGMLType.F16, GGMLType.BF16, GGMLType.F32):
            pass                      # loaded as-is (bf16/f32)
        else:
            b = b * 2                 # dequantized to bf16 at load
        weight += b
        if name.startswith("blk.0."):
            per_layer += b
    r.close()
    kv_tok = hp.n_layer * 2 * hp.n_head_kv * max(hp.head_dim, hp.head_dim_v) \
        * kv_dtype_bytes
    budget = int(hbm_bytes * utilization)
    free_for_kv = budget - weight
    n_ctx = max(free_for_kv // max(kv_tok * n_slots, 1), 0)
    if n_ctx >= min_ctx:
        return FitResult(weight, per_layer, kv_tok, int(n_ctx),
                         hp.n_layer, True)
    # weights don't leave room: fit residency for layer streaming instead
    kv_budget = kv_tok * n_slots * min_ctx
    non_layer = weight - per_layer * hp.n_layer
    n_res = max((budget - kv_budget - non_layer) // max(per_layer, 1), 1)
    n_res = min(int(n_res), hp.n_layer)
    return FitResult(weight, per_layer, kv_tok, min_ctx, n_res,
                     n_res >= hp.n_layer)


def main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="fit-params", description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("--slots", type=int, default=1)
    ap.add_argument("--kv-bytes", type=int, default=2)
    ap.add_argument("--min-ctx", type=int, default=512)
    args = ap.parse_args(argv)
    fr = fit_params(args.model, hbm_bytes=int(args.hbm_gb * (1 << 30)),
                    n_slots=args.slots, kv_dtype_bytes=args.kv_bytes,
                    min_ctx=args.min_ctx)
    print(f"# weights ≈ {fr.weight_bytes / 1e9:.2f} GB, "
          f"KV {fr.kv_bytes_per_token / 1024:.1f} KiB/token")
    if fr.fits_resident:
        print(f"--n-ctx {fr.n_ctx}")
    else:
        print(f"--n-ctx {fr.n_ctx} --layer-stream-resident {fr.n_resident}")
    return 0
