"""LoRA adapters: load a LoRA GGUF and apply it to a loaded model.

Counterpart of src/llama-adapter.{h,cpp} (runtime scaled A·B application) and
convert_lora_to_gguf.py (PEFT → GGUF). TPU-native choice: adapters merge
functionally into the params pytree (w' = w + scale·(α/r)·AᵀBᵀ in our (in,out)
weight convention) — XLA then sees plain dense weights; the unmerged base is
retained by the caller for hot-swap (the reference's llama_set_adapter_lora
add/remove semantics)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter

# GGUF tensor base-name → params key (loader naming)
_GG2KEY = {
    "attn_q": "wq", "attn_k": "wk", "attn_v": "wv", "attn_output": "wo",
    "ffn_gate": "ffn_gate", "ffn_up": "ffn_up", "ffn_down": "ffn_down",
    "ffn_gate_inp": "ffn_gate_inp",
}
_HF2GG = {
    "self_attn.q_proj": "attn_q", "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v", "self_attn.o_proj": "attn_output",
    "mlp.gate_proj": "ffn_gate", "mlp.up_proj": "ffn_up",
    "mlp.down_proj": "ffn_down",
}


@dataclass
class LoraAdapter:
    alpha: float
    # gguf base name (e.g. "blk.0.attn_q.weight") → (A (r,in), B (out,r))
    tensors: dict[str, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)

    @property
    def rank(self) -> int:
        if not self.tensors:
            return 0
        a, _ = next(iter(self.tensors.values()))
        return a.shape[0]


def load_lora(path: str) -> LoraAdapter:
    """Read an adapter GGUF (general.type=adapter, adapter.type=lora)."""
    r = GGUFReader(path)
    md = r.metadata
    if md.get("general.type") not in (None, "adapter"):
        raise ValueError(f"not an adapter GGUF: general.type={md.get('general.type')}")
    alpha = float(md.get("adapter.lora.alpha", 16.0))
    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, ti in r.tensors.items():
        if name.endswith(".lora_a"):
            pairs.setdefault(name[:-7], {})["a"] = ti.astype_f32()
        elif name.endswith(".lora_b"):
            pairs.setdefault(name[:-7], {})["b"] = ti.astype_f32()
    tensors = {}
    for base, ab in pairs.items():
        if "a" not in ab or "b" not in ab:
            raise ValueError(f"incomplete LoRA pair for {base}")
        tensors[base] = (ab["a"], ab["b"])
    r.close()
    return LoraAdapter(alpha=alpha, tensors=tensors)


def merge_lora(params: dict, adapter: LoraAdapter, scale: float = 1.0) -> dict:
    """Return a new params pytree with the adapter merged in.

    Weights in params follow the loader's (in, out) convention, so
    ΔW(in,out) = Aᵀ(in,r) @ Bᵀ(r,out), scaled by scale·α/r.
    """
    s = scale * adapter.alpha / max(adapter.rank, 1)
    out = dict(params)
    out["layers"] = [dict(l) for l in params["layers"]]

    def bump(container: dict, key: str, a: np.ndarray, b: np.ndarray):
        w = container.get(key)
        if w is None:
            raise KeyError(f"LoRA targets missing tensor {key!r}")
        if not isinstance(w, jax.Array):
            raise TypeError(
                f"LoRA apply needs a dense weight for {key!r} "
                "(load the model with keep_quantized=False or dequantize)")
        delta = (a.T @ b.T) * s                       # (in, out)
        container[key] = (w.astype(jnp.float32) + jnp.asarray(delta)).astype(w.dtype)

    for base, (a, b) in adapter.tensors.items():
        name = base[:-7] if base.endswith(".weight") else base
        if name.startswith("blk."):
            _, il, short = name.split(".", 2)
            key = _GG2KEY.get(short)
            if key is None:
                raise KeyError(f"unsupported LoRA target {name!r}")
            bump(out["layers"][int(il)], key, a, b)
        elif name == "output":
            bump(out, "output", a, b)
        else:
            raise KeyError(f"unsupported LoRA target {name!r}")
    return out


def convert_lora_from_peft(
    out_path: str,
    peft_state_dict: dict[str, np.ndarray],
    alpha: float,
    arch: str = "llama",
    n_head: int | None = None,
    n_head_kv: int | None = None,
) -> None:
    """PEFT LoRA state dict → adapter GGUF (convert_lora_to_gguf.py
    counterpart). Permutes the B side of q/k pairs for NORM-rope archs so the
    adapter composes with the permuted base weights."""
    from ..tools.convert_hf import _PERMUTE_QK, permute_qk

    w = GGUFWriter(out_path, arch=arch)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", float(alpha))

    for name, t in peft_state_dict.items():
        t = np.asarray(t, np.float32)
        core = name
        for prefix in ("base_model.model.", "base_model.", ""):
            if core.startswith(prefix):
                core = core[len(prefix):]
                break
        if not core.startswith("model.layers."):
            continue
        rest = core[len("model.layers."):]
        il, proj_and_kind = rest.split(".", 1)
        is_a = ".lora_A." in proj_and_kind
        proj = proj_and_kind.split(".lora_")[0]
        gg = _HF2GG.get(proj)
        if gg is None:
            continue
        if not is_a and arch in _PERMUTE_QK and gg in ("attn_q", "attn_k"):
            heads = n_head if gg == "attn_q" else (n_head_kv or n_head)
            t = permute_qk(t, heads)
        suffix = "lora_a" if is_a else "lora_b"
        w.add_tensor(f"blk.{il}.{gg}.weight.{suffix}", t, GGMLType.F32)
    w.write()


def main(argv=None):
    """convert_lora_to_gguf.py counterpart CLI:
    python -m superllama_tpu.models.lora PEFT_DIR --outfile adapter.gguf
    [--arch llama] [--n-head N] [--n-head-kv N]"""
    import argparse
    import json
    from pathlib import Path

    ap = argparse.ArgumentParser(
        description="Convert a PEFT LoRA adapter directory to GGUF")
    ap.add_argument("adapter_dir")
    ap.add_argument("--outfile", required=True)
    ap.add_argument("--arch", default="llama")
    ap.add_argument("--n-head", type=int, default=None)
    ap.add_argument("--n-head-kv", type=int, default=None)
    a = ap.parse_args(argv)

    d = Path(a.adapter_dir)
    cfg = json.loads((d / "adapter_config.json").read_text())
    alpha = float(cfg.get("lora_alpha", cfg.get("alpha", 1.0)))
    sd = {}
    st = d / "adapter_model.safetensors"
    if st.exists():
        from safetensors import safe_open

        with safe_open(str(st), framework="np") as r:
            for k in r.keys():
                t = r.get_tensor(k)
                sd[k] = (t if t.dtype.kind == "f" else t.astype(np.float32))
    else:
        import torch

        sd = {k: v.float().numpy() for k, v in torch.load(
            str(d / "adapter_model.bin"), map_location="cpu",
            weights_only=True).items()}
    convert_lora_from_peft(a.outfile, sd, alpha, arch=a.arch,
                           n_head=a.n_head, n_head_kv=a.n_head_kv)
    print(f"wrote {a.outfile} (alpha {alpha})")


if __name__ == "__main__":
    main()
