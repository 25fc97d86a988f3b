"""Legacy GGML/GGMF/GGJT → GGUF converter (convert_llama_ggml_to_gguf.py
counterpart). Handles the pre-GGUF llama binary formats:

  'lmgg' GGML (unversioned), 'fmgg' GGMF v1, 'tjgg' GGJT v1-3

Header: 7×u32 hparams (n_vocab n_embd n_mult n_head n_layer n_rot ftype),
then n_vocab (len, bytes, f32 score[GGMF+]) vocab items, then tensors
(3×u32 n_dims/name_len/dtype, dims, name, 32-byte align [GGJT], data).
Quantized payloads changed in GGJT v2/v3 — only v3 layouts match GGUF, so
quantized conversion requires GGJT v3 (same rule as the reference).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from ..gguf import GGMLType, GGUFWriter
from ..gguf.constants import GGML_TYPE_TRAITS

# old llama.cpp tensor names → GGUF names (gguf-py tensor_mapping of the day)
_NAME_MAP = {
    "tok_embeddings.weight": "token_embd.weight",
    "norm.weight": "output_norm.weight",
    "output.weight": "output.weight",
}
_LAYER_MAP = {
    "attention.wq.weight": "attn_q.weight",
    "attention.wk.weight": "attn_k.weight",
    "attention.wv.weight": "attn_v.weight",
    "attention.wo.weight": "attn_output.weight",
    "attention_norm.weight": "attn_norm.weight",
    "feed_forward.w1.weight": "ffn_gate.weight",
    "feed_forward.w2.weight": "ffn_down.weight",
    "feed_forward.w3.weight": "ffn_up.weight",
    "ffn_norm.weight": "ffn_norm.weight",
}


@dataclass
class GGMLModel:
    fmt: str = "ggjt"
    version: int = 3
    hp: tuple = ()
    vocab: list = field(default_factory=list)
    tensors: list = field(default_factory=list)    # (name, dims, dtype, bytes)


def _map_name(name: str) -> str:
    if name in _NAME_MAP:
        return _NAME_MAP[name]
    if name.startswith("layers."):
        _, il, rest = name.split(".", 2)
        mapped = _LAYER_MAP.get(rest)
        if mapped:
            return f"blk.{il}.{mapped}"
    raise ValueError(f"unmappable legacy tensor name {name!r}")


def load_ggml(path: str) -> GGMLModel:
    data = np.memmap(path, mode="r")
    m = GGMLModel()
    magic = bytes(data[:4])
    off = 4
    if magic == b"GGUF":
        raise ValueError("file is already GGUF")
    if magic == b"lmgg":
        m.fmt, m.version = "ggml", 1
    elif magic in (b"fmgg", b"tjgg"):
        m.version = struct.unpack("<I", data[4:8].tobytes())[0]
        m.fmt = "ggmf" if magic == b"fmgg" else "ggjt"
        off = 8
    else:
        raise ValueError(f"not a legacy GGML file (magic {magic!r})")
    hp = struct.unpack("<7I", data[off:off + 28].tobytes())
    off += 28
    n_vocab, ftype = hp[0], hp[6]
    scores = m.fmt != "ggml"
    for _ in range(n_vocab):
        ln = struct.unpack("<I", data[off:off + 4].tobytes())[0]
        off += 4
        tok = bytes(data[off:off + ln])
        off += ln
        score = 0.0
        if scores:
            score = struct.unpack("<f", data[off:off + 4].tobytes())[0]
            off += 4
        m.vocab.append((tok, score))
    if ftype not in (0, 1) and not (m.fmt == "ggjt" and m.version == 3):
        raise ValueError(
            "quantized payload layouts changed in GGJT v2/v3; only GGJT v3 "
            "quantized files convert losslessly (reference rule)")
    pad = m.fmt == "ggjt"
    n = len(data)
    while off < n:
        n_dims, name_len, dtype = struct.unpack(
            "<3I", data[off:off + 12].tobytes())
        off += 12
        dims = struct.unpack(f"<{n_dims}I",
                             data[off:off + 4 * n_dims].tobytes())
        off += 4 * n_dims
        name = bytes(data[off:off + name_len]).decode()
        off += name_len
        if pad:
            off = (off + 31) & ~31
        t = GGMLType(dtype)
        tr = GGML_TYPE_TRAITS[t]
        nbytes = int(np.prod(dims)) * tr.type_size // tr.block_size
        m.tensors.append((name, dims, t, np.asarray(
            data[off:off + nbytes]).tobytes()))
        off += nbytes
    m.hp = hp
    return m


def convert_ggml_to_gguf(path: str, out_path: str, n_head_kv: int = 0,
                         eps: float = 1e-5) -> None:
    """Legacy file → llama-arch GGUF (vocab carried as SPM tokens/scores;
    n_ff recovered from n_mult exactly as the reference does)."""
    m = load_ggml(path)
    n_vocab, n_embd, n_mult, n_head, n_layer, n_rot, _ = m.hp
    n_ff = ((2 * (4 * n_embd) // 3 + n_mult - 1) // n_mult) * n_mult
    w = GGUFWriter(out_path, arch="llama")
    w.add("general.name", "converted-legacy-ggml")
    w.add("llama.context_length", 2048)
    w.add("llama.embedding_length", int(n_embd))
    w.add("llama.block_count", int(n_layer))
    w.add("llama.feed_forward_length", int(n_ff))
    w.add("llama.attention.head_count", int(n_head))
    w.add("llama.attention.head_count_kv", int(n_head_kv or n_head))
    w.add("llama.rope.dimension_count", int(n_rot))
    w.add("llama.attention.key_length", int(n_embd // n_head))
    w.add("llama.attention.value_length", int(n_embd // n_head))
    w.add("llama.attention.layer_norm_rms_epsilon", float(eps))
    w.add("llama.rope.freq_base", 10000.0)
    w.add("llama.vocab_size", int(n_vocab))
    if m.vocab:
        w.add("tokenizer.ggml.model", "llama")
        w.add("tokenizer.ggml.tokens",
              [t.decode("utf-8", errors="replace") for t, _ in m.vocab])
        w.add("tokenizer.ggml.scores", [float(s) for _, s in m.vocab])
        # legacy files carry no token types: 1=normal, ids 0-2 special (spm)
        types = [1] * n_vocab
        for i, tt in ((0, 2), (1, 3), (2, 3)):
            if i < n_vocab:
                types[i] = tt
        w.add("tokenizer.ggml.token_type", types)
    for name, dims, t, raw in m.tensors:
        # legacy dims are ne-order (row length first) = GGUF ne order
        w.add_tensor(_map_name(name), np.frombuffer(raw, np.uint8),
                     ggml_type=t, raw_ne=tuple(dims))
    w.write()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert legacy GGML/GGMF/GGJT llama files to GGUF")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--gqa", type=int, default=0,
                    help="n_head_kv override for GQA models")
    ap.add_argument("--eps", type=float, default=1e-5)
    a = ap.parse_args(argv)
    convert_ggml_to_gguf(a.input, a.output, n_head_kv=a.gqa, eps=a.eps)
    print(f"wrote {a.output}")


if __name__ == "__main__":
    main()
