"""GGUF maintenance tools: metadata editor, endianness converter, hasher.

Counterparts of the gguf-py scripts the reference ships
(gguf-py/gguf/scripts): gguf_set_metadata / gguf_new_metadata (rewrite a
model with added/changed/removed KV pairs, tensors passed through raw),
gguf_convert_endian (byteswap header + tensor payloads for big-endian
hosts), gguf_hash (per-tensor + overall sha1/sha256/uuid-v5 digests).

    python -m superllama_tpu.tools.gguf_edit edit IN OUT \
        --set KEY=VALUE [--set ...] [--remove KEY] [--chat-template FILE]
    python -m superllama_tpu.tools.gguf_edit convert-endian IN OUT {big,little}
    python -m superllama_tpu.tools.gguf_edit hash IN
"""

from __future__ import annotations

import hashlib
import json
import sys
import uuid

import numpy as np

from ..gguf import GGMLType, GGUFReader, GGUFWriter
from ..gguf.constants import GGML_TYPE_TRAITS

# uuid5 namespace the reference derives model UUIDs from (gguf_hash.py)
UUID_NAMESPACE_LLAMA_CPP = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")


def _parse_value(text: str):
    """KEY=VALUE values: JSON when parseable (numbers, bools, arrays,
    strings with quotes), else the raw string."""
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return text


def edit_metadata(in_path: str, out_path: str, set_kv: dict | None = None,
                  remove: list[str] | None = None,
                  arch: str | None = None) -> dict:
    """Copy a GGUF with metadata edits; tensor payloads pass through raw
    (no re-encode, gguf_new_metadata.py copy_with_new_metadata)."""
    r = GGUFReader(in_path)
    set_kv = dict(set_kv or {})
    remove = set(remove or [])
    arch = arch or set_kv.pop("general.architecture",
                              r.metadata["general.architecture"])
    w = GGUFWriter(out_path, arch=arch)
    written = {"set": 0, "removed": 0, "kept": 0}
    for k, v in r.metadata.items():
        if k == "general.architecture":
            continue
        if k in remove:
            written["removed"] += 1
            continue
        if k in set_kv:
            continue                     # replaced below
        w.add(k, v)
        written["kept"] += 1
    for k, v in set_kv.items():
        w.add(k, v)
        written["set"] += 1
    for name, ti in r.tensors.items():
        w.add_tensor(name, ti.raw().copy(), ti.ggml_type, raw_ne=ti.ne)
    r.close()
    w.write()
    return written


# --------------------------- endianness conversion ---------------------------
# Per-format byteswap descriptions: a block is a sequence of (count, itemsize)
# fields; every field with itemsize > 1 is byteswapped in place
# (gguf_convert_endian.py handles the same block formats and rejects others).

_BLOCK_FIELDS = {
    GGMLType.F32: [(1, 4)],
    GGMLType.F16: [(1, 2)],
    GGMLType.BF16: [(1, 2)],
    GGMLType.F64: [(1, 8)],
    GGMLType.I8: [(1, 1)],
    GGMLType.I16: [(1, 2)],
    GGMLType.I32: [(1, 4)],
    GGMLType.I64: [(1, 8)],
    GGMLType.Q8_0: [(1, 2), (32, 1)],                   # d f16, 32 int8
    GGMLType.Q4_0: [(1, 2), (16, 1)],
    GGMLType.Q4_1: [(2, 2), (16, 1)],
    GGMLType.Q5_0: [(1, 2), (4, 1), (16, 1)],
    GGMLType.Q5_1: [(2, 2), (4, 1), (16, 1)],
    GGMLType.Q2_K: [(16, 1), (64, 1), (2, 2)],          # scales, qs, d+dmin
    GGMLType.Q3_K: [(32, 1), (64, 1), (12, 1), (1, 2)],
    GGMLType.Q4_K: [(2, 2), (12, 1), (128, 1)],
    GGMLType.Q5_K: [(2, 2), (12, 1), (32, 1), (128, 1)],
    GGMLType.Q6_K: [(128, 1), (64, 1), (16, 1), (1, 2)],
    GGMLType.Q8_K: [(1, 4), (256, 1), (16, 2)],
}


def _swap_blocks(data: np.ndarray, t: GGMLType) -> np.ndarray:
    fields = _BLOCK_FIELDS.get(t)
    if fields is None:
        raise ValueError(
            f"cannot byteswap tensor type {t.name} (same restriction as "
            f"gguf_convert_endian.py — convert from a wider source type)")
    tr = GGML_TYPE_TRAITS[t]
    blocks = data.reshape(-1, tr.type_size)
    off = 0
    for count, itemsize in fields:
        width = count * itemsize
        if itemsize > 1:
            seg = blocks[:, off:off + width].reshape(-1, count, itemsize)
            blocks[:, off:off + width] = seg[:, :, ::-1].reshape(
                blocks.shape[0], width)
        off += width
    assert off == tr.type_size, (t, off, tr.type_size)
    return blocks.reshape(-1)


def convert_endian(in_path: str, out_path: str, order: str) -> int:
    """Rewrite a (little-endian) GGUF with byteswapped tensor payloads.

    ``order``: 'big' produces a big-endian-payload file (header still
    written by GGUFWriter; a BE host reading with byteswapped headers sees
    native-order data — the reference script's contract), 'little' swaps
    back. Swapping twice is the identity."""
    if order not in ("big", "little"):
        raise ValueError("order must be 'big' or 'little'")
    r = GGUFReader(in_path)
    w = GGUFWriter(out_path, arch=r.metadata["general.architecture"])
    for k, v in r.metadata.items():
        if k != "general.architecture":
            w.add(k, v)
    n = 0
    for name, ti in r.tensors.items():
        raw = np.frombuffer(ti.raw().tobytes(), np.uint8).copy()
        w.add_tensor(name, _swap_blocks(raw, ti.ggml_type), ti.ggml_type,
                     raw_ne=ti.ne)
        n += 1
    r.close()
    w.write()
    return n


# ----------------------------------- hashing ----------------------------------

def hash_gguf(path: str, per_tensor: bool = True) -> dict:
    """sha1/sha256/uuid-v5 digests over tensor payloads in file order
    (gguf_hash.py recipe: overall digests update tensor-by-tensor)."""
    r = GGUFReader(path)
    sha1 = hashlib.sha1()
    sha256 = hashlib.sha256()
    uv5 = hashlib.sha1()
    uv5.update(UUID_NAMESPACE_LLAMA_CPP.bytes)
    out: dict = {"tensors": {}}
    for name, ti in r.tensors.items():
        raw = ti.raw().tobytes()
        if per_tensor:
            out["tensors"][name] = {
                "sha1": hashlib.sha1(raw).hexdigest(),
                "sha256": hashlib.sha256(raw).hexdigest(),
            }
        sha1.update(raw)
        sha256.update(raw)
        uv5.update(raw)
    r.close()
    out["sha1"] = sha1.hexdigest()
    out["sha256"] = sha256.hexdigest()
    out["uuid"] = str(uuid.UUID(bytes=uv5.digest()[:16], version=5))
    return out


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="GGUF metadata/endian/hash tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("edit", help="copy with metadata changes")
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    p.add_argument("--remove", action="append", default=[], metavar="KEY")
    p.add_argument("--chat-template", help="file with a jinja template to "
                                           "install as tokenizer.chat_template")

    p = sub.add_parser("convert-endian", help="byteswap tensor payloads")
    p.add_argument("infile")
    p.add_argument("outfile")
    p.add_argument("order", choices=["big", "little"])

    p = sub.add_parser("hash", help="per-tensor + overall digests")
    p.add_argument("infile")
    p.add_argument("--no-per-tensor", action="store_true")

    a = ap.parse_args(argv)
    if a.cmd == "edit":
        kv = {}
        for s in a.set:
            k, _, v = s.partition("=")
            if not k or not _:
                print(f"error: bad --set {s!r}", file=sys.stderr)
                return 1
            kv[k] = _parse_value(v)
        if a.chat_template:
            kv["tokenizer.chat_template"] = open(a.chat_template).read()
        stats = edit_metadata(a.infile, a.outfile, kv, a.remove)
        print(f"kept {stats['kept']}, set {stats['set']}, "
              f"removed {stats['removed']} → {a.outfile}")
    elif a.cmd == "convert-endian":
        n = convert_endian(a.infile, a.outfile, a.order)
        print(f"byteswapped {n} tensors → {a.outfile}")
    else:
        res = hash_gguf(a.infile, per_tensor=not a.no_per_tensor)
        for name, d in res["tensors"].items():
            print(f"{d['sha256'][:16]}…  {name}")
        print(f"sha1   {res['sha1']}")
        print(f"sha256 {res['sha256']}")
        print(f"uuid   {res['uuid']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
