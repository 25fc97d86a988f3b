"""Regenerate the pretokenizer fingerprint table
(convert_hf_to_gguf_update.py counterpart).

The upstream updater downloads every listed tokenizer from HuggingFace,
hashes its encoding of the probe text, and rewrites get_vocab_base_pre's
if-chain. Here the table is data (tools/pretok_hashes.py) and this script
rebuilds it from checkpoint directories:

    python -m superllama_tpu.tools.update_pretok_hashes \
        DIR:pre-name [DIR:pre-name ...] [--merge]

Each DIR is a local HF checkpoint (tokenizer files only suffice);
``pre-name`` is the runtime pretokenizer family to map it to
(tokenizer/pretokenizers.py registry). --merge keeps existing entries and
adds/overrides the given ones (default: merge). With network access the
DIR may be a hub id — AutoTokenizer resolves it; in zero-egress
environments pass local paths.
"""

from __future__ import annotations

import sys
from hashlib import sha256
from pathlib import Path


def chkhsh_of(tokenizer) -> str:
    """sha256 fingerprint of the tokenizer's encoding of the probe text —
    identical recipe to the reference so hashes are interchangeable."""
    from .pretok_hashes import CHK_TXT

    return sha256(str(tokenizer.encode(CHK_TXT)).encode()).hexdigest()


def detect_pre(model_dir: str) -> str | None:
    """chkhsh lookup for a checkpoint dir (get_vocab_base_pre analog):
    returns the tokenizer.ggml.pre name or None when unknown."""
    from transformers import AutoTokenizer

    from .pretok_hashes import CHKHSH_TO_PRE

    tok = AutoTokenizer.from_pretrained(model_dir)
    ent = CHKHSH_TO_PRE.get(chkhsh_of(tok))
    return ent[0] if ent else None


def regenerate(entries: dict[str, tuple[str, str]], path: str) -> None:
    """Rewrite tools/pretok_hashes.py with the given table."""
    from . import pretok_hashes as ph

    src = Path(ph.__file__).read_text()
    head = src.split("CHKHSH_TO_PRE = {", 1)[0]
    lines = ["CHKHSH_TO_PRE = {"]
    for h, (pre, ref) in entries.items():
        lines.append(f'    "{h}":\n        ("{pre}", "{ref}"),')
    lines.append("}")
    Path(path).write_text(head + "\n".join(lines) + "\n")


def main(argv=None) -> int:
    import argparse

    from transformers import AutoTokenizer

    from . import pretok_hashes as ph

    ap = argparse.ArgumentParser(
        description="recompute pretokenizer chkhsh entries from local "
                    "checkpoints")
    ap.add_argument("specs", nargs="+", metavar="DIR:pre-name")
    ap.add_argument("--out", default=ph.__file__,
                    help="table module to rewrite (default: in place)")
    ap.add_argument("--fresh", action="store_true",
                    help="drop existing entries instead of merging")
    a = ap.parse_args(argv)

    table: dict = {} if a.fresh else dict(ph.CHKHSH_TO_PRE)
    for spec in a.specs:
        d, _, pre = spec.rpartition(":")
        if not d or not pre:
            print(f"error: bad spec {spec!r} (want DIR:pre-name)",
                  file=sys.stderr)
            return 1
        try:
            tok = AutoTokenizer.from_pretrained(d)
        except Exception as e:  # noqa: BLE001 — clear zero-egress error
            print(f"error: cannot load tokenizer from {d!r} ({e}) — in "
                  f"zero-egress environments pass a local checkpoint dir",
                  file=sys.stderr)
            return 1
        h = chkhsh_of(tok)
        table[h] = (pre, d)
        print(f"{h[:16]}…  {pre}  ({d})")
    regenerate(table, a.out)
    print(f"wrote {len(table)} entries to {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
