"""Dev tool: extract the i-quant lattice codebook tables into iq_grids.npz.

The IQ1/IQ2/IQ3 formats decode through trained codebooks (lattice point
grids) that are part of the wire format — the same numeric tables every
GGUF implementation must ship (reference: ggml/src/ggml-common.h:528-1616,
gguf-py grids). This script parses them out of a reference checkout once and
commits them as a compressed numpy archive (pure format data, like the
unicode tables). Run: python -m superllama_tpu.gguf._gen_iq_grids [ref_path]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

TABLES = {
    # name -> (ctype, expected length)
    "iq2xxs_grid": ("uint64", 256),
    "iq2xs_grid": ("uint64", 512),
    "iq2s_grid": ("uint64", 1024),
    "iq3xxs_grid": ("uint32", 256),
    "iq3s_grid": ("uint32", 512),
    "iq1s_grid": ("uint64", 2048),
}


def parse_tables(common_h: str) -> dict[str, np.ndarray]:
    out = {}
    for name, (ctype, n) in TABLES.items():
        m = re.search(
            rf"GGML_TABLE_BEGIN\({ctype}_t,\s*{name},\s*\w+\)(.*?)GGML_TABLE_END\(\)",
            common_h, re.S)
        if not m:
            raise SystemExit(f"table {name} not found")
        vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", m.group(1))]
        if len(vals) != n:
            raise SystemExit(f"{name}: got {len(vals)} values, want {n}")
        out[name] = np.array(vals, dtype=np.dtype(ctype))
    return out


def main(argv: list[str]) -> int:
    ref = Path(argv[1]) if len(argv) > 1 else Path("/root/reference")
    text = (ref / "ggml/src/ggml-common.h").read_text()
    tables = parse_tables(text)
    dst = Path(__file__).with_name("iq_grids.npz")
    np.savez_compressed(dst, **tables)
    for k, v in tables.items():
        print(f"{k}: {v.shape} {v.dtype}")
    print(f"wrote {dst} ({dst.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
