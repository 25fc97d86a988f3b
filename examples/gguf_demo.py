"""GGUF read/write roundtrip (examples/gguf counterpart).
Usage: python examples/gguf_demo.py /tmp/demo.gguf"""

import sys

import numpy as np

from superllama_tpu.gguf import GGMLType, GGUFReader, GGUFWriter


def main(path: str):
    w = GGUFWriter(path, arch="demo")
    w.add("demo.block_count", 1)
    w.add("demo.labels", ["a", "b", "c"])
    t = np.arange(64, dtype=np.float32).reshape(8, 8)
    w.add_tensor("tensor.0", t, GGMLType.F32)
    w.write()

    r = GGUFReader(path)
    assert r.metadata["demo.block_count"] == 1
    got = r.tensors["tensor.0"].astype_f32()
    assert np.array_equal(got.reshape(8, 8), t)
    print("roundtrip ok:", dict(list(r.metadata.items())[:3]))
    r.close()


if __name__ == "__main__":
    main(sys.argv[1])
