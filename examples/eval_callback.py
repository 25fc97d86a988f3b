"""Per-layer activation taps (examples/eval-callback counterpart): print
hidden-state statistics after every layer via the forward's hidden_sink
hook (sched eval-callback analog). Usage: python examples/eval_callback.py model.gguf"""

import sys

import jax.numpy as jnp
import numpy as np

from superllama_tpu.models import load_model
from superllama_tpu.models.registry import get_forward
from superllama_tpu.runtime.kv_cache import kv_cache_init


def main(model_path: str):
    model = load_model(model_path)
    hp = model.hparams
    ids = model.tokenizer.encode("Probe.", add_special=True)
    cache = kv_cache_init(hp.n_layer, 1, 32, hp.n_head_kv, hp.head_dim,
                          hp.head_dim_v, dtype=jnp.float32)
    tokens = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    sink: list = []
    fwd = get_forward(hp.arch)
    fwd(model.params, hp, tokens, pos, cache, hidden_sink=sink)
    stats = []
    for il, h in enumerate(sink):
        a = np.asarray(h, np.float32)
        stats.append((il, float(a.mean()), float(a.std()), float(np.abs(a).max())))
        print(f"layer {il:3d}: mean {stats[-1][1]:+.4f}  std {stats[-1][2]:.4f}"
              f"  absmax {stats[-1][3]:.3f}")
    return stats


if __name__ == "__main__":
    main(sys.argv[1])
