"""Worker process for the 2-process jax.distributed CPU-cluster test
(test_multihost.py): serves greedy generation for one model sharded tp
across BOTH processes' devices — the BASELINE config-5 shape (one model
larger than a host, served lockstep over a pod mesh).

Usage: python tests/multihost_worker.py <coordinator> <n_procs> <pid>
       <model.gguf> <out_dir>
"""

import json
import os
import sys


def main() -> None:
    coord, n, pid, model_path, out_dir = sys.argv[1:6]

    import jax

    # CPU cluster: 4 virtual devices per process, no TPU plugin
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(n), process_id=int(pid))

    import numpy as np

    from superllama_tpu.models import load_model
    from superllama_tpu.parallel.mesh import make_sharder
    from superllama_tpu.parallel.multihost import (broadcast_from_primary,
                                                   is_primary, make_pod_mesh,
                                                   replicate)
    from superllama_tpu.runtime.context import Context

    assert jax.process_count() == int(n)
    assert jax.device_count() == 4 * int(n)

    mesh = make_pod_mesh(tp=jax.device_count())
    with mesh:
        model = load_model(model_path, keep_quantized=True,
                           sharder=make_sharder(mesh))
        # the "request" arrives only at the serving primary; secondaries
        # receive it over the collective before entering the jitted steps
        if is_primary():
            prompt = np.asarray(list(range(1, 13)), np.int32)
        else:
            prompt = np.zeros(12, np.int32)
        prompt = np.asarray(broadcast_from_primary(prompt))

        ctx = Context(model, n_ctx=64, kv_dtype=np.float32)
        ctx.cache = replicate(ctx.cache, mesh)
        out = ctx.greedy_generate([int(t) for t in prompt], 8, stop_eog=False)

    with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
        json.dump({"tokens": [int(t) for t in out],
                   "n_processes": jax.process_count(),
                   "n_devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
