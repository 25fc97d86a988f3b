import numpy as np, jax, jax.numpy as jnp
from superllama_tpu.gguf import GGMLType
from superllama_tpu.gguf.quants import quantize, dequantize
from superllama_tpu.ops.qtensor import repack
from superllama_tpu.ops.qmatmul import qmatmul
rng = np.random.default_rng(0)
M, K, N = 64, 1024, 512
fmts = ["Q4_K","Q5_K","Q6_K","Q2_K","Q3_K"]
x = rng.normal(size=(M, K)).astype(np.float32)
for name in fmts:
    t = getattr(GGMLType, name)
    w = rng.normal(size=(N, K)).astype(np.float32)
    qt = repack(quantize(w, t), t, w.shape)
    wd = dequantize(quantize(w, t), t, w.shape)
    ref = x @ wd.T
    out = np.asarray(qmatmul(jnp.asarray(x), qt))  # M=64 -> 2D fused path
    nmse = float(np.mean((out - ref)**2) / np.mean(ref**2))
    out1 = np.asarray(qmatmul(jnp.asarray(x[:1]), qt, act_quant=True))  # GEMV
    nmse1 = float(np.mean((out1 - ref[:1])**2) / np.mean(ref[:1]**2))
    flag = "" if (nmse < 1e-4 and nmse1 < 1e-4) else "  <-- HIGH"
    print(f"{name}: 2d_nmse={nmse:.2e} mv_nmse={nmse1:.2e}{flag}")
print("OK")
