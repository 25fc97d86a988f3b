"""superllama_tpu — a TPU-native LLM inference & serving framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
GaloSerranoA/Super-llama.cpp (a llama.cpp fork with enterprise serving
features): GGUF block-quantized model loading, fused dequant+matmul Pallas
kernels, paged/spillable KV cache, continuous batching, tensor/expert
parallelism over a TPU mesh, and an OpenAI/Anthropic-compatible server with
priority queueing, rate limiting, RBAC and Prometheus telemetry.

Subpackages
-----------
- ``gguf``      GGUF container + quant codecs (ref: ggml/include/gguf.h format)
- ``tokenizer`` SPM/BPE/WPM tokenizers        (ref: src/llama-vocab.cpp behavior)
- ``models``    architecture registry + forward builders (ref: src/models/)
- ``ops``       jnp reference ops + Pallas TPU kernels (ref: ggml op set)
- ``runtime``   context, KV cache, sampling, batching (ref: src/llama-context.cpp)
- ``parallel``  mesh/sharding policies (replaces ggml_backend_sched + ggml-rpc)
- ``server``    HTTP serving + enterprise ops (ref: tools/server, src/llama-enterprise.h)
"""

__version__ = "0.1.0"
