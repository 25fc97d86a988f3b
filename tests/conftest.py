"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (mirrors how the reference
tests multi-device logic on the CPU backend, SURVEY.md §4)."""

import os
import sys

# force CPU: the ambient env may point JAX_PLATFORMS at real TPU hardware,
# but unit tests need determinism (f32 matmuls at full precision) and the
# virtual multi-device mesh. Set SLT_TEST_ON_TPU=1 to test on hardware.
if not os.environ.get("SLT_TEST_ON_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# some pytest plugins import jax before this conftest runs, freezing the env
# snapshot — override through the config API too (backends are still lazy here)
if not os.environ.get("SLT_TEST_ON_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
