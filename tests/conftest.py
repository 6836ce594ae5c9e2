"""Test harness: force an 8-virtual-device CPU backend before any computation.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): all sharding/pjit tests run against a virtual 8-device mesh.

Note: the environment's sitecustomize may import jax and register a TPU
backend at interpreter startup, so env vars alone are not enough — we must
also override via jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
