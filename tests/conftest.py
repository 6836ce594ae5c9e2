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

# Persistent XLA compilation cache (same dir runtime.setup() uses for the
# TPU path; entries are keyed by platform so CPU/TPU coexist). The suite's
# wall time is dominated by recompiling the same tiny CPU programs every
# run — with a warm cache the default gate drops several-fold (VERDICT r3
# item 8). Subprocess tests inherit it through the environment.
#
# The dir is fingerprinted by the host CPU's feature flags: XLA:CPU cache
# entries are AOT machine code, and the cache key does NOT include machine
# features — an entry compiled on a different host is rejected at load
# ("Target machine feature +prefer-no-gather is not supported") but never
# re-stored, so a stale dir means every run recompiles everything, forever
# (measured: 31 s/worker vs ~5 s warm for tests/mp_worker.py).
def _cpu_fingerprint():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform
    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


_cache = os.path.expanduser(
    os.environ.get("DAVF_XLA_CACHE",
                   f"~/.cache/deepavfusion_tpu/xla-tests-{_cpu_fingerprint()}"))
os.makedirs(_cache, exist_ok=True)
os.environ["DAVF_XLA_CACHE"] = _cache   # inherited by subprocess tests
# entries call runtime.setup(), which would redirect the cache to the main
# (TPU) dir mid-suite — pin it to the test cache for this process tree
os.environ["DAVF_COMPILATION_CACHE"] = _cache
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
