"""Process-level runtime setup: persistent compilation cache, precision.

Import-and-call once at entry-point start. The persistent cache makes
recompiles of the (large) jitted train steps near-instant across process
restarts — essential for the checkpoint-resume contract (a preempted job
must not pay the full XLA compile again).
"""
from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/deepavfusion_tpu/xla")


def ensure_cpu_platform():
    """Co-register the CPU backend when ``jax_platforms`` is pinned.

    Some deployments pin ``jax_platforms`` to a single accelerator platform
    at interpreter startup (e.g. a sitecustomize pinning the tunneled TPU),
    which de-registers the CPU backend entirely. The framework needs host CPU
    for cheap param init (`init_params`), bicubic pos-embed interpolation,
    and the complex-FFT DSP in eval_avsrcsep (unimplemented on TPU). Must run
    before any device query; a no-op if backends are already initialized.
    """
    try:
        plats = jax.config.jax_platforms
    except AttributeError:  # config name drift across jax versions
        return
    if not plats or "cpu" in plats.split(","):
        return
    try:
        jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass  # backends already initialized; host_cpu_device() will fall back


def host_cpu_device():
    """The host CPU device, or the default device if CPU isn't registered.

    Use as ``with jax.default_device(runtime.host_cpu_device()):`` around
    op-by-op host work (param init, small preprocessing) so it never pays
    per-op dispatch through a remote-TPU tunnel.
    """
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.devices()[0]


def setup(compilation_cache: str | None = None, matmul_precision: str | None = None):
    ensure_cpu_platform()
    cache_dir = compilation_cache or os.environ.get(
        "DAVF_COMPILATION_CACHE", _DEFAULT_CACHE
    )
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)
