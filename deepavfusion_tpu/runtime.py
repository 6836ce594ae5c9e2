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


def setup(compilation_cache: str | None = None, matmul_precision: str | None = None):
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
