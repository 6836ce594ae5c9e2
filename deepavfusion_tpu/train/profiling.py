"""Profiling hooks: jax.profiler trace capture around training steps.

The reference has no profiler integration (SURVEY.md §5.1) — only wall-clock
meters. Here: a ``--profile`` / ``log.profile_steps`` driven context that
captures an XLA trace (viewable in TensorBoard / Perfetto) for a step window,
plus a simple step-timer summary.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Optional

import jax


class StepProfiler:
    """Captures a jax.profiler trace for steps [start, start+num) and keeps
    simple step-time statistics either way."""

    def __init__(self, log_dir: Optional[str] = None, start_step: int = 10,
                 num_steps: int = 0):
        self.log_dir = log_dir
        self.start_step = start_step
        self.num_steps = num_steps
        self._active = False
        self.times: list[float] = []
        self._t0 = None

    def step_begin(self, step: int):
        if (self.num_steps and self.log_dir and not self._active
                and step == self.start_step):
            Path(self.log_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        self._t0 = time.perf_counter()

    def step_end(self, step: int):
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
        if self._active and step >= self.start_step + self.num_steps - 1:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.log_dir}")

    def summary(self) -> dict:
        if len(self.times) <= 1:
            return {}
        steady = self.times[1:]  # drop compile step
        return {
            "step_time_mean_s": sum(steady) / len(steady),
            "step_time_min_s": min(steady),
        }


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield
