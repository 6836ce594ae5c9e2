"""Console metric meters (reference util/meters.py parity).

SmoothedValue keeps a sliding window + global sum/count; MetricLogger prints
windowed medians/averages with iteration/data timing and ETA. Cross-process
synchronization sums [count, total] over hosts via process_allgather —
the DCN analogue of the reference's dist.all_reduce (util/meters.py:28-39).
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable

import numpy as np

import jax


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], np.float64)
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, n: int = 1, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v), n=n)

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def latest(self):
        return {k: m.value for k, m in self.meters.items()}

    def averages(self):
        return {k: m.global_avg for k, m in self.meters.items()}

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    print(f"{header} [{i}/{total}] eta: {eta_str} {self} "
                          f"time: {iter_time} data: {data_time}", flush=True)
                else:
                    print(f"{header} [{i}] {self} time: {iter_time} data: {data_time}",
                          flush=True)
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))} "
              f"({elapsed / max(i, 1):.4f} s/it)", flush=True)


class DeferredMetrics:
    """Materialize device metrics one step late.

    ``float(metrics['loss'])`` on a live jax array blocks the host until the
    step finishes — done every step it serializes dispatch with execution
    and, through a remote-dispatch tunnel, adds a full round trip per step.
    Double-buffering keeps the pipeline one step deep: step i's metrics are
    pulled to the host while step i+1 runs. (The NaN abort fires one step
    late, which costs at most one wasted step.)
    """

    def __init__(self):
        self._pending = None

    def push(self, tag, metrics):
        """Buffer (tag, device-metrics); return the PREVIOUS step's
        (tag, host-float-metrics) or None on the first call."""
        out = self.pop()
        self._pending = (tag, metrics)
        return out

    def pop(self):
        if self._pending is None:
            return None
        tag, m = self._pending
        self._pending = None
        return tag, {k: float(v) for k, v in m.items()}
