"""Host-side data loader: worker pool + prefetch → fixed-shape numpy batches.

TPU-native replacement for torch DataLoader + DistributedSampler
(reference util/data.py:6-22): a thread pool decodes samples through the C++
FFmpeg stage (which releases the GIL inside libav), batches are collated to
fixed shapes, and a small prefetch queue overlaps host decode with device
steps. Sharding across hosts is done by slicing the index stream by
process_index (every host loads only its share; the train step's data-axis
sharding consumes the per-host batch).
"""
from __future__ import annotations

import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

import jax


def collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals  # strings (file ids) stay a list
    return out


class DataLoader:
    """Iterable over shuffled, host-sharded, prefetched batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, workers: int = 8, prefetch: int = 4,
                 seed: int = 0, replacement: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        # reference: RandomSampler(replacement=True) when non-distributed
        # (util/data.py:10-12). The get_dataloader factory supplies that
        # reference default; this class-level False only applies to direct
        # DataLoader construction (tests, deterministic eval loaders).
        self.replacement = replacement if replacement is not None else False

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> list[int]:
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        if self.shuffle:
            if self.replacement:
                order = rng.randint(0, n, size=n)
            else:
                order = rng.permutation(n)
        else:
            order = np.arange(n)
        # shard by host
        pc, pi = jax.process_count(), jax.process_index()
        return list(order[pi::pc])

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idxs = self._indices()
        nb = len(self)
        batches = [idxs[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            # q.put(None) MUST run on every exit path: a producer crash that
            # skips the sentinel would deadlock the consumer at q.get().
            try:
                with ThreadPoolExecutor(self.workers) as pool:
                    pending = []
                    for b in batches:
                        if stop.is_set():
                            break
                        pending.append(pool.map(self.dataset.__getitem__, b))
                        # keep at most prefetch+1 batches in flight
                        while len(pending) > self.prefetch:
                            q.put(collate(list(pending.pop(0))))
                    for fut in pending:
                        if stop.is_set():
                            break
                        q.put(collate(list(fut)))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


def get_dataloader(dataset, distributed: bool = True, batch_size: int = 32,
                   workers: int = 8, shuffle: bool = True, drop_last: bool = True,
                   **kw) -> DataLoader:
    """Factory with the reference signature (util/data.py:6-22).

    Matches the reference sampler choice exactly: DistributedSampler
    (shuffled, without replacement) when distributed, else
    RandomSampler(replacement=True) for shuffled non-distributed loading
    (util/data.py:10-12). An explicit ``replacement=`` kwarg overrides.
    """
    if "replacement" not in kw or kw["replacement"] is None:
        kw["replacement"] = bool(shuffle and not distributed)
    return DataLoader(dataset, batch_size, shuffle=shuffle, drop_last=drop_last,
                      workers=workers, **kw)
