"""Checkpoint manager: latest/periodic/best layout over orbax.

Reference-parity contract (util/misc.py:222-309): every epoch write
``latest``; every ``save_freq`` epochs keep a permanent numbered copy;
optionally track ``best``; resume restores everything + the epoch counter.
Only process 0 writes (orbax handles multi-host coordination when present).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, save_freq: int = 50):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.save_freq = save_freq
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag) -> Path:
        return self.dir / f"checkpoint_{tag}"

    def save(self, epoch: int, state: Any, is_best: bool = False) -> None:
        """Write 'latest' every call, numbered every save_freq, best on flag."""
        payload = {"state": state, "epoch": np.asarray(epoch, np.int32)}
        self._write(self._path("latest"), payload)
        if self.save_freq and epoch % self.save_freq == 0:
            self._write(self._path(f"{epoch:04d}"), payload)
        if is_best:
            self._write(self._path("best"), payload)

    def _write(self, path: Path, payload) -> None:
        # Every process calls save (train.py:186) — orbax barriers
        # internally and only the primary writes — but the overwrite
        # rmtree below is OURS, so it must be process-0-only with an
        # explicit barrier before orbax re-creates the dir (two ranks
        # racing rmtree on a shared dir → ENOENT on the loser).
        import jax

        multi = jax.process_count() > 1
        if path.exists() and (not multi or jax.process_index() == 0):
            import shutil

            shutil.rmtree(path)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_rm:{path.name}")
        self._ckptr.save(path, payload)
        self._ckptr.wait_until_finished()

    def resume(self, state_template: Any, tag: str = "latest"):
        """Returns (state, epoch) or (template, 0) when nothing to resume —
        mirroring reference CheckpointManager.resume (util/misc.py:272-291)."""
        path = self._path(tag)
        if not path.exists():
            return state_template, 0
        target = {"state": state_template, "epoch": np.asarray(0, np.int32)}
        restored = self._ckptr.restore(path, target=target)
        return restored["state"], int(restored["epoch"])

    def exists(self, tag: str = "latest") -> bool:
        return self._path(tag).exists()
