"""Logging sinks: rank-gated timestamped prints + optional W&B.

Reference parity: setup_for_distributed print-gating teed to train.log
(util/distributed.py:13-34) and WBLogger with persisted run-id + rate-limited
scalar logs (util/misc.py:166-219). wandb is optional — absent in this image,
the logger degrades to a JSONL file sink so metrics are still recorded.
"""
from __future__ import annotations

import builtins
import datetime
import json
from pathlib import Path
from typing import Optional

import jax


_orig_print = builtins.print


def setup_logging(log_file: Optional[str] = None, force_all_ranks: bool = False):
    """Gate printing to process 0, timestamp every line, tee to log_file."""
    is_main = jax.process_index() == 0
    fh = None
    if log_file and is_main:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = open(log_file, "a")

    def gated_print(*args, force: bool = False, **kwargs):
        if not (is_main or force or force_all_ranks):
            return
        now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        _orig_print(f"[{now}]", *args, **kwargs)
        if fh is not None:
            kw = dict(kwargs)
            kw["file"] = fh
            kw["flush"] = True
            _orig_print(f"[{now}]", *args, **kw)

    builtins.print = gated_print
    return gated_print


def reset_logging():
    builtins.print = _orig_print


class MetricsLogger:
    """W&B when available + always a JSONL metrics file; rate-limited by
    print_freq keyed on global optimizer step (reference util/misc.py:211-219)."""

    def __init__(self, job_dir: str, job_name: str, config: dict | None = None,
                 use_wandb: bool = False, entity: str | None = None,
                 project: str | None = None, print_freq: int = 100):
        self.enabled = jax.process_index() == 0
        self.print_freq = max(int(print_freq), 1)
        self.last_step = -1
        self.wandb = None
        self.jsonl = None
        if not self.enabled:
            return
        Path(job_dir).mkdir(parents=True, exist_ok=True)
        self.jsonl = open(Path(job_dir) / "metrics.jsonl", "a")
        if use_wandb:
            try:
                import wandb

                run_id_file = Path(job_dir) / "wandb_runid.txt"
                run_id = run_id_file.read_text().strip() if run_id_file.exists() else None
                self.wandb = wandb.init(
                    dir=job_dir, entity=entity, project=project, name=job_name,
                    id=run_id, resume="allow", config=config,
                )
                run_id_file.write_text(self.wandb.id)
            except Exception as e:  # wandb absent or offline
                print(f"wandb unavailable ({e}); falling back to JSONL only")

    def log(self, metrics: dict, step: int, force: bool = False):
        if not self.enabled or metrics is None:
            return
        if not force and step != 0 and (step - self.last_step) < self.print_freq:
            return
        self.last_step = step
        import numpy as np

        clean = {}
        hists = {}
        for k, v in metrics.items():
            if getattr(v, "ndim", 0) or isinstance(v, (list, tuple)):
                # vector metric: an in-graph histogram (trainer grad_hist/*,
                # log10|g| counts over GRAD_HIST_EDGES — the wandb.watch
                # histogram analogue, reference util/misc.py:208-209)
                hists[k] = np.asarray(v)
            elif hasattr(v, "__float__"):
                clean[k] = float(v)
            else:
                clean[k] = v
        if self.jsonl is not None:
            self.jsonl.write(json.dumps(
                {"step": step, **clean,
                 **{k: h.tolist() for k, h in hists.items()}}) + "\n")
            self.jsonl.flush()
        if self.wandb is not None:
            payload = dict(clean)
            if hists:
                import wandb

                from .trainer import GRAD_HIST_EDGES

                edges = np.asarray(GRAD_HIST_EDGES)
                for k, h in hists.items():
                    try:
                        payload[k] = wandb.Histogram(
                            np_histogram=(h.tolist(), edges.tolist()))
                    except Exception:
                        payload[k] = h.tolist()
            self.wandb.log(payload, step=step)
