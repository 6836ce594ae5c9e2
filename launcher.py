"""Job launcher: config → worker module dispatch (reference launcher.py parity).

The reference resolves ``args.worker`` (a module name in the task YAML) via
importlib and spawns it once per GPU under SLURM/submitit
(launcher.py:47-93). TPU-native: one python process per *host* (not per
chip) — jax owns all local chips; multi-host runs launch this same script on
every host with env.process_id/env.coordinator set, and jax.distributed wires
DCN. No mp.spawn, no rendezvous files, no NCCL env plumbing.

Job management (reference parity):
  * duplicate-job suppression — an exclusive flock on
    ``{job_dir}/.launcher.lock`` refuses a second concurrent launch of the
    same job (reference ``squeue`` name check, launcher.py:119-123);
  * preemption requeue — with ``env.max_requeues > 0`` the launcher
    supervises the worker in a subprocess and relaunches it when it is
    killed by SIGTERM/SIGKILL (preemption), up to the limit (reference
    submitit ``DelayedSubmission`` requeue, launcher.py:95-96). Each
    relaunch resumes from ``checkpoint_latest`` via the entries'
    ``opt.resume=True`` contract. A worker that exits with a normal Python
    failure (rc 1) is NOT requeued.

Usage:
    python launcher.py --config-name deepavfusion [dotted.overrides=...]
"""
from __future__ import annotations

import importlib
import os
import sys

# Exit codes that mean "killed by the scheduler", not "the job failed":
# SIGTERM/SIGKILL as negative signal numbers (subprocess) or 128+N (shells).
_PREEMPTION_CODES = {-15, -9, 143, 137}

# keep lock fds alive for the lifetime of the process
_HELD_LOCKS: list[int] = []


def acquire_job_lock(job_dir: str) -> bool:
    """Exclusive per-job lock; False if another live launcher holds it.

    flock releases automatically when the holding process dies, so stale
    locks from crashed/preempted jobs never wedge a relaunch.
    """
    import fcntl

    os.makedirs(job_dir, exist_ok=True)
    fd = os.open(os.path.join(job_dir, ".launcher.lock"),
                 os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        os.close(fd)
        return False
    os.ftruncate(fd, 0)
    os.write(fd, f"{os.getpid()}\n".encode())
    _HELD_LOCKS.append(fd)
    return True


def supervise_with_requeue(argv: list[str], max_requeues: int) -> int:
    """Run the worker launcher in a subprocess; relaunch on preemption."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), *argv]
    env = dict(os.environ, _DAVF_LAUNCHER_WORKER="1")
    for attempt in range(max_requeues + 1):
        rc = subprocess.run(cmd, env=env).returncode
        if rc == 0:
            return 0
        if rc not in _PREEMPTION_CODES:
            print(f"worker failed with rc={rc}; not a preemption — no requeue",
                  file=sys.stderr)
            return rc
        if attempt < max_requeues:
            print(f"worker preempted (rc={rc}); requeue "
                  f"{attempt + 1}/{max_requeues} (resumes from "
                  "checkpoint_latest)", file=sys.stderr)
    print(f"worker preempted {max_requeues + 1} times; giving up",
          file=sys.stderr)
    return rc


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    name = "deepavfusion"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]

    from deepavfusion_tpu.config import load_config
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    args = load_config(name, overrides=argv)

    # eval jobs nest under the pretraining job dir (reference launcher.py:108-109)
    if args.get("pretrain_job_name"):
        args["output_dir"] = f"{args.output_dir}/{args.pretrain_job_name}"

    max_requeues = int(args.env.get("max_requeues", 0) or 0)
    if max_requeues > 0 and not os.environ.get("_DAVF_LAUNCHER_WORKER"):
        rc = supervise_with_requeue(
            ["--config-name", name, *argv], max_requeues)
        sys.exit(rc)

    job_dir = f"{args.output_dir}/{args.job_name}"
    if not acquire_job_lock(job_dir):
        print(f"job already running in {job_dir} (.launcher.lock held) — "
              "refusing duplicate launch", file=sys.stderr)
        sys.exit(3)

    if args.env.get("num_processes", 1) > 1:
        mesh_lib.init_distributed(
            args.env.coordinator, args.env.num_processes, args.env.process_id
        )

    worker = importlib.import_module(args.worker)
    worker.main_worker(args)


if __name__ == "__main__":
    main()
