"""Job launcher: config → worker module dispatch (reference launcher.py parity).

The reference resolves ``args.worker`` (a module name in the task YAML) via
importlib and spawns it once per GPU under SLURM/submitit
(launcher.py:47-93). TPU-native: one python process per *host* (not per
chip) — jax owns all local chips; multi-host runs launch this same script on
every host with env.process_id/env.coordinator set, and jax.distributed wires
DCN. No mp.spawn, no rendezvous files, no NCCL env plumbing.

Job management (reference parity):
  * SLURM self-submission — with ``env.slurm=true`` the launcher emits an
    sbatch script (one task per host; jax.distributed coordinator on the
    first node) and submits it, after the reference's ``squeue`` duplicate
    name check (reference submitit submission, launcher.py:118-149).
    ``env.slurm_dry_run=true`` writes the script without submitting;
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


def queued_job_names() -> list[str]:
    """Names of the user's queued/running SLURM jobs (reference
    launcher.py:99-100)."""
    import subprocess

    try:
        out = subprocess.run(
            ["squeue", "-o", "%j", "-u", os.environ.get("USER", "")],
            capture_output=True, text=True, timeout=30,
        ).stdout
    except (OSError, subprocess.TimeoutExpired):
        return []
    return out.split("\n")


def emit_sbatch(args, name: str, overrides: list[str], job_dir: str) -> str:
    """Write {job_dir}/submit.sbatch — one launcher task per host, with the
    jax.distributed coordinator on the first allocated node.

    Mirrors the reference's submitit parameters (launcher.py:124-146):
    partition, timeout, cpus, nodes, mem, nodelist/exclude, requeue with a
    120 s SIGTERM warning (pairs with env.max_requeues + opt.resume for the
    checkpoint_latest resume contract).
    """
    env = args.env
    slurm_name = (f"{args.job_name}-{args.pretrain_job_name}"
                  if args.get("pretrain_job_name") else str(args.job_name))
    nodes = int(env.get("num_processes", 1) or 1)
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name={slurm_name}",
        f"#SBATCH --nodes={nodes}",
        "#SBATCH --ntasks-per-node=1",
        f"#SBATCH --cpus-per-task={int(env.get('workers', 8) or 8)}",
        f"#SBATCH --output={job_dir}/slurm_logs/%j_%t.out",
        "#SBATCH --open-mode=append",
        "#SBATCH --requeue",
        "#SBATCH --signal=TERM@120",
    ]
    if env.get("slurm_partition"):
        lines.append(f"#SBATCH --partition={env.slurm_partition}")
    if env.get("slurm_timeout"):
        lines.append(f"#SBATCH --time={int(env.slurm_timeout)}")
    if env.get("mem_gb"):
        lines.append(f"#SBATCH --mem={int(env.mem_gb)}G")
    if env.get("nodelist"):
        lines.append(f"#SBATCH --nodelist={env.nodelist}")
    if env.get("exclude"):
        lines.append(f"#SBATCH --exclude={env.exclude}")
    ov = " ".join(o for o in overrides
                  if not o.startswith(("env.slurm", "env.process_id",
                                       "env.coordinator")))
    port = int(env.get("coordinator_port", 12321) or 12321)
    lines += [
        "",
        'COORD="$(scontrol show hostnames "$SLURM_JOB_NODELIST" '
        '| head -n1):%d"' % port,
        f"srun python {os.path.abspath(__file__)} --config-name {name} "
        f"{ov} env.slurm=false "
        'env.num_processes=$SLURM_NTASKS env.process_id=$SLURM_PROCID '
        'env.coordinator=$COORD',
        "",
    ]
    os.makedirs(os.path.join(job_dir, "slurm_logs"), exist_ok=True)
    path = os.path.join(job_dir, "submit.sbatch")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path


def submit_slurm(args, name: str, overrides: list[str], job_dir: str) -> int:
    """squeue duplicate check → emit sbatch → submit (unless dry-run)."""
    import subprocess

    slurm_name = (f"{args.job_name}-{args.pretrain_job_name}"
                  if args.get("pretrain_job_name") else str(args.job_name))
    if slurm_name in queued_job_names():
        print(f"Skipping {args.job_name} because already in queue")
        return 0
    path = emit_sbatch(args, name, overrides, job_dir)
    if args.env.get("slurm_dry_run"):
        print(f"sbatch script written (dry run): {path}")
        return 0
    try:
        r = subprocess.run(["sbatch", path], capture_output=True, text=True)
    except OSError as e:
        print(f"sbatch unavailable ({e}); script left at {path}",
              file=sys.stderr)
        return 4
    print((r.stdout or r.stderr).strip())
    return r.returncode


def expand_multirun(argv: list) -> list:
    """Hydra ``-m`` sweep expansion: comma-separated override values sweep
    over their cartesian product (reference ``@hydra.main`` multirun,
    launcher.py:103). ``a=1,2 b=x,y`` → 4 runs. Bracketed values
    (``tkns=[16,8,8]``) are lists, not sweeps — hydra's rule."""
    import itertools

    fixed, keys, valsets = [], [], []
    for a in argv:
        if "=" in a and not a.startswith("-"):
            k, v = a.split("=", 1)
            if "," in v and not v.startswith("["):
                keys.append(k)
                valsets.append(v.split(","))
                continue
        fixed.append(a)
    runs = []
    for combo in itertools.product(*valsets):
        runs.append(fixed + [f"{k}={v}" for k, v in zip(keys, combo)])
    return runs


def run_multirun(name: str, argv: list) -> int:
    """Sequential sweep: each combination runs as its own launcher
    subprocess (fresh jax runtime per run). Returns the first nonzero rc."""
    import subprocess

    runs = expand_multirun(argv)
    print(f"[multirun] {len(runs)} jobs")
    worst = 0
    for i, run_args in enumerate(runs):
        print(f"[multirun] job {i}/{len(runs)}: {' '.join(run_args)}",
              flush=True)
        rc = subprocess.call([sys.executable, __file__, "--config-name",
                              name, *run_args])
        if rc and not worst:
            worst = rc
    return worst


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    name = "deepavfusion"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "-m" in argv or "--multirun" in argv:
        argv = [a for a in argv if a not in ("-m", "--multirun")]
        sys.exit(run_multirun(name, argv))

    from deepavfusion_tpu.config import load_config
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    args = load_config(name, overrides=argv)

    # eval jobs nest under the pretraining job dir (reference launcher.py:108-109)
    if args.get("pretrain_job_name"):
        args["output_dir"] = f"{args.output_dir}/{args.pretrain_job_name}"

    if args.env.get("slurm") and not os.environ.get("SLURM_JOB_ID"):
        job_dir = f"{args.output_dir}/{args.job_name}"
        sys.exit(submit_slurm(args, name, argv, job_dir))

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
