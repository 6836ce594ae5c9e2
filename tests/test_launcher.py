"""Launcher tests: worker dispatch, pretrain-dir nesting, duplicate-job
suppression (flock), preemption requeue (supervised relaunch + resume)."""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
LAUNCHER = os.path.join(REPO, "launcher.py")


def _env_with(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}:{REPO}:" + env.get("PYTHONPATH", "")
    return env


def test_duplicate_launch_refused(tmp_path):
    """Second concurrent launch of the same job must refuse (rc=3) —
    reference squeue duplicate-name check, launcher.py:119-123."""
    (tmp_path / "sleep_worker.py").write_text(
        "import pathlib, sys, time\n"
        "def main_worker(args):\n"
        "    pathlib.Path(args.output_dir, 'started').touch()\n"
        "    time.sleep(30)\n"
    )
    cmd = [sys.executable, LAUNCHER, "--config-name", "linprobe",
           "worker=sleep_worker", f"output_dir={tmp_path}", "job_name=dupjob"]
    env = _env_with(tmp_path)
    p1 = subprocess.Popen(cmd, env=env, stderr=subprocess.PIPE)
    try:
        deadline = time.time() + 60
        while not (tmp_path / "started").exists():
            assert time.time() < deadline, "first worker never started"
            assert p1.poll() is None, p1.stderr.read().decode()
            time.sleep(0.2)
        p2 = subprocess.run(cmd, env=env, capture_output=True, text=True,
                            timeout=60)
        assert p2.returncode == 3, (p2.returncode, p2.stderr)
        assert "refusing duplicate launch" in p2.stderr
    finally:
        p1.terminate()
        p1.wait(timeout=10)


def test_preemption_requeue(tmp_path):
    """A SIGTERM'd worker is relaunched and completes on the second attempt
    (reference submitit DelayedSubmission requeue, launcher.py:95-96)."""
    (tmp_path / "flaky_worker.py").write_text(
        "import os, pathlib, signal\n"
        "def main_worker(args):\n"
        "    marker = pathlib.Path(args.output_dir, 'attempt')\n"
        "    if not marker.exists():\n"
        "        marker.touch()\n"
        "        os.kill(os.getpid(), signal.SIGTERM)  # simulate preemption\n"
        "    pathlib.Path(args.output_dir, 'done').touch()\n"
    )
    cmd = [sys.executable, LAUNCHER, "--config-name", "linprobe",
           "worker=flaky_worker", f"output_dir={tmp_path}",
           "job_name=requeuejob", "env.max_requeues=2"]
    r = subprocess.run(cmd, env=_env_with(tmp_path), capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stderr)
    assert "requeue 1/2" in r.stderr
    assert (tmp_path / "done").exists()


def test_real_failure_not_requeued(tmp_path):
    """A plain Python failure (rc=1) must NOT be requeued."""
    (tmp_path / "bad_worker.py").write_text(
        "def main_worker(args):\n"
        "    raise RuntimeError('real failure')\n"
    )
    cmd = [sys.executable, LAUNCHER, "--config-name", "linprobe",
           "worker=bad_worker", f"output_dir={tmp_path}",
           "job_name=badjob", "env.max_requeues=3"]
    r = subprocess.run(cmd, env=_env_with(tmp_path), capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 1
    assert "no requeue" in r.stderr


def test_slurm_emit_dry_run(tmp_path):
    """env.slurm=true emits a complete sbatch script (reference submitit
    submission surface, launcher.py:118-149); dry-run never calls sbatch."""
    cmd = [sys.executable, LAUNCHER, "--config-name", "linprobe",
           f"output_dir={tmp_path}", "job_name=slurmjob",
           "env.slurm=true", "env.slurm_dry_run=true",
           "env.num_processes=4", "env.slurm_partition=tpu",
           "env.slurm_timeout=120", "env.mem_gb=240",
           "env.exclude=badnode1", "env.workers=15"]
    r = subprocess.run(cmd, env=_env_with(tmp_path), capture_output=True,
                       text=True, timeout=120)
    assert r.returncode == 0, (r.returncode, r.stderr)
    script = (tmp_path / "slurmjob" / "submit.sbatch").read_text()
    for frag in ("#SBATCH --job-name=slurmjob", "#SBATCH --nodes=4",
                 "#SBATCH --partition=tpu", "#SBATCH --time=120",
                 "#SBATCH --mem=240G", "#SBATCH --exclude=badnode1",
                 "#SBATCH --cpus-per-task=15", "#SBATCH --requeue",
                 "#SBATCH --signal=TERM@120",
                 "env.num_processes=$SLURM_NTASKS",
                 "env.process_id=$SLURM_PROCID",
                 "env.coordinator=$COORD", "env.slurm=false"):
        assert frag in script, frag


def test_slurm_duplicate_queue_skip(tmp_path, monkeypatch):
    """A job whose SLURM name is already queued is skipped (reference
    launcher.py:119-123)."""
    import launcher

    monkeypatch.setattr(launcher, "queued_job_names",
                        lambda: ["otherjob", "slurmjob"])
    called = {}
    monkeypatch.setattr(launcher, "emit_sbatch",
                        lambda *a, **k: called.setdefault("emit", True))
    try:
        launcher.main(["--config-name", "linprobe",
                       f"output_dir={tmp_path}", "job_name=slurmjob",
                       "env.slurm=true"])
    except SystemExit as e:
        assert e.code == 0
    assert "emit" not in called


def test_launcher_dispatches_worker(tmp_path, monkeypatch):
    import launcher

    called = {}

    class FakeWorker:
        @staticmethod
        def main_worker(args):
            called["worker"] = args.worker
            called["output_dir"] = args.output_dir

    import importlib

    real_import = importlib.import_module
    monkeypatch.setattr(
        importlib, "import_module",
        lambda name: FakeWorker if name == "eval_linprobe" else real_import(name),
    )
    launcher.main([
        "--config-name", "linprobe",
        f"output_dir={tmp_path}",
        "pretrain_job_name=myjob",
    ])
    assert called["worker"] == "eval_linprobe"
    # eval jobs nest under the pretraining job dir (reference launcher.py:108-109)
    assert called["output_dir"].endswith("/myjob")


def test_multirun_expansion():
    """hydra -m semantics: comma values sweep the cartesian product;
    bracketed lists do not sweep."""
    import launcher

    runs = launcher.expand_multirun(
        ["opt.blr=1e-4,2e-4", "opt.epochs=5", "model.tkns=[16,8,8]",
         "data.dataset=vggsound,audioset"])
    assert len(runs) == 4
    assert ["opt.epochs=5", "model.tkns=[16,8,8]",
            "opt.blr=1e-4", "data.dataset=vggsound"] in runs
    assert ["opt.epochs=5", "model.tkns=[16,8,8]",
            "opt.blr=2e-4", "data.dataset=audioset"] in runs
    # no sweep keys: exactly one run, args unchanged
    assert launcher.expand_multirun(["a.b=1"]) == [["a.b=1"]]


def test_multirun_subprocess_sweep(tmp_path):
    """-m launches one worker subprocess per combination (reference
    @hydra.main multirun, launcher.py:103)."""
    (tmp_path / "sweep_worker.py").write_text(
        "import pathlib\n"
        "def main_worker(args):\n"
        "    pathlib.Path(args.output_dir,\n"
        "                 f'ran_{args.opt.blr}_{args.opt.epochs}').touch()\n"
    )
    cmd = [sys.executable, LAUNCHER, "-m", "--config-name", "linprobe",
           "worker=sweep_worker", f"output_dir={tmp_path}",
           "job_name=sweepjob", "opt.blr=0.1,0.2", "opt.epochs=1,2"]
    r = subprocess.run(cmd, env=_env_with(tmp_path), capture_output=True,
                       text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    ran = sorted(p.name for p in tmp_path.glob("ran_*"))
    assert ran == ["ran_0.1_1", "ran_0.1_2", "ran_0.2_1", "ran_0.2_2"], ran
