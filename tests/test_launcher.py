"""Launcher dispatch test: worker module resolution + pretrain-dir nesting."""
import sys

sys.path.insert(0, "/root/repo")


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
