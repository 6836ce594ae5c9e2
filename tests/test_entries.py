"""End-to-end entry-point tests on the virtual 8-device CPU mesh.

Each task entry runs main_worker() with a tiny config on synthetic data:
one debug epoch of sharded train steps + the eval pass + checkpointing.
This is the multi-chip validation path (SURVEY.md §4): same pjit programs,
8 virtual devices.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from deepavfusion_tpu.config import load_config

# The conv-heavy entry smokes run IN THE DEFAULT GATE (VERDICT r2 item 7:
# a regression in pretrain/resume/finetune/avsegm/avsrcsep/avsync must be
# visible without opting in). They add ~10 min of CPU-backend compile; set
# SKIP_SLOW_TESTS=1 for quick local iteration. RUN_SLOW_TESTS=1 is still
# accepted for backward compatibility and forces them on.
slow = pytest.mark.skipif(
    os.environ.get("SKIP_SLOW_TESTS", "0") == "1"
    and os.environ.get("RUN_SLOW_TESTS", "0") != "1",
    reason="slow entry smoke (unset SKIP_SLOW_TESTS)",
)

TINY = [
    "model.image.backbone=vit_small",
    "model.audio.backbone=vit_small",
    "model.image.depth=2",
    "model.audio.depth=2",
    "model.fusion.num_heads=6",
    "opt.batch_size=8",
    "opt.epochs=1",
    "opt.accum_iter=2",
    "data.image_size=32",
    "data.audio_mels=16",
    "data.audio_dur=0.75",   # 48-frame mel → 16x48 grid 1x3
    "debug=true",
    "log.print_freq=1",
    "log.save_freq=1",
    "opt.dtype=float32",
    "data.synthetic=true",   # explicit opt-in: real data is the default
]


def test_stock_config_fails_loud_without_data(tmp_path):
    """Launching the stock config on a machine with no dataset must error
    loudly instead of silently training on random noise."""
    import importlib

    mod = importlib.import_module("train")
    args = load_config(
        "deepavfusion",
        overrides=TINY[:-1] + [f"output_dir={tmp_path}",
                               "data.data_path=/nonexistent/vggsound"],
    )
    with pytest.raises(FileNotFoundError, match="random noise"):
        mod.main_worker(args)


def run_entry(module_name, config_name, tmp_path, extra=()):
    import importlib

    mod = importlib.import_module(module_name)
    args = load_config(config_name,
                       overrides=TINY + [f"output_dir={tmp_path}"] + list(extra))
    return mod.main_worker(args)


def test_linprobe_entry(tmp_path):
    stats = run_entry("eval_linprobe", "linprobe", tmp_path)
    assert "val_acc1_all" in stats
    assert np.isfinite(stats["val_acc1_all"])


@slow
def test_finetune_entry(tmp_path):
    stats = run_entry("eval_finetune", "finetune", tmp_path)
    assert "val_acc1_all" in stats


@slow
def test_avsegm_entry(tmp_path):
    stats = run_entry("eval_avsegm", "avsegm", tmp_path)
    assert "miou" in stats


@slow
def test_avsrcsep_entry(tmp_path):
    stats = run_entry("eval_avsrcsep", "avsrcsep", tmp_path,
                      extra=["opt.batch_size=8"])
    assert "sdr" in stats
    assert np.isfinite(stats["sdr"])


@slow
def test_avsync_entry(tmp_path):
    stats = run_entry(
        "eval_avsync", "avsync", tmp_path,
        extra=["model.video.backbone=video_vit_small", "model.video.depth=2",
               "data.num_frames=4", "data.crop_size=32"],
    )
    assert "val_sync_acc" in stats


@slow
def test_avsync_entry_scan_layers(tmp_path):
    """The scan-over-layers video trunk through the full entry (train step +
    eval + checkpoint save) — the compile-size-friendly layout for remote
    XLA compile services (models/video_earlyfusion.py scan_layers)."""
    stats = run_entry(
        "eval_avsync", "avsync", tmp_path,
        extra=["model.video.backbone=video_vit_small", "model.video.depth=2",
               "model.scan_layers=true",
               "data.num_frames=4", "data.crop_size=32"],
    )
    assert "val_sync_acc" in stats


@slow
def test_pretrain_entry(tmp_path):
    import importlib

    mod = importlib.import_module("train")
    args = load_config(
        "deepavfusion",
        overrides=TINY + [f"output_dir={tmp_path}",
                          "model.image.decoder_depth=1",
                          "model.audio.decoder_depth=1"],
    )
    stats = mod.main_worker(args)
    assert "loss" in stats and np.isfinite(stats["loss"])


@slow
def test_pretrain_resume(tmp_path):
    """Checkpoint-resume contract: a second run continues from epoch 1."""
    import importlib

    mod = importlib.import_module("train")
    overrides = TINY + [f"output_dir={tmp_path}", "opt.epochs=2",
                        "model.image.decoder_depth=1",
                        "model.audio.decoder_depth=1"]
    args = load_config("deepavfusion", overrides=overrides)
    mod.main_worker(args)
    # second invocation must resume past epoch 2 and do nothing
    args2 = load_config("deepavfusion", overrides=overrides)
    mod.main_worker(args2)
    ckpts = sorted((tmp_path / args.job_name / "checkpoints").glob("checkpoint_*"))
    assert any("latest" in str(c) for c in ckpts)


@slow
def test_pretrain_entry_scan_layers(tmp_path):
    """scan_layers pretraining end-to-end on the 8-device mesh."""
    import importlib

    mod = importlib.import_module("train")
    args = load_config(
        "deepavfusion",
        overrides=TINY + [f"output_dir={tmp_path}", "model.scan_layers=true",
                          "model.image.decoder_depth=1",
                          "model.audio.decoder_depth=1"],
    )
    stats = mod.main_worker(args)
    assert np.isfinite(stats["loss"])


def test_avloc_entry(tmp_path):
    stats = run_entry("eval_avloc", "linprobe", tmp_path)
    assert "ciou_0.5" in stats and "auc" in stats
    assert 0 <= stats["auc"] <= 100


def test_avloc_metrics():
    from eval_avloc import auc_of_ciou, ciou

    gt = np.zeros((16, 16), np.float32)
    gt[4:12, 4:12] = 1.0
    perfect = gt.copy()
    assert ciou(perfect, gt) == 1.0
    miss = np.zeros_like(gt)
    miss[0:2, 0:2] = 1.0
    assert ciou(miss, gt) < 0.05
    assert auc_of_ciou(np.asarray([1.0, 1.0])) > 0.9
    assert auc_of_ciou(np.asarray([0.0, 0.0])) < 0.1
