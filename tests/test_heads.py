"""Tests for segmentation/separation heads + their evaluators."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepavfusion_tpu.models import avsegm as avsegm_mod
from deepavfusion_tpu.models import avsrcsep as avsrcsep_mod
from deepavfusion_tpu.models import deepavfusion as trunk_mod
from deepavfusion_tpu.models.vit import vit_config
from deepavfusion_tpu.train.bss_eval import bss_eval_sources
from deepavfusion_tpu.train.segm_eval import AVSegmEvaluator


def tiny_cfg(image_size=(32, 32), audio_size=(16, 48), depth=3):
    return trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", image_size, 3, depth=depth, embed_dim=64, num_heads=4),
        audio=vit_config("vit_small", audio_size, 1, depth=depth, embed_dim=64, num_heads=4),
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0, fusion_num_heads=4,
    )


# --------------------------------------------------------------------------- #
# AVSrcSep
# --------------------------------------------------------------------------- #
def test_avsrcsep_forward_and_loss():
    cfg = tiny_cfg(audio_size=(16, 48))
    model = avsrcsep_mod.AVSrcSep(cfg, weighted_loss=True, binary_mask=True)
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    mix = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    gt = jax.random.normal(jax.random.key(2), (2, 16, 48, 1))
    variables = model.init(jax.random.key(3), img, mix, gt, train=True)
    (loss, mask, gt_masks), _ = model.apply(
        variables, img, mix, gt, train=True, mutable=["batch_stats"]
    )
    assert mask.shape == (2, 16, 48)  # full mel resolution (gs*16)
    assert np.isfinite(float(loss))
    assert set(np.unique(np.asarray(gt_masks))) <= {0.0, 1.0}


def test_srcsep_loss_semantics():
    # gt binary mask = (spec > spec_mix)
    log_mix = jnp.zeros((1, 4, 4))              # spec_mix = 1
    log_spec = jnp.asarray(np.log10(np.asarray([2.0, 0.5, 1.0, 3.0] * 4,
                           np.float32).reshape(1, 4, 4)))
    pred = jnp.full((1, 4, 4), 10.0)            # sigmoid ≈ 1 → predicts "source louder"
    loss, gt = avsrcsep_mod.srcsep_loss(pred, log_mix, log_spec,
                                        weighted_loss=False, binary_mask=True)
    gt_np = np.asarray(gt).reshape(-1)
    np.testing.assert_array_equal(gt_np[:4], [1, 0, 0, 1])
    # loss is tiny where gt=1 and large where gt=0
    assert float(loss) > 0

    # ratio mask variant
    _, gt2 = avsrcsep_mod.srcsep_loss(pred, log_mix, log_spec,
                                      weighted_loss=False, binary_mask=False)
    v = np.asarray(gt2).reshape(-1)[0]
    np.testing.assert_allclose(v, 2.0 / (2.0 + 1.0 + 1e-5), rtol=1e-4)


# --------------------------------------------------------------------------- #
# AVSegm
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("ncls", [1, 5])
def test_avsegm_forward_and_loss(ncls):
    cfg = tiny_cfg(image_size=(32, 32))
    model = avsegm_mod.AVSegmSimple(cfg, num_classes=ncls)
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    if ncls == 1:
        gt = (jax.random.uniform(jax.random.key(2), (2, 32, 32)) > 0.5).astype(jnp.float32)
    else:
        gt = jax.random.randint(jax.random.key(2), (2, 32, 32), 0, ncls)
    variables = model.init(jax.random.key(3), img, aud, gt, train=True)
    (loss, logits), _ = model.apply(
        variables, img, aud, gt, train=True, mutable=["batch_stats"]
    )
    assert logits.shape == (2, ncls, 32, 32)
    assert np.isfinite(float(loss))


def test_avsegm_ce_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    logits = rng.randn(2, 5, 8, 8).astype(np.float32)
    gt = rng.randint(0, 5, (2, 8, 8))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(gt)
    ).item()
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=1)
    onehot = jax.nn.one_hot(jnp.asarray(gt), 5, axis=1)
    got = float(-(onehot * logp).sum(axis=1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------------------------------------------------------- #
# Evaluators
# --------------------------------------------------------------------------- #
def test_segm_evaluator_perfect_prediction():
    ev = AVSegmEvaluator()
    gt = np.zeros((1, 16, 16), np.int64)
    gt[0, 4:12, 4:12] = 1
    logits = np.where(gt[:, None] == 1, 10.0, -10.0).astype(np.float32)
    ev.update(logits, gt)
    m = ev.average_metrics()
    assert m["miou"] > 0.99
    assert m["fscore"] > 0.99


def test_segm_evaluator_multiclass():
    ev = AVSegmEvaluator()
    gt = np.zeros((1, 12, 12), np.int64)
    gt[0, :6] = 1
    gt[0, 6:, 6:] = 2
    logits = np.full((1, 3, 12, 12), -10.0, np.float32)
    for c in range(3):
        logits[0, c][gt[0] == c] = 10.0
    ev.update(logits, gt)
    m = ev.average_metrics()
    assert m["miou"] > 0.99
    # wrong prediction degrades
    ev2 = AVSegmEvaluator()
    ev2.update(np.roll(logits, 1, axis=1), gt)
    assert ev2.average_metrics()["miou"] < 0.2


def test_segm_evaluator_skips_background_only():
    ev = AVSegmEvaluator()
    gt = np.zeros((1, 8, 8), np.int64)   # background only
    logits = np.zeros((1, 1, 8, 8), np.float32)
    ev.update(logits, gt)
    assert len(ev.iou_list) == 0


def test_bss_eval_identity_and_noise():
    rng = np.random.RandomState(0)
    s1 = rng.randn(8000)
    s2 = rng.randn(8000)
    refs = np.stack([s1, s2])
    sdr, sir, sar, perm = bss_eval_sources(refs, refs.copy(), False)
    assert sdr.min() > 100  # perfect reconstruction → huge SDR
    np.testing.assert_array_equal(perm, [0, 1])

    # estimate = mixture → SIR should be low (interference present)
    mix = np.stack([s1 + s2, s1 + s2])
    sdr2, sir2, sar2, _ = bss_eval_sources(refs, mix, False)
    assert sir2.max() < 10
    assert (sdr.min() - sdr2.max()) > 50


def test_bss_eval_scale_invariance_via_filtering():
    """A scaled/delayed copy is absorbed by the 512-tap projection filter."""
    rng = np.random.RandomState(1)
    s1 = rng.randn(8000)
    s2 = rng.randn(8000)
    refs = np.stack([s1, s2])
    est = np.stack([np.roll(0.5 * s1, 3), np.roll(2.0 * s2, 7)])
    est[0][:3] = 0
    est[1][:7] = 0
    sdr, sir, sar, _ = bss_eval_sources(refs, est, False)
    # edge effects at the zeroed leading samples bound this (~29 dB), same as
    # mir_eval; pure scaling with no delay reaches >300 dB
    assert sdr.min() > 25
    sdr_scale, _, _, _ = bss_eval_sources(refs, np.stack([0.5 * s1, 2.0 * s2]), False)
    assert sdr_scale.min() > 100
