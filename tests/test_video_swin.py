"""Tests: video ViT (joint + divided attention), video early fusion, swin decoder."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.models import video_earlyfusion as vef
from deepavfusion_tpu.models import video_vit as vv
from deepavfusion_tpu.models.swin import (SwinBlock, relative_position_index,
                                          shift_attn_mask, window_partition,
                                          window_reverse)
from deepavfusion_tpu.models.vit import vit_config


def small_video_cfg(attention_type="joint_all"):
    return vv.VideoViTConfig(
        input_size=(4, 32, 32), patch_size=(2, 16, 16), embed_dim=48,
        depth=2, num_heads=4, attention_type=attention_type,
    )


@pytest.mark.parametrize("attn_type", ["joint_all", "divided_space_time"])
def test_video_vit_forward(attn_type):
    cfg = small_video_cfg(attn_type)
    model = vv.VideoViT(cfg)
    x = jax.random.normal(jax.random.key(0), (2, 4, 32, 32, 3))
    params = model.init(jax.random.key(1), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 2 * 2 * 2, 48)  # t=2, h=2, w=2 grid
    assert np.isfinite(np.asarray(out)).all()
    if attn_type == "divided_space_time":
        assert "temporal_attn" in params["blocks_0"]
        assert "temporal_fc" in params["blocks_0"]


def test_video_early_fusion_forward():
    cfg = vef.VideoEarlyFusionConfig(
        video=small_video_cfg(),
        audio=vit_config("vit_small", (16, 48), 1, depth=2, embed_dim=48, num_heads=4),
        num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0,
        fusion_num_heads=4,
    )
    model = vef.VideoEarlyFusion(cfg)
    video = jax.random.normal(jax.random.key(0), (2, 4, 32, 32, 3))
    audio = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    params = model.init(jax.random.key(2), video, audio)["params"]
    xv, xa, xf = model.apply({"params": params}, video, audio)
    assert xv.shape == (2, 8, 48)
    assert xa.shape == (2, 3, 48)
    assert xf.shape == (2, 8, 48)


def test_video_early_fusion_scan_matches_unrolled():
    """scan_layers video trunk with stacked params == unrolled trunk
    (forward + per-layer embs), and the layout converters round-trip —
    same contract as DeepAVFusion's scan trunk (test_convert_parity.py)."""
    from deepavfusion_tpu.convert import torch2jax as cvt

    cfg = vef.VideoEarlyFusionConfig(
        video=small_video_cfg(),
        audio=vit_config("vit_small", (16, 48), 1, depth=2, embed_dim=48, num_heads=4),
        num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0,
        fusion_num_heads=4,
    )
    m0 = vef.VideoEarlyFusion(cfg)
    m1 = vef.VideoEarlyFusion(dataclasses.replace(cfg, scan_layers=True))

    video = jax.random.normal(jax.random.key(0), (2, 4, 32, 32, 3))
    audio = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    p0 = m0.init(jax.random.key(2), video, audio)["params"]
    p1 = cvt.stack_video_trunk(jax.tree.map(np.asarray, p0), depth=2)

    # structural check vs a fresh scan init
    ref = m1.init(jax.random.key(3), video, audio)["params"]
    cvt.assert_tree_matches(p1, jax.tree.map(np.shape, ref))

    y0 = m0.apply({"params": p0}, video, audio, return_embs=True)
    y1 = m1.apply({"params": p1}, video, audio, return_embs=True)
    for a, b in zip(y0[:3], y1[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for (av, aa, af), (bv, ba, bf) in zip(y0[3], y1[3]):
        np.testing.assert_allclose(np.asarray(av), np.asarray(bv), atol=1e-5)
        np.testing.assert_allclose(np.asarray(aa), np.asarray(ba), atol=1e-5)
        np.testing.assert_allclose(np.asarray(af), np.asarray(bf), atol=1e-5)

    # roundtrip
    back = cvt.unstack_video_trunk(p1, depth=2)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, p0)),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(va, vb)


def test_video_efav_arch_table():
    cfg = vef.video_efav_config("video_efav_base", (16, 224, 224), (128, 192))
    assert cfg.num_fusion_tkns == (16, 8, 8)
    assert cfg.video.embed_dim == 768
    assert cfg.audio.embed_dim == 768


# --------------------------------------------------------------------------- #
# Swin
# --------------------------------------------------------------------------- #
def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.key(0), (2, 8, 12, 5))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.max() < 49 and idx.min() >= 0
    # symmetric pairs map to mirrored offsets: idx[i,j] with (d) and idx[j,i]
    # with (-d) are distinct unless d=0
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_attn_mask():
    m = shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # unshifted-window mask (top-left) has no blocked pairs
    assert (m[0] == 0).all()
    # shifted windows do block cross-region pairs
    assert (m[-1] == -100).any()


def test_swin_block_plain():
    blk = SwinBlock(input_resolution=(8, 12), num_heads=4, window_size=4,
                    shift_size=0)
    x = jax.random.normal(jax.random.key(0), (2, 96, 32))
    params = blk.init(jax.random.key(1), x)["params"]
    out = blk.apply({"params": params}, x)
    assert out.shape == (2, 96, 32)


def test_swin_block_shifted_with_fusion():
    blk = SwinBlock(input_resolution=(8, 12), num_heads=4, window_size=4,
                    shift_size=2)
    x = jax.random.normal(jax.random.key(0), (2, 96, 32))
    xf = jax.random.normal(jax.random.key(1), (2, 8, 32))
    params = blk.init(jax.random.key(2), x, xf)["params"]
    out, out_f = blk.apply({"params": params}, x, xf)
    assert out.shape == (2, 96, 32)
    assert out_f.shape == (2, 8, 32)
    # fusion tokens see image content: perturbing x changes out_f
    # (constant shifts are LayerNorm-invariant, so perturb randomly)
    delta = jax.random.normal(jax.random.key(3), x.shape)
    out2, out_f2 = blk.apply({"params": params}, x + delta, xf)
    assert np.abs(np.asarray(out_f) - np.asarray(out_f2)).max() > 1e-5


def test_avmae_swin_decoder():
    from deepavfusion_tpu.models import deepavfusion as trunk_mod

    cfg = avmae_mod.AVMAEConfig(
        encoder=trunk_mod.DeepAVFusionConfig(
            image=vit_config("vit_small", (64, 64), 3, depth=2, embed_dim=48, num_heads=4),
            audio=vit_config("vit_small", (64, 64), 1, depth=2, embed_dim=48, num_heads=4),
            num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0, fusion_num_heads=4,
        ),
        image_decoder=avmae_mod.MAEDecoderConfig(arch="swin", depth=2, mask_ratio=0.75),
        audio_decoder=avmae_mod.MAEDecoderConfig(arch="swin", depth=2, mask_ratio=0.5),
        decoder_dim=32, decoder_num_heads=4,
    )
    model = avmae_mod.AVMAE(cfg)
    img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 64, 64, 1))
    params = model.init(jax.random.key(2), img, aud, jax.random.key(3))["params"]
    out = model.apply({"params": params}, img, aud, jax.random.key(4))
    assert np.isfinite(float(out["loss"]))
    assert out["pred_image"].shape == (2, 16, 16 * 16 * 3)

    # remat is no longer a silent no-op for arch='swin' (ADVICE r2 #2):
    # same params/inputs must give identical loss and gradients.
    cfg_r = dataclasses.replace(cfg, remat=True)
    model_r = avmae_mod.AVMAE(cfg_r)

    def loss_fn(m):
        def f(p):
            return m.apply({"params": p}, img, aud, jax.random.key(4))["loss"]
        return f

    loss0, g0 = jax.value_and_grad(loss_fn(model))(params)
    loss1, g1 = jax.value_and_grad(loss_fn(model_r))(params)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        g0["image_decoder"], g1["image_decoder"])
