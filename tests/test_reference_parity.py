"""Parity harness v2: the oracle is the reference's ACTUAL torch code.

VERDICT round-2 item 1: ``torch_oracle.py`` (kept as a secondary fixture) was
written by the same builder as the JAX models, so a misread reference quirk
would pass parity on both sides. Here we import
``/root/reference/models/*.py`` unmodified (via the minimal timm shim in
``tests/timm_shim/``), instantiate tiny-dim reference models, run
``convert/torch2jax.py`` on *their* ``state_dict()``, and require the JAX
forward to match the reference forward at ≤1e-4:

  * DeepAVFusion trunk — all three fusion archs, full + masked forward +
    per-layer embs (reference models/deepavfusion.py:88-118);
  * AVMAE plain decoder + full fixed-mask loss (avmae.py:147-236);
  * swin decoder — shifted + unshifted windows, fusion tokens
    (models/swin.py:92-208, avmae.py:37-51);
  * VideoViT — joint and divided space-time (models/video_vits.py:18-247).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepavfusion_tpu.convert import torch2jax as cvt
from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.models import deepavfusion as trunk_mod
from deepavfusion_tpu.models import video_vit as vvit_mod
from deepavfusion_tpu.models.vit import vit_config
from deepavfusion_tpu.ops import masking as mask_ops

from reference_models import load_reference

ref = load_reference()

# Tiny dims shared by every test: dim 48, 4 heads, depth 3,
# image 32×32 (4 patches), audio 16×48 (3 patches).
IMG_SIZE, AUD_SIZE = (32, 32), (16, 48)


def jax_cfg(arch, audio_size=AUD_SIZE):
    return trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", IMG_SIZE, 3, depth=3, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", audio_size, 1, depth=3, embed_dim=48, num_heads=4),
        fusion_arch=arch,
        num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25,
        fusion_num_heads=4,
    )


def ref_trunk(arch, audio_size=AUD_SIZE, seed=0):
    torch.manual_seed(seed)
    m = ref.deepavfusion.DeepAVFusion(
        image_arch="vit_tiny_test", image_pretrained=False, image_size=IMG_SIZE,
        audio_arch="vit_tiny_test", audio_pretrained=False, audio_size=audio_size,
        fusion_arch=arch, num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25, fusion_num_heads=4,
    )
    return m.eval()


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def make_pair(arch, seed=0, audio_size=AUD_SIZE):
    oracle = ref_trunk(arch, audio_size, seed)
    converted = cvt.deepavfusion(
        oracle.state_dict(), "", image_depth=3, audio_depth=3, fusion_arch=arch)
    model = trunk_mod.DeepAVFusion(jax_cfg(arch, audio_size))
    return oracle, converted, model


@pytest.mark.parametrize("arch", ["factorized_mmi", "token", "dense_mmi"])
def test_trunk_forward_parity_vs_reference(arch):
    oracle, params, model = make_pair(arch)

    init_tree = model.init(
        jax.random.key(0), jnp.zeros((1, *IMG_SIZE, 3)), jnp.zeros((1, *AUD_SIZE, 1))
    )["params"]
    cvt.assert_tree_matches(params, jax.tree.map(np.shape, init_tree))

    rng = np.random.RandomState(1)
    img = rng.randn(2, *IMG_SIZE, 3).astype(np.float32)
    aud = rng.randn(2, *AUD_SIZE, 1).astype(np.float32)

    with torch.no_grad():
        ti, ta, tf = oracle(nchw(img), nchw(aud))
    ji, ja, jf = model.apply({"params": params}, jnp.asarray(img), jnp.asarray(aud))

    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


@pytest.mark.parametrize("arch", ["factorized_mmi", "token", "dense_mmi"])
def test_trunk_masked_parity_vs_reference(arch):
    oracle, params, model = make_pair(arch, seed=3)
    rng = np.random.RandomState(2)
    img = rng.randn(2, *IMG_SIZE, 3).astype(np.float32)
    aud = rng.randn(2, *AUD_SIZE, 1).astype(np.float32)
    ik = np.array([[0, 2], [3, 1]], np.int64)
    ak = np.array([[1, 0], [2, 1]], np.int64)

    with torch.no_grad():
        ti, ta, tf = oracle(
            nchw(img), nchw(aud), torch.from_numpy(ik), torch.from_numpy(ak))
    ji, ja, jf = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(aud),
        image_ids_keep=jnp.asarray(ik, jnp.int32),
        audio_ids_keep=jnp.asarray(ak, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


def test_trunk_embs_parity_vs_reference():
    oracle, params, model = make_pair("factorized_mmi", seed=4)
    rng = np.random.RandomState(5)
    img = rng.randn(1, *IMG_SIZE, 3).astype(np.float32)
    aud = rng.randn(1, *AUD_SIZE, 1).astype(np.float32)
    with torch.no_grad():
        _, _, _, t_embs = oracle(nchw(img), nchw(aud), return_embs=True)
    _, _, _, j_embs = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(aud), return_embs=True)
    assert len(t_embs) == len(j_embs) == 3
    for (txi, txa, txf), (jxi, jxa, jxf) in zip(t_embs, j_embs):
        np.testing.assert_allclose(np.asarray(jxi), txi.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jxa), txa.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jxf), txf.numpy(), atol=1e-4)


# --------------------------------------------------------------------------- #
# AVMAE decoders + loss
# --------------------------------------------------------------------------- #
def fixed_masking(rng, B, L, mask_ratio):
    """The reference's random_masking (avmae.py:125-146) with a seeded numpy
    permutation, so both frameworks consume identical ids."""
    noise = rng.rand(B, L)
    ids_shuffle = np.argsort(noise, axis=1)
    ids_restore = np.argsort(ids_shuffle, axis=1)
    len_keep = int(L * (1 - mask_ratio))
    ids_keep = ids_shuffle[:, :len_keep]
    mask = np.ones((B, L), np.float32)
    mask[:, :len_keep] = 0
    mask = np.take_along_axis(mask, ids_restore, axis=1)
    return ids_keep, mask, ids_restore


def ref_avmae(trunk, image_arch="plain", audio_arch="plain", seed=11):
    torch.manual_seed(seed)
    m = ref.avmae.AVMAE(
        encoder=trunk, encoder_dim=48,
        image_decoder_arch=image_arch, image_decoder_depth=2,
        audio_decoder_arch=audio_arch, audio_decoder_depth=2,
        decoder_dim=32, num_heads=4,
    )
    return m.eval()


@pytest.mark.parametrize("decoder_arch,audio_size", [
    ("plain", AUD_SIZE),
    ("swin", (64, 128)),     # audio grid 4×8: window 4, shift 2 on odd blocks
])
def test_avmae_full_loss_parity_vs_reference(decoder_arch, audio_size):
    """Fixed-mask end-to-end pretraining step outputs (preds + losses) match
    the reference AVMAE pieces (avmae.py:147-236)."""
    arch = "factorized_mmi"
    trunk = ref_trunk(arch, audio_size, seed=6)
    mae = ref_avmae(trunk, image_arch=decoder_arch, audio_arch=decoder_arch)
    sd = {f"encoder.{k}": v for k, v in trunk.state_dict().items()}
    sd.update({k: v for k, v in mae.state_dict().items()
               if not k.startswith("encoder.")})

    converted = cvt.avmae(
        sd, image_depth=3, audio_depth=3, decoder_depth=2, fusion_arch=arch,
        image_decoder_arch=decoder_arch, audio_decoder_arch=decoder_arch)

    enc_cfg = jax_cfg(arch, audio_size)
    encoder = trunk_mod.DeepAVFusion(enc_cfg)

    rng = np.random.RandomState(7)
    img = rng.randn(2, *IMG_SIZE, 3).astype(np.float32)
    aud = rng.randn(2, *audio_size, 1).astype(np.float32)
    Li = enc_cfg.image.num_patches
    La = enc_cfg.audio.num_patches
    ik, im_mask, ir = fixed_masking(rng, 2, Li, 0.75)
    ak, au_mask, ar = fixed_masking(rng, 2, La, 0.8)

    # --- reference side, composed with fixed ids -------------------------- #
    with torch.no_grad():
        t_xi, t_xa, t_xf = mae.encoder(
            nchw(img), nchw(aud), torch.from_numpy(ik), torch.from_numpy(ak))
        t_pred_i = mae.forward_decoder(t_xi, t_xf, torch.from_numpy(ir), "image")
        t_pred_a = mae.forward_decoder(t_xa, t_xf, torch.from_numpy(ar), "audio")
        t_tgt_i = mae.patchify(nchw(img), mae.image_ps)
        t_tgt_a = mae.patchify(nchw(aud), mae.audio_ps)
        t_loss_i = mae.forward_loss(t_tgt_i, t_pred_i, torch.from_numpy(im_mask),
                                    norm_pix_loss=True)
        t_loss_a = mae.forward_loss(t_tgt_a, t_pred_a, torch.from_numpy(au_mask),
                                    norm_pix_loss=True)

    # --- JAX side, same ids ----------------------------------------------- #
    j_xi, j_xa, j_xf = encoder.apply(
        {"params": converted["encoder"]}, jnp.asarray(img), jnp.asarray(aud),
        image_ids_keep=jnp.asarray(ik, jnp.int32),
        audio_ids_keep=jnp.asarray(ak, jnp.int32))
    np.testing.assert_allclose(np.asarray(j_xi), t_xi.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_xf), t_xf.numpy(), atol=1e-4)

    ips, aps = enc_cfg.image.patch_size, enc_cfg.audio.patch_size
    dec_i = avmae_mod.MAEDecoder(
        avmae_mod.MAEDecoderConfig(arch=decoder_arch, depth=2, mask_ratio=0.75),
        grid_size=enc_cfg.image.grid_size, patch_dim=ips[0] * ips[1] * 3,
        decoder_dim=32, num_heads=4, mlp_ratio=4.0, norm_eps=1e-5)
    dec_a = avmae_mod.MAEDecoder(
        avmae_mod.MAEDecoderConfig(arch=decoder_arch, depth=2, mask_ratio=0.8),
        grid_size=enc_cfg.audio.grid_size, patch_dim=aps[0] * aps[1] * 1,
        decoder_dim=32, num_heads=4, mlp_ratio=4.0, norm_eps=1e-5)
    j_pred_i = dec_i.apply({"params": converted["image_decoder"]},
                           j_xi, j_xf, jnp.asarray(ir, jnp.int32))
    j_pred_a = dec_a.apply({"params": converted["audio_decoder"]},
                           j_xa, j_xf, jnp.asarray(ar, jnp.int32))
    np.testing.assert_allclose(np.asarray(j_pred_i), t_pred_i.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_pred_a), t_pred_a.numpy(), atol=1e-4)

    j_loss_i = avmae_mod.mae_loss(
        mask_ops.patchify(jnp.asarray(img), ips), j_pred_i,
        jnp.asarray(im_mask), norm_pix_loss=True)
    j_loss_a = avmae_mod.mae_loss(
        mask_ops.patchify(jnp.asarray(aud), aps), j_pred_a,
        jnp.asarray(au_mask), norm_pix_loss=True)
    np.testing.assert_allclose(float(j_loss_i), float(t_loss_i), atol=1e-4)
    np.testing.assert_allclose(float(j_loss_a), float(t_loss_a), atol=1e-4)


def test_swin_block_parity_vs_reference():
    """SwinTransformerBlock alone, shifted + fusion tokens, vs models/swin.py."""
    torch.manual_seed(13)
    H, W, C, heads, ws, shift = 4, 8, 32, 4, 4, 2
    blk = ref.swin.SwinTransformerBlock(
        dim=C, input_resolution=(H, W), num_heads=heads,
        window_size=ws, shift_size=shift, mlp_ratio=4.0).eval()
    # swin_block expects a dotted prefix; rebuild with explicit keys
    sd = {f"b.{k}": v for k, v in blk.state_dict().items()}
    params = cvt.swin_block(sd, "b")

    from deepavfusion_tpu.models.swin import SwinBlock
    jblk = SwinBlock(input_resolution=(H, W), num_heads=heads,
                     window_size=ws, shift_size=shift, mlp_ratio=4.0,
                     norm_eps=1e-5)

    rng = np.random.RandomState(14)
    x = rng.randn(2, H * W, C).astype(np.float32)
    xf = rng.randn(2, 3, C).astype(np.float32)

    with torch.no_grad():
        t_plain = blk(torch.from_numpy(x))
        t_x, t_f = blk(torch.from_numpy(x), torch.from_numpy(xf))
    j_plain = jblk.apply({"params": params}, jnp.asarray(x))
    j_x, j_f = jblk.apply({"params": params}, jnp.asarray(x), jnp.asarray(xf))

    np.testing.assert_allclose(np.asarray(j_plain), t_plain.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_x), t_x.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_f), t_f.numpy(), atol=1e-4)


def test_classifier_parity_vs_reference():
    """AVClassifier with affine-free input BatchNorms (classifier.py:14-58):
    torch running stats convert into flax batch_stats and eval logits match."""
    from deepavfusion_tpu.models import classifier as clf_mod

    trunk = ref_trunk("factorized_mmi", seed=17)
    torch.manual_seed(18)
    m = ref.classifier.AVClassifier(trunk, num_classes=5, freeze_encoder=True,
                                    input_norm=True)
    rng = np.random.RandomState(19)
    # drive the torch BNs in train mode so running stats are non-trivial
    m.train()
    for _ in range(3):
        img = rng.randn(4, *IMG_SIZE, 3).astype(np.float32)
        aud = rng.randn(4, *AUD_SIZE, 1).astype(np.float32)
        m(nchw(img), nchw(aud))
    m.eval()

    params, batch_stats = cvt.av_classifier(
        m.state_dict(), image_depth=3, audio_depth=3,
        fusion_arch="factorized_mmi", input_norm=True)
    jm = clf_mod.AVClassifier(jax_cfg("factorized_mmi"), num_classes=5,
                              freeze_encoder=True, input_norm=True)

    img = rng.randn(2, *IMG_SIZE, 3).astype(np.float32)
    aud = rng.randn(2, *AUD_SIZE, 1).astype(np.float32)
    with torch.no_grad():
        ti, ta, tf = m(nchw(img), nchw(aud))
    ji, ja, jf = jm.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(img), jnp.asarray(aud), train=False)
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


# --------------------------------------------------------------------------- #
# Video models
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("attention_type", ["joint_all", "divided_space_time"])
def test_video_vit_parity_vs_reference(attention_type):
    torch.manual_seed(15)
    m = ref.video_vits.VideoViTEncoder(
        input_size=(4, 32, 32), patch_size=(2, 16, 16), in_chans=3,
        embed_dim=48, depth=2, num_heads=4, use_cls_token=False,
        attention_type=attention_type).eval()
    params = cvt.video_vit(m.state_dict(), "", depth=2, tube=2)

    cfg = vvit_mod.VideoViTConfig(
        input_size=(4, 32, 32), patch_size=(2, 16, 16), in_chans=3,
        embed_dim=48, depth=2, num_heads=4, attention_type=attention_type)
    jm = vvit_mod.VideoViT(cfg)

    rng = np.random.RandomState(16)
    x = rng.randn(2, 4, 32, 32, 3).astype(np.float32)   # (B, T, H, W, C)
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 4, 1, 2, 3)))

    with torch.no_grad():
        want = m(xt).numpy()
    got = jm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_video_earlyfusion_parity_vs_reference():
    """Full AV-sync trunk (video ViT + audio ViT + factorized fusion
    interleave, reference models/video_earlyfusion.py:98-133) — including the
    reference's T=1-in-interleave behavior."""
    from deepavfusion_tpu.models import video_earlyfusion as vef_mod

    def video_tiny_test(pretrained="", **kwargs):
        assert not pretrained
        import torch.nn as nn
        from functools import partial
        kwargs.setdefault("patch_size", (2, 16, 16))
        return ref.video_vits.VideoViTEncoder(
            embed_dim=48, depth=3, num_heads=4,
            norm_layer="layer_norm", norm_eps=1e-6, **kwargs)

    ref.video_vits.__dict__.setdefault("video_tiny_test", video_tiny_test)

    torch.manual_seed(21)
    m = ref.video_earlyfusion.VideoEarlyFusion(
        video_arch="video_tiny_test", video_pretrained="",
        video_size=(4, 32, 32),
        audio_arch="vit_tiny_test", audio_pretrained=False,
        audio_size=AUD_SIZE,
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25, fusion_num_heads=4,
    ).eval()

    params = cvt.video_earlyfusion(
        m.state_dict(), "", video_depth=3, audio_depth=3)

    cfg = vef_mod.VideoEarlyFusionConfig(
        video=vvit_mod.VideoViTConfig(
            input_size=(4, 32, 32), patch_size=(2, 16, 16), in_chans=3,
            embed_dim=48, depth=3, num_heads=4),
        audio=vit_config("vit_small", AUD_SIZE, 1,
                         depth=3, embed_dim=48, num_heads=4),
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25, fusion_num_heads=4,
    )
    jm = vef_mod.VideoEarlyFusion(cfg)

    rng = np.random.RandomState(22)
    vid = rng.randn(2, 4, 32, 32, 3).astype(np.float32)       # (B,T,H,W,C)
    aud = rng.randn(2, *AUD_SIZE, 1).astype(np.float32)
    vt = torch.from_numpy(np.ascontiguousarray(vid.transpose(0, 4, 1, 2, 3)))

    with torch.no_grad():
        tv, ta, tf = m(vt, nchw(aud))[:3]
    jv, ja, jf = jm.apply({"params": params}, jnp.asarray(vid), jnp.asarray(aud))[:3]
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)
