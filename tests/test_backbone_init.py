"""Backbone-init path, end-to-end against real-format MAE `.pth` files.

VERDICT round-2 item 5: `convert.vit_from_mae_init` + `train.py:
maybe_load_backbone_inits` existed but were never fed a real-format
MAE-IN1k / AudioMAE checkpoint. Here we GENERATE such checkpoints from the
reference's actual ViT code (tests/reference_models): the facebook-MAE
layout — `{'model': state_dict}` envelope, cls_token + mask_token +
pos_embed + fused-qkv encoder keys + `decoder_*` keys — and verify the full
chain: envelope unwrap, decoder-key skip, cls_token drop, pos-embed
override, strict key accounting, and forward parity with the reference's
own `ViT.load_checkpoint` result (models/vits.py:64-80).
"""
import os
from functools import partial

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax
import jax.numpy as jnp

from deepavfusion_tpu.convert import torch2jax as cvt
from deepavfusion_tpu.models.vit import ViT, vit_config

from reference_models import load_reference

ref = load_reference()

IMG_SIZE = (32, 32)
DIM, DEPTH, HEADS = 48, 3, 4


def _ref_vit(in_chans=3, use_cls_token=False, seed=31):
    torch.manual_seed(seed)
    return ref.vits.ViT(
        input_size=IMG_SIZE, patch_size=16, in_chans=in_chans,
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0,
        norm_layer=partial(tnn.LayerNorm, eps=1e-6),
        use_cls_token=use_cls_token)


def make_mae_pth(path, in_chans=3, envelope="model", seed=31):
    """Facebook-MAE-pretrain-format checkpoint built from the reference's
    actual ViT: encoder keys (fused qkv) + cls_token + the decoder keys the
    loader must skip (models/vits.py:64 skip list)."""
    donor = _ref_vit(in_chans, use_cls_token=True, seed=seed)
    sd = {k: v.clone() for k, v in donor.state_dict().items()}
    g = torch.Generator().manual_seed(seed + 1)
    ddim = 16
    sd["mask_token"] = torch.randn(1, 1, ddim, generator=g)
    sd["decoder_embed.weight"] = torch.randn(ddim, DIM, generator=g)
    sd["decoder_embed.bias"] = torch.randn(ddim, generator=g)
    sd["decoder_pos_embed"] = torch.randn(1, 5, ddim, generator=g)
    for i in range(2):
        for suffix, shape in (
            ("attn.qkv.weight", (3 * ddim, ddim)), ("attn.qkv.bias", (3 * ddim,)),
            ("attn.proj.weight", (ddim, ddim)), ("attn.proj.bias", (ddim,)),
            ("norm1.weight", (ddim,)), ("norm1.bias", (ddim,)),
            ("norm2.weight", (ddim,)), ("norm2.bias", (ddim,)),
            ("mlp.fc1.weight", (4 * ddim, ddim)), ("mlp.fc1.bias", (4 * ddim,)),
            ("mlp.fc2.weight", (ddim, 4 * ddim)), ("mlp.fc2.bias", (ddim,)),
        ):
            sd[f"decoder_blocks.{i}.{suffix}"] = torch.randn(*shape, generator=g)
    sd["decoder_norm.weight"] = torch.randn(ddim, generator=g)
    sd["decoder_norm.bias"] = torch.randn(ddim, generator=g)
    sd["decoder_pred.weight"] = torch.randn(16 * 16 * in_chans, ddim, generator=g)
    sd["decoder_pred.bias"] = torch.randn(16 * 16 * in_chans, generator=g)
    torch.save({envelope: sd}, path)
    return donor


@pytest.mark.parametrize("envelope,in_chans", [("model", 3), ("state_dict", 1)])
def test_vit_from_mae_init_forward_parity(tmp_path, envelope, in_chans):
    """Converted init == the reference's own load_checkpoint result, proven
    by forward parity on the reference's actual ViT code."""
    pth = tmp_path / "mae.pth"
    make_mae_pth(str(pth), in_chans=in_chans, envelope=envelope)

    # reference loader: strict load with decoder-skip + cls drop + pos override
    target = _ref_vit(in_chans, use_cls_token=False, seed=99)
    target.load_checkpoint(str(pth))
    target.eval()

    sd = cvt.load_torch_state_dict(str(pth))
    assert "decoder_embed.weight" in sd  # envelope unwrapped, not filtered yet
    tree = cvt.vit_from_mae_init(sd, depth=DEPTH)

    cfg = vit_config("vit_small", IMG_SIZE, in_chans,
                     depth=DEPTH, embed_dim=DIM, num_heads=HEADS)
    model = ViT(cfg)
    x = np.random.RandomState(0).randn(2, *IMG_SIZE, in_chans).astype(np.float32)
    init_tree = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    # strict two-way accounting: no decoder/mask/cls/pos key leaked through,
    # nothing the model needs is missing
    cvt.assert_tree_matches(tree, jax.tree.map(np.shape, init_tree))

    with torch.no_grad():
        want = target(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy()
    got = model.apply({"params": tree}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_maybe_load_backbone_inits_end_to_end(tmp_path, monkeypatch, capsys):
    """train.py's maybe_load_backbone_inits: resolves the PRETRAINED_WEIGHTS
    table paths, loads both modalities' real-format files, leaves everything
    else untouched."""
    import train as train_entry
    from deepavfusion_tpu.config import DotDict
    from deepavfusion_tpu.models import deepavfusion as trunk_mod

    assets = tmp_path / "assets" / "models"
    assets.mkdir(parents=True)
    make_mae_pth(str(assets / "mae_pretrain_vit_base.pth"), in_chans=3,
                 envelope="model", seed=31)
    make_mae_pth(str(assets / "vitbase_audiomae_as2m.pth"), in_chans=1,
                 envelope="model", seed=47)
    monkeypatch.chdir(tmp_path)

    cfg = trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", IMG_SIZE, 3,
                         depth=DEPTH, embed_dim=DIM, num_heads=HEADS),
        audio=vit_config("vit_small", IMG_SIZE, 1,
                         depth=DEPTH, embed_dim=DIM, num_heads=HEADS),
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0, fusion_num_heads=4,
    )
    model = trunk_mod.DeepAVFusion(cfg)
    init = model.init(jax.random.key(0),
                      jnp.zeros((1, *IMG_SIZE, 3)), jnp.zeros((1, *IMG_SIZE, 1)))
    params = {"encoder": jax.tree.map(np.asarray, init["params"])}
    before_fusion = np.array(params["encoder"]["fusion_tokens"])

    args = DotDict({"model": {
        "image": {"pretrained": "vit_base_mae_in1k"},
        "audio": {"pretrained": "vit_base_audiomae_as2m"},
    }})
    params = train_entry.maybe_load_backbone_inits(params, args)
    out = capsys.readouterr().out
    assert "Loaded image backbone init" in out
    assert "Loaded audio backbone init" in out

    # loaded values match the donors; untouched subtrees stay untouched
    for mod, in_chans, seed in (("image", 3, 31), ("audio", 1, 47)):
        donor = _ref_vit(in_chans, use_cls_token=True, seed=seed)
        want = cvt.vit_from_mae_init(
            {k: v for k, v in donor.state_dict().items()}, depth=DEPTH)
        got = params["encoder"][mod]
        np.testing.assert_allclose(
            np.asarray(got["blocks_0"]["attn"]["qkv"]["kernel"]),
            want["blocks_0"]["attn"]["qkv"]["kernel"], atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got["patch_embed"]["proj"]["kernel"]),
            want["patch_embed"]["proj"]["kernel"], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["fusion_tokens"]), before_fusion)


def test_maybe_load_backbone_inits_absent_is_noop(tmp_path, monkeypatch):
    import train as train_entry
    from deepavfusion_tpu.config import DotDict

    monkeypatch.chdir(tmp_path)  # no assets/ here
    params = {"encoder": {"image": {"x": np.zeros(1)}}}
    args = DotDict({"model": {"image": {"pretrained": "vit_base_mae_in1k"},
                              "audio": {}}})
    out = train_entry.maybe_load_backbone_inits(params, args)
    assert out is params and float(out["encoder"]["image"]["x"][0]) == 0.0
