"""Converter + full-model forward parity harness vs the pure-torch oracle.

The acceptance bar (BASELINE.json): converted checkpoints must reproduce
encoder outputs within 1e-3. Here we verify at 1e-4 on small random-init
models, covering all three fusion architectures, masked forward, per-layer
embeddings, and the MAE decoders.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deepavfusion_tpu.convert import torch2jax as cvt
from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.models import deepavfusion as trunk_mod
from deepavfusion_tpu.models.vit import vit_config

from torch_oracle import OracleAVMAE, OracleTrunk


def jax_cfg(arch):
    return trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", (32, 32), 3, depth=3, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", (16, 48), 1, depth=3, embed_dim=48, num_heads=4),
        fusion_arch=arch,
        num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25,
        fusion_num_heads=4,
    )


def make_pair(arch, seed=0):
    torch.manual_seed(seed)
    oracle = OracleTrunk(arch=arch).eval()
    sd = oracle.state_dict()
    converted = cvt.deepavfusion(sd, "", image_depth=3, audio_depth=3, fusion_arch=arch)
    model = trunk_mod.DeepAVFusion(jax_cfg(arch))
    return oracle, converted, model


@pytest.mark.parametrize("arch", ["factorized_mmi", "token", "dense_mmi"])
def test_trunk_forward_parity(arch):
    oracle, params, model = make_pair(arch)

    # structural strictness: converted tree must exactly match init tree
    ref_tree = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 48, 1))
    )["params"]
    cvt.assert_tree_matches(params, jax.tree.map(np.shape, ref_tree))

    rng = np.random.RandomState(1)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    aud = rng.randn(2, 16, 48, 1).astype(np.float32)

    with torch.no_grad():
        ti, ta, tf = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(aud.transpose(0, 3, 1, 2)),
        )
    ji, ja, jf = model.apply({"params": params}, jnp.asarray(img), jnp.asarray(aud))

    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


def test_trunk_masked_parity():
    oracle, params, model = make_pair("factorized_mmi", seed=3)
    rng = np.random.RandomState(2)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    aud = rng.randn(2, 16, 48, 1).astype(np.float32)
    ik = np.array([[0, 2], [3, 1]], np.int64)
    ak = np.array([[1, 0], [2, 1]], np.int64)

    with torch.no_grad():
        ti, ta, tf = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(aud.transpose(0, 3, 1, 2)),
            torch.from_numpy(ik), torch.from_numpy(ak),
        )
    ji, ja, jf = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(aud),
        image_ids_keep=jnp.asarray(ik, jnp.int32),
        audio_ids_keep=jnp.asarray(ak, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ji), ti.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ja), ta.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), tf.numpy(), atol=1e-4)


def test_trunk_embs_parity():
    oracle, params, model = make_pair("factorized_mmi", seed=4)
    rng = np.random.RandomState(5)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    aud = rng.randn(1, 16, 48, 1).astype(np.float32)
    with torch.no_grad():
        _, _, _, t_embs = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(aud.transpose(0, 3, 1, 2)),
            return_embs=True,
        )
    _, _, _, j_embs = model.apply(
        {"params": params}, jnp.asarray(img), jnp.asarray(aud), return_embs=True
    )
    assert len(t_embs) == len(j_embs) == 3
    for (txi, txa, txf), (jxi, jxa, jxf) in zip(t_embs, j_embs):
        np.testing.assert_allclose(np.asarray(jxi), txi.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jxa), txa.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(jxf), txf.numpy(), atol=1e-4)


def test_mae_decoder_parity():
    torch.manual_seed(7)
    oracle_trunk = OracleTrunk()
    oracle = OracleAVMAE(oracle_trunk, dec_dim=32, dec_depth=2, dec_heads=4).eval()
    sd = oracle.state_dict()

    dec_params = cvt.mae_decoder(sd, "image", depth=2)
    dec = avmae_mod.MAEDecoder(
        avmae_mod.MAEDecoderConfig(depth=2, mask_ratio=0.75),
        grid_size=(2, 2), patch_dim=16 * 16 * 3,
        decoder_dim=32, num_heads=4, mlp_ratio=4.0, norm_eps=1e-5,
    )

    rng = np.random.RandomState(8)
    x = rng.randn(2, 1, 48).astype(np.float32)          # 1 visible token
    xf = rng.randn(2, 8, 48).astype(np.float32)
    ids_restore = np.array([[2, 0, 3, 1], [1, 3, 0, 2]], np.int64)

    with torch.no_grad():
        want = oracle.decode(
            torch.from_numpy(x), torch.from_numpy(xf),
            torch.from_numpy(ids_restore), "image",
        ).numpy()
    got = dec.apply(
        {"params": dec_params}, jnp.asarray(x), jnp.asarray(xf),
        jnp.asarray(ids_restore, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_avmae_full_checkpoint_roundtrip():
    """Full AVMAE state dict converts into a tree that exactly matches the
    flax init structure (the strict=True analogue)."""
    torch.manual_seed(9)
    oracle = OracleAVMAE(OracleTrunk(), dec_dim=32, dec_depth=2, dec_heads=4)
    sd = {f"{k}": v for k, v in oracle.state_dict().items()}

    converted = cvt.avmae(sd, image_depth=3, audio_depth=3, decoder_depth=2)

    cfg = avmae_mod.AVMAEConfig(
        encoder=jax_cfg("factorized_mmi"),
        image_decoder=avmae_mod.MAEDecoderConfig(depth=2),
        audio_decoder=avmae_mod.MAEDecoderConfig(depth=2, mask_ratio=0.8),
        decoder_dim=32,
        decoder_num_heads=4,
    )
    model = avmae_mod.AVMAE(cfg)
    ref = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 48, 1)),
        jax.random.key(1),
    )["params"]
    cvt.assert_tree_matches(converted, jax.tree.map(np.shape, ref))

    # and the converted weights actually run
    out = model.apply(
        {"params": converted},
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 48, 1)), jax.random.key(2),
    )
    assert np.isfinite(float(out["loss"]))


def test_vit_from_mae_init_skips_decoder_keys():
    torch.manual_seed(10)
    trunk = OracleTrunk()
    sd = {k[len("image."):]: v for k, v in trunk.state_dict().items()
          if k.startswith("image.")}
    # simulate an MAE checkpoint with decoder keys + cls_token
    sd["decoder_embed.weight"] = torch.zeros(4, 4)
    sd["mask_token"] = torch.zeros(1, 1, 48)
    sd["cls_token"] = torch.zeros(1, 1, 48)
    tree = cvt.vit_from_mae_init(sd, depth=3)
    assert "cls_token" not in tree
    assert set(tree) == {"patch_embed", "norm"} | {f"blocks_{i}" for i in range(3)}


def test_scan_layers_matches_unrolled():
    """scan_layers trunk with stacked params == unrolled trunk, bit-for-bit
    (forward, masked forward, and per-layer embs)."""
    import dataclasses

    cfg = jax_cfg("factorized_mmi")
    cfg_scan = dataclasses.replace(cfg, scan_layers=True)

    m0 = trunk_mod.DeepAVFusion(cfg)
    m1 = trunk_mod.DeepAVFusion(cfg_scan)

    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    p0 = m0.init(jax.random.key(2), img, aud)["params"]
    p1 = cvt.stack_trunk(jax.tree.map(np.asarray, p0), depth=3)

    # structural check vs a fresh scan init
    ref = m1.init(jax.random.key(3), img, aud)["params"]
    cvt.assert_tree_matches(p1, jax.tree.map(np.shape, ref))

    y0 = m0.apply({"params": p0}, img, aud, return_embs=True)
    y1 = m1.apply({"params": p1}, img, aud, return_embs=True)
    for a, b in zip(y0[:3], y1[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for (ai, aa, af), (bi, ba, bf) in zip(y0[3], y1[3]):
        np.testing.assert_allclose(np.asarray(ai), np.asarray(bi), atol=1e-5)
        np.testing.assert_allclose(np.asarray(af), np.asarray(bf), atol=1e-5)

    # masked forward parity too
    ik = jnp.asarray([[0, 2], [3, 1]], jnp.int32)
    ak = jnp.asarray([[1], [0]], jnp.int32)
    z0 = m0.apply({"params": p0}, img, aud, image_ids_keep=ik, audio_ids_keep=ak)
    z1 = m1.apply({"params": p1}, img, aud, image_ids_keep=ik, audio_ids_keep=ak)
    for a, b in zip(z0, z1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # roundtrip
    back = cvt.unstack_trunk(p1, depth=3)
    for (ka, va), (kb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, p0)),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back), key=lambda kv: str(kv[0])),
    ):
        np.testing.assert_array_equal(va, vb)


@pytest.mark.parametrize("arch", ["token", "dense_mmi"])
def test_scan_layers_other_archs(arch):
    """scan trunk parity for the non-default fusion architectures."""
    import dataclasses

    cfg = dataclasses.replace(jax_cfg(arch), scan_layers=True)
    m0 = trunk_mod.DeepAVFusion(jax_cfg(arch))
    m1 = trunk_mod.DeepAVFusion(cfg)
    img = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (1, 16, 48, 1))
    p0 = m0.init(jax.random.key(2), img, aud)["params"]
    p1 = cvt.stack_trunk(jax.tree.map(np.asarray, p0), depth=3)
    y0 = m0.apply({"params": p0}, img, aud)
    y1 = m1.apply({"params": p1}, img, aud)
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_low_level_layout_converters():
    """Linear/conv2d/conv3d layout rules against torch ops directly."""
    rng = np.random.RandomState(0)

    # Linear: torch (out,in) -> flax (in,out)
    w = rng.randn(6, 4).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    x = rng.randn(2, 4).astype(np.float32)
    tree = cvt.linear({"m.weight": torch.from_numpy(w), "m.bias": torch.from_numpy(b)}, "m")
    got = x @ tree["kernel"] + tree["bias"]
    want = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w),
                                      torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)

    # Conv2d: torch NCHW/OIHW -> flax NHWC/HWIO
    import flax.linen as nn

    wc = rng.randn(5, 3, 4, 4).astype(np.float32)
    xc = rng.randn(1, 3, 8, 8).astype(np.float32)
    tree = cvt.conv2d({"c.weight": torch.from_numpy(wc)}, "c")
    conv = nn.Conv(5, (4, 4), strides=(4, 4), padding="VALID", use_bias=False)
    got = conv.apply({"params": {"kernel": jnp.asarray(tree["kernel"])}},
                     jnp.asarray(xc.transpose(0, 2, 3, 1)))
    want = torch.nn.functional.conv2d(torch.from_numpy(xc), torch.from_numpy(wc),
                                      stride=4).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
