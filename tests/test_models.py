"""Model-core tests: shapes, determinism, torch golden-check of Block wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deepavfusion_tpu.models import avmae as avmae_mod
from deepavfusion_tpu.models import deepavfusion as trunk_mod
from deepavfusion_tpu.models import fusion_blocks as fb
from deepavfusion_tpu.models.layers import Block
from deepavfusion_tpu.models.vit import ViT, vit_config


def small_trunk_cfg(fusion_arch="factorized_mmi", fusion_layers="all"):
    return trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", (32, 32), 3, depth=3, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", (16, 48), 1, depth=3, embed_dim=48, num_heads=4),
        fusion_arch=fusion_arch,
        fusion_layers=fusion_layers,
        num_fusion_tkns=(4, 2, 2),
        fusion_mlp_ratio=1.0,
        fusion_attn_ratio=0.25,
        fusion_num_heads=4,
    )


# --------------------------------------------------------------------------- #
# Block vs torch golden check
# --------------------------------------------------------------------------- #
class TorchBlock(torch.nn.Module):
    """Independent torch oracle for the pre-norm ViT block (timm semantics)."""

    def __init__(self, dim, heads, mlp_ratio=4.0, eps=1e-6):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(dim, eps=eps)
        self.qkv = torch.nn.Linear(dim, dim * 3)
        self.proj = torch.nn.Linear(dim, dim)
        self.norm2 = torch.nn.LayerNorm(dim, eps=eps)
        self.fc1 = torch.nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = torch.nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        b, n, c = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.qkv(y).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (c // h) ** -0.5
        attn = attn.softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.proj(y)
        y = self.norm2(x)
        x = x + self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x


def test_block_matches_torch_with_same_weights():
    dim, heads, n = 32, 4, 10
    rng = np.random.RandomState(0)
    x = rng.randn(2, n, dim).astype(np.float32)

    blk = Block(num_heads=heads, mlp_ratio=4.0, norm_eps=1e-6)
    params = blk.init(jax.random.key(0), jnp.asarray(x))["params"]

    tb = TorchBlock(dim, heads)
    with torch.no_grad():
        tb.norm1.weight.copy_(torch.from_numpy(np.asarray(params["norm1"]["scale"])))
        tb.norm1.bias.copy_(torch.from_numpy(np.asarray(params["norm1"]["bias"])))
        tb.qkv.weight.copy_(torch.from_numpy(np.asarray(params["attn"]["qkv"]["kernel"]).T))
        tb.qkv.bias.copy_(torch.from_numpy(np.asarray(params["attn"]["qkv"]["bias"])))
        tb.proj.weight.copy_(torch.from_numpy(np.asarray(params["attn"]["proj"]["kernel"]).T))
        tb.proj.bias.copy_(torch.from_numpy(np.asarray(params["attn"]["proj"]["bias"])))
        tb.norm2.weight.copy_(torch.from_numpy(np.asarray(params["norm2"]["scale"])))
        tb.norm2.bias.copy_(torch.from_numpy(np.asarray(params["norm2"]["bias"])))
        tb.fc1.weight.copy_(torch.from_numpy(np.asarray(params["mlp"]["fc1"]["kernel"]).T))
        tb.fc1.bias.copy_(torch.from_numpy(np.asarray(params["mlp"]["fc1"]["bias"])))
        tb.fc2.weight.copy_(torch.from_numpy(np.asarray(params["mlp"]["fc2"]["kernel"]).T))
        tb.fc2.bias.copy_(torch.from_numpy(np.asarray(params["mlp"]["fc2"]["bias"])))
        want = tb(torch.from_numpy(x)).numpy()

    got = np.asarray(blk.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


# --------------------------------------------------------------------------- #
# ViT
# --------------------------------------------------------------------------- #
def test_vit_shapes_and_masking():
    cfg = vit_config("vit_small", (32, 32), 3, depth=2, embed_dim=48, num_heads=4)
    model = ViT(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 4, 48)  # (32/16)^2 = 4 patches

    ids_keep = jnp.asarray([[0, 3], [1, 2]], jnp.int32)
    out_m = model.apply({"params": params}, x, ids_keep)
    assert out_m.shape == (2, 2, 48)


def test_vit_pos_embed_gather_consistency():
    """Masked forward over kept ids == full forward restricted to those ids
    when blocks are identity-free (depth 0 equivalent via prepare only)."""
    cfg = vit_config("vit_small", (32, 32), 3, depth=1, embed_dim=48, num_heads=4)
    model = ViT(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]

    full = model.apply(
        {"params": params}, x, method=lambda m, x: m.prepare_patch_tokens(x)
    )
    ids = jnp.asarray([[2, 0, 3]], jnp.int32)
    kept = model.apply(
        {"params": params}, x, ids,
        method=lambda m, x, i: m.prepare_patch_tokens(x, i),
    )
    np.testing.assert_allclose(
        np.asarray(kept[0]), np.asarray(full[0])[np.array([2, 0, 3])], atol=1e-6
    )


# --------------------------------------------------------------------------- #
# Fusion blocks
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("arch", ["token", "dense_mmi", "factorized_mmi"])
def test_fusion_block_shapes(arch):
    d, heads = 48, 4
    blk = fb.FusionBlock(
        arch=arch, num_heads=heads, attn_ratio=0.25, mlp_ratio=1.0,
        fusion_tkns=(4, 2, 2),
    )
    xf = jnp.zeros((2, 8, d))
    xi = jax.random.normal(jax.random.key(0), (2, 5, d))
    xa = jax.random.normal(jax.random.key(1), (2, 3, d))
    params = blk.init(jax.random.key(2), xf, xi, xa)["params"]
    out = blk.apply({"params": params}, xf, xi, xa)
    assert out.shape == (2, 8, d)
    assert np.isfinite(np.asarray(out)).all()


def test_fusion_block_modality_sensitivity():
    """Output must depend on both modalities."""
    d = 48
    blk = fb.FusionBlock(arch="factorized_mmi", num_heads=4, fusion_tkns=(4, 2, 2))
    xf = jax.random.normal(jax.random.key(0), (1, 8, d))
    xi = jax.random.normal(jax.random.key(1), (1, 5, d))
    xa = jax.random.normal(jax.random.key(2), (1, 3, d))
    params = blk.init(jax.random.key(3), xf, xi, xa)["params"]
    # NB: pure scaling is a LayerNorm invariant, so perturb additively.
    delta_i = jax.random.normal(jax.random.key(4), xi.shape)
    delta_a = jax.random.normal(jax.random.key(5), xa.shape)
    base = np.asarray(blk.apply({"params": params}, xf, xi, xa))
    alt_i = np.asarray(blk.apply({"params": params}, xf, xi + delta_i, xa))
    alt_a = np.asarray(blk.apply({"params": params}, xf, xi, xa + delta_a))
    assert np.abs(base - alt_i).max() > 1e-4
    assert np.abs(base - alt_a).max() > 1e-4


def test_factorized_pairs_order():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2))     # v tokens
    y = jnp.asarray((10 + np.arange(6, dtype=np.float32)).reshape(1, 3, 2))
    p = np.asarray(fb._pairs(x, y))
    assert p.shape == (1, 6, 4)
    # v-major: pair 0 = (v0, a0), pair 1 = (v0, a1), ...
    np.testing.assert_array_equal(p[0, 0], [0, 1, 10, 11])
    np.testing.assert_array_equal(p[0, 1], [0, 1, 12, 13])
    np.testing.assert_array_equal(p[0, 3], [2, 3, 10, 11])


# --------------------------------------------------------------------------- #
# Trunk
# --------------------------------------------------------------------------- #
@pytest.mark.parametrize("fusion_layers", ["all", "none", "1"])
def test_trunk_forward(fusion_layers):
    cfg = small_trunk_cfg(fusion_layers=fusion_layers)
    model = trunk_mod.DeepAVFusion(cfg)
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    params = model.init(jax.random.key(2), img, aud)["params"]
    xi, xa, xf = model.apply({"params": params}, img, aud)
    assert xi.shape == (2, 4, 48)      # 2x2 image grid
    assert xa.shape == (2, 3, 48)      # 1x3 audio grid
    assert xf.shape == (2, 8, 48)
    for t in (xi, xa, xf):
        assert np.isfinite(np.asarray(t)).all()


def test_trunk_return_embs():
    cfg = small_trunk_cfg()
    model = trunk_mod.DeepAVFusion(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    aud = jnp.zeros((1, 16, 48, 1))
    params = model.init(jax.random.key(0), img, aud)["params"]
    out = model.apply({"params": params}, img, aud, return_embs=True)
    assert len(out) == 4
    embs = out[3]
    assert len(embs) == 3  # depth
    assert embs[0][0].shape == (1, 4, 48)


def test_trunk_fusion_layers_none_matches_independent_vits():
    """With no fusion blocks the trunk must equal two independent ViTs."""
    cfg = small_trunk_cfg(fusion_layers="none")
    model = trunk_mod.DeepAVFusion(cfg)
    img = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (1, 16, 48, 1))
    params = model.init(jax.random.key(2), img, aud)["params"]
    xi, xa, _ = model.apply({"params": params}, img, aud)

    vit_i = ViT(cfg.image)
    out_i = vit_i.apply({"params": params["image"]}, img)
    np.testing.assert_allclose(np.asarray(xi), np.asarray(out_i), atol=1e-6)


def test_trunk_masked_forward():
    cfg = small_trunk_cfg()
    model = trunk_mod.DeepAVFusion(cfg)
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    params = model.init(jax.random.key(2), img, aud)["params"]
    ik = jnp.asarray([[0, 2], [1, 3]], jnp.int32)
    ak = jnp.asarray([[1], [0]], jnp.int32)
    xi, xa, xf = model.apply(
        {"params": params}, img, aud, image_ids_keep=ik, audio_ids_keep=ak
    )
    assert xi.shape == (2, 2, 48)
    assert xa.shape == (2, 1, 48)
    assert xf.shape == (2, 8, 48)


# --------------------------------------------------------------------------- #
# AVMAE
# --------------------------------------------------------------------------- #
def small_mae_cfg():
    return avmae_mod.AVMAEConfig(
        encoder=small_trunk_cfg(),
        image_decoder=avmae_mod.MAEDecoderConfig(depth=2, mask_ratio=0.75),
        audio_decoder=avmae_mod.MAEDecoderConfig(depth=2, mask_ratio=2.0 / 3.0),
        decoder_dim=32,
        decoder_num_heads=4,
    )


def test_avmae_forward_and_loss():
    cfg = small_mae_cfg()
    model = avmae_mod.AVMAE(cfg)
    img = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 48, 1))
    params = model.init(jax.random.key(2), img, aud, jax.random.key(3))["params"]
    out = model.apply({"params": params}, img, aud, jax.random.key(4))
    assert out["pred_image"].shape == (2, 4, 16 * 16 * 3)
    assert out["pred_audio"].shape == (2, 3, 16 * 16 * 1)
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss_image"]) > 0 and float(out["loss_audio"]) > 0


def test_avmae_grads_flow_everywhere():
    # NB: keep-counts must stay > 1 or attention softmaxes run over a single
    # key and q/k gradients are mathematically zero (degenerate, not a bug).
    cfg = avmae_mod.AVMAEConfig(
        encoder=trunk_mod.DeepAVFusionConfig(
            image=vit_config("vit_small", (64, 64), 3, depth=2, embed_dim=48, num_heads=4),
            audio=vit_config("vit_small", (16, 96), 1, depth=2, embed_dim=48, num_heads=4),
            fusion_arch="factorized_mmi",
            num_fusion_tkns=(4, 2, 2),
            fusion_mlp_ratio=1.0,
            fusion_attn_ratio=0.25,
            fusion_num_heads=4,
        ),
        image_decoder=avmae_mod.MAEDecoderConfig(depth=1, mask_ratio=0.75),
        audio_decoder=avmae_mod.MAEDecoderConfig(depth=1, mask_ratio=0.5),
        decoder_dim=32,
        decoder_num_heads=4,
    )
    model = avmae_mod.AVMAE(cfg)
    img = jax.random.normal(jax.random.key(0), (2, 64, 64, 3))
    aud = jax.random.normal(jax.random.key(1), (2, 16, 96, 1))
    params = model.init(jax.random.key(2), img, aud, jax.random.key(3))["params"]

    def loss_fn(p):
        return model.apply({"params": p}, img, aud, jax.random.key(4))["loss"]

    grads = jax.grad(loss_fn)(params)
    import flax

    flat = flax.traverse_util.flatten_dict(
        jax.tree.map(lambda g: float(jnp.abs(g).sum()), grads)
    )
    zeros = ["/".join(k) for k, v in flat.items() if v == 0.0]
    assert not zeros, f"zero grads at: {zeros}"


def test_mae_loss_masked_only():
    target = jnp.zeros((1, 4, 8))
    pred = jnp.ones((1, 4, 8))
    mask = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    loss = avmae_mod.mae_loss(target, pred, mask, norm_pix_loss=False)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)
    # unmasked-only error contributes nothing
    pred2 = pred.at[:, 0].set(0.0)
    loss2 = avmae_mod.mae_loss(target, pred2, mask, norm_pix_loss=False)
    np.testing.assert_allclose(float(loss2), 0.0, atol=1e-6)


def test_vit_remat_matches_plain():
    """remat=True must be numerically identical to the plain forward/grad."""
    import dataclasses

    cfg = vit_config("vit_small", (32, 32), 3, depth=2, embed_dim=48, num_heads=4)
    cfg_r = dataclasses.replace(cfg, remat=True)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    m0, m1 = ViT(cfg), ViT(cfg_r)
    params = m0.init(jax.random.key(1), x)["params"]
    y0 = m0.apply({"params": params}, x)
    y1 = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    g0 = jax.grad(lambda p: (m0.apply({"params": p}, x) ** 2).sum())(params)
    g1 = jax.grad(lambda p: (m1.apply({"params": p}, x) ** 2).sum())(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vit_cls_token_path():
    cfg = vit_config("vit_small", (32, 32), 3, depth=1, embed_dim=48,
                     num_heads=4, use_cls_token=True)
    model = ViT(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)["params"]
    assert "cls_token" in params
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 5, 48)  # 4 patches + cls


@pytest.mark.parametrize("nv_img,na_aud", [(13, 7), (9, 9), (3, 0)])
def test_factorized_batched_aggregators_match_unbatched(monkeypatch, nv_img, na_aud):
    """The batched-aggregator fast path (stacked-weight einsums over a padded
    key set + merged pair k/v) must be numerically identical to the two
    CrossAttention branches it replaces — values AND grads — with a
    byte-identical param tree. Covers unequal source lengths (the pretrain
    shapes), equal lengths (bias-free path), and a zero-length source
    (fully-masked modality → empty-attention zeros, the unbatched fallback)."""
    B, d = 2, 48
    blk = fb.FusionBlock(arch="factorized_mmi", num_heads=4, attn_ratio=0.25,
                         mlp_ratio=1.0, fusion_tkns=(4, 2, 2))
    xf = jax.random.normal(jax.random.key(0), (B, 8, d))
    xi = jax.random.normal(jax.random.key(1), (B, nv_img, d))
    xa = jax.random.normal(jax.random.key(2), (B, na_aud, d))

    monkeypatch.delenv("DAVF_UNBATCHED_FUSION", raising=False)
    params = blk.init(jax.random.key(3), xf, xi, xa)
    out = blk.apply(params, xf, xi, xa)
    g = jax.grad(lambda p: (blk.apply(p, xf, xi, xa) ** 2).sum())(params)

    monkeypatch.setenv("DAVF_UNBATCHED_FUSION", "1")
    params_ub = blk.init(jax.random.key(3), xf, xi, xa)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), params, params_ub)
    ), "param trees must be identical between the two compute paths"
    out_ub = blk.apply(params_ub, xf, xi, xa)
    g_ub = jax.grad(lambda p: (blk.apply(p, xf, xi, xa) ** 2).sum())(params_ub)

    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ub), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ub)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
