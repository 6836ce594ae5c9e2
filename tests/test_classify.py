"""Tests for the classification stack: losses vs torch, mixup, LARS, classifier."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from deepavfusion_tpu.train import classify, lars as lars_lib


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    got = float(classify.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_label_smoothing_ce_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, 8)
    got = float(classify.label_smoothing_ce(jnp.asarray(logits), jnp.asarray(labels), 0.1))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=0.1
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bce_with_logits_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(4, 6).astype(np.float32)
    targets = (rng.rand(4, 6) > 0.5).astype(np.float32)
    got = float(classify.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_soft_target_ce_matches_timm_formula():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 6).astype(np.float32)
    soft = rng.dirichlet(np.ones(6), 4).astype(np.float32)
    got = float(classify.soft_target_ce(jnp.asarray(logits), jnp.asarray(soft)))
    t = torch.from_numpy(logits)
    want = torch.sum(
        -torch.from_numpy(soft) * torch.nn.functional.log_softmax(t, -1), dim=-1
    ).mean().item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_av_mixup_properties():
    key = jax.random.key(0)
    img = jnp.ones((4, 8, 8, 3)) * jnp.arange(4.0)[:, None, None, None]
    aud = jnp.ones((4, 4, 4, 1)) * jnp.arange(4.0)[:, None, None, None]
    labels = jnp.asarray([0, 1, 2, 3])
    img_m, aud_m, soft = classify.av_mixup(key, img, aud, labels, 5, smoothing=0.1)
    assert img_m.shape == img.shape and soft.shape == (4, 5)
    # soft targets sum to 1 (smoothing preserves normalization)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, atol=1e-5)
    # image and audio use the SAME lambda: mixed values must be consistent
    lam_img = (np.asarray(img_m)[0, 0, 0, 0] - 3.0) / (0.0 - 3.0)
    lam_aud = (np.asarray(aud_m)[0, 0, 0, 0] - 3.0) / (0.0 - 3.0)
    np.testing.assert_allclose(lam_img, lam_aud, atol=1e-5)


def test_lars_matches_torch():
    from torch_oracle import OracleMlp  # noqa: F401  (import path check)

    rng = np.random.RandomState(4)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    gw = rng.randn(4, 3).astype(np.float32)
    gb = rng.randn(3).astype(np.float32)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    grads = {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}
    tx = lars_lib.lars(0.1, weight_decay=0.01)
    state = tx.init(params)
    import optax

    p = params
    for _ in range(3):
        updates, state = tx.update(grads, state, p)
        p = optax.apply_updates(p, updates)

    # torch reference (reference util/lars.py semantics)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    mu_w = torch.zeros_like(tw)
    mu_b = torch.zeros_like(tb)
    for _ in range(3):
        dp = torch.from_numpy(gw) + 0.01 * tw.data
        q = 0.001 * tw.data.norm() / dp.norm()
        dp = dp * q
        mu_w = mu_w * 0.9 + dp
        tw.data -= 0.1 * mu_w
        mu_b = mu_b * 0.9 + torch.from_numpy(gb)  # 1-D: no wd, no trust
        tb.data -= 0.1 * mu_b
    np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p["b"]), tb.detach().numpy(), atol=1e-5)


def test_avclassifier_forward_and_freeze():
    from deepavfusion_tpu.models import deepavfusion as trunk_mod
    from deepavfusion_tpu.models.classifier import AVClassifier
    from deepavfusion_tpu.models.vit import vit_config

    cfg = trunk_mod.DeepAVFusionConfig(
        image=vit_config("vit_small", (32, 32), 3, depth=2, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", (16, 48), 1, depth=2, embed_dim=48, num_heads=4),
        num_fusion_tkns=(4, 2, 2), fusion_mlp_ratio=1.0, fusion_num_heads=4,
    )
    model = AVClassifier(cfg, num_classes=7, freeze_encoder=True, input_norm=True)
    img = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    aud = jax.random.normal(jax.random.key(1), (4, 16, 48, 1))
    variables = model.init(jax.random.key(2), img, aud, train=True)
    (li, la, lf), updated = model.apply(
        variables, img, aud, train=True, mutable=["batch_stats"]
    )
    assert li.shape == (4, 7)

    # frozen encoder: gradient of loss w.r.t. encoder params must be zero
    def loss(p):
        i, a, f = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            img, aud, train=True, mutable=["batch_stats"],
        )[0]
        return ((i + a + f) ** 2).mean()

    g = jax.grad(loss)(variables["params"])
    enc_norm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g["encoder"]))
    head_norm = float(jnp.abs(g["fusion_head"]["kernel"]).sum())
    assert enc_norm == 0.0
    assert head_norm > 0.0


def test_knn_metrics_sanity():
    from deepavfusion_tpu.train.knn_probe import knn_metrics

    rng = np.random.RandomState(0)
    # two well-separated clusters → 1-NN (2nd neighbor) should be ~perfect
    labels = np.repeat([0, 1], 20)
    base = np.stack([np.eye(8)[0]] * 20 + [np.eye(8)[1]] * 20)
    feats = base + rng.randn(40, 8) * 0.01
    stats = knn_metrics(feats, feats, feats, labels)
    assert stats["all_nn_acc"] == 100.0
    assert set(stats) == {f"{m}_nn_acc" for m in ("audio", "image", "fusion", "all")}


def test_class_weighted_loss_single_label_quirk():
    cf = np.array([0.5, 0.25, 0.25, 0.0], np.float32)
    loss = jnp.asarray(2.0)
    got = float(classify.class_weighted_loss(loss, jnp.asarray(cf), multi_label=False))
    want = 2.0 * np.mean(1.0 / cf[cf > 0])
    np.testing.assert_allclose(got, want, rtol=1e-5)
