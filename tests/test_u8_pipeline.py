"""uint8-H2D lever: ship uint8 frames, normalize in-graph (ops/image.py).

The host path (data/transforms.to_normalized_array: f32 /255 − mean / std)
and the in-graph path (ops/image.normalize_imagenet_u8, same op order on
device) must agree to f32 rounding, and EXACTLY after the bf16 cast the
model applies — that equality is what makes u8 shipping a pure transport
optimization (4x fewer H2D bytes, reference comparison: the torch loader
ships normalized f32, util/image_labels_transforms.py:53-60).
"""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from deepavfusion_tpu.data import transforms
from deepavfusion_tpu.ops import image as image_ops


def _u8_frames(seed=0, n=4, size=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, size, size, 3)).astype(np.uint8)


def test_constants_match_host_path():
    np.testing.assert_array_equal(image_ops.IMAGENET_MEAN,
                                  transforms.IMAGENET_MEAN)
    np.testing.assert_array_equal(image_ops.IMAGENET_STD,
                                  transforms.IMAGENET_STD)


def test_in_graph_normalize_matches_host():
    u8 = _u8_frames()
    host = (u8.astype(np.float32) / 255.0 - transforms.IMAGENET_MEAN) \
        / transforms.IMAGENET_STD
    dev = np.asarray(jax.jit(image_ops.normalize_imagenet_u8)(jnp.asarray(u8)))
    # f32: ≤1-ulp division differences at most
    np.testing.assert_allclose(dev, host, atol=2e-6)
    # bf16 (the dtype the model computes in): bit-identical
    np.testing.assert_array_equal(
        np.asarray(jnp.asarray(dev, jnp.bfloat16).astype(jnp.float32)),
        np.asarray(jnp.asarray(host, jnp.bfloat16).astype(jnp.float32)))


def test_maybe_normalize_dispatch():
    u8 = _u8_frames(1)
    f32 = u8.astype(np.float32)
    out_u8 = image_ops.maybe_normalize_u8(jnp.asarray(u8))
    assert out_u8.dtype == jnp.float32
    # float input passes through untouched (already normalized on host)
    out_f = image_ops.maybe_normalize_u8(jnp.asarray(f32))
    np.testing.assert_array_equal(np.asarray(out_f), f32)


def test_transforms_emit_uint8():
    img = Image.fromarray(_u8_frames(2, n=1, size=64)[0])
    t = transforms.ImageTrainTransform(32, normalize=False)
    out = t(img)
    assert out.dtype == np.uint8 and out.shape == (32, 32, 3)
    e = transforms.ImageEvalTransform(32, normalize=False)
    out = e(img)
    assert out.dtype == np.uint8 and out.shape == (32, 32, 3)
    # the fused decode-time crop path's finish() too
    arr = _u8_frames(3, n=1, size=32)[0]
    assert t.finish(arr, flip=True).dtype == np.uint8
    f = e.finish(arr, flip=False)
    assert f.dtype == np.uint8
    np.testing.assert_array_equal(f, arr)
    # and the normalized default is unchanged
    tn = transforms.ImageTrainTransform(32)
    assert tn.finish(arr, flip=False).dtype == np.float32


def test_pretrain_loss_identical_u8_vs_f32():
    """The real pretrain loss_fn (train/pretrain.py) produces the SAME loss
    from a u8 batch as from the host-normalized f32 batch."""
    from deepavfusion_tpu.train import pretrain

    cfg = pretrain.PretrainConfig(
        image_backbone="vit_small", audio_backbone="vit_small",
        image_depth=2, audio_depth=2, image_size=32, audio_mels=16,
        audio_frames=48, num_fusion_tkns=(4, 2, 2), fusion_num_heads=6,
        image_decoder_depth=1, audio_decoder_depth=1,
        batch_size=2, dtype=jnp.float32, steps_per_epoch=10.0)
    from deepavfusion_tpu.train import trainer

    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    tx, state, step, _ = pretrain.make_pretrain_step(model, params, cfg, 2)
    # the step donates its state — give the second call fresh buffers
    state2 = trainer.TrainState.create(jax.tree.map(jnp.array, params), tx)

    u8 = _u8_frames(5, n=2, size=32)
    host = (u8.astype(np.float32) / 255.0 - transforms.IMAGENET_MEAN) \
        / transforms.IMAGENET_STD
    aud = np.random.RandomState(6).randn(2, 16, 48, 1).astype(np.float32)
    key = jax.random.key(0)

    _, m_u8 = step(state, {"image": jnp.asarray(u8),
                           "audio": jnp.asarray(aud)}, key)
    _, m_f32 = step(state2, {"image": jnp.asarray(host),
                             "audio": jnp.asarray(aud)}, key)
    assert np.isfinite(float(m_u8["loss"]))
    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f32["loss"]),
                               rtol=1e-6)
