"""Serving-bundle export/reload roundtrips (deepavfusion_tpu/serve.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from deepavfusion_tpu import serve
from deepavfusion_tpu.models.classifier import AVClassifier
from deepavfusion_tpu.models.deepavfusion import DeepAVFusion, DeepAVFusionConfig
from deepavfusion_tpu.models.vit import vit_config


def tiny_cfg():
    return DeepAVFusionConfig(
        image=vit_config("vit_small", (32, 32), 3, depth=2, embed_dim=48, num_heads=4),
        audio=vit_config("vit_small", (16, 48), 1, depth=2, embed_dim=48, num_heads=4),
        fusion_arch="factorized_mmi",
        num_fusion_tkns=(4, 2, 2),
        fusion_num_heads=4,
        fusion_mlp_ratio=1.0,
    )


def test_classifier_bundle_roundtrip(tmp_path):
    model = AVClassifier(tiny_cfg(), num_classes=5)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)
    params = model.init(jax.random.key(0), img, aud)["params"]

    out_dir = str(tmp_path / "bundle")
    serve.export_classifier(model, params, out_dir, batch=2,
                            image_size=32, audio_mels=16, audio_frames=48,
                            platforms=("cpu",))
    want = model.apply({"params": params}, img, aud,
                       train=False, deterministic=True)

    infer = serve.load_bundle(out_dir)
    got = infer(img, aud)
    assert infer.meta["outputs"] == ["logits_image", "logits_audio", "logits_fusion"]
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), atol=1e-5)


def test_encoder_bundle_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = DeepAVFusion(cfg)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)
    params = model.init(jax.random.key(0), img, aud)["params"]

    out_dir = str(tmp_path / "enc")
    serve.export_encoder(model, params, out_dir, batch=2,
                         image_size=32, audio_mels=16, audio_frames=48,
                         platforms=("cpu",))
    infer = serve.load_bundle(out_dir)
    fi, fa, ff = infer(img, aud)
    xi, xa, xf = model.apply({"params": params}, img, aud, deterministic=True)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(xi.mean(1)), atol=1e-5)
    assert fi.shape == (2, 48) and ff.shape == (2, 48)


def test_bundle_is_code_free(tmp_path):
    """The serialized fn reloads without constructing the flax model."""
    model = AVClassifier(tiny_cfg(), num_classes=3)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(1, 16, 48, 1), jnp.float32)
    params = model.init(jax.random.key(0), img, aud)["params"]
    out_dir = str(tmp_path / "b")
    serve.export_classifier(model, params, out_dir, batch=1,
                            image_size=32, audio_mels=16, audio_frames=48,
                            platforms=("cpu",))
    del model, params
    infer = serve.load_bundle(out_dir)
    out = infer(img, aud)
    assert len(out) == 3 and out[0].shape == (1, 3)
    assert np.isfinite(np.asarray(out[0])).all()


def test_export_bundle_cli(tmp_path):
    """export_bundle.py builds an encoder bundle from the linprobe config
    surface (random init when no checkpoint is given)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import export_bundle
    from deepavfusion_tpu.config import load_config

    args = load_config("linprobe", overrides=[
        "task=encoder",
        f"bundle_dir={tmp_path}/enc",
        "bundle_batch=2",
        "model.image.backbone=vit_small", "model.audio.backbone=vit_small",
        "model.image.depth=2", "model.audio.depth=2",
        "model.fusion.num_heads=6",
        "data.image_size=32", "data.audio_mels=16", "data.audio_dur=0.75",
        f"output_dir={tmp_path}",
    ])
    out = export_bundle.main_worker(args)
    infer = serve.load_bundle(out)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)
    fi, fa, ff = infer(img, aud)
    assert fi.shape[0] == 2 and np.isfinite(np.asarray(ff)).all()
    assert infer.meta["task"] == "encoder"


def test_segm_and_srcsep_bundle_roundtrips(tmp_path):
    """Dense-head serving: AVSegm mask logits and AVSrcSep separation-mask
    logits roundtrip through bundles, incl. BatchNorm running stats."""
    from deepavfusion_tpu.models.avsegm import AVSegmSimple
    from deepavfusion_tpu.models.avsrcsep import AVSrcSep

    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)

    segm = AVSegmSimple(tiny_cfg(), num_classes=1)
    variables = segm.init(jax.random.key(0), img, aud, train=False)
    serve.export_segm(segm, variables, str(tmp_path / "segm"), batch=2,
                      image_size=32, audio_mels=16, audio_frames=48,
                      platforms=("cpu",))
    infer = serve.load_bundle(str(tmp_path / "segm"))
    (got,) = infer(img, aud)
    _, want = segm.apply(variables, img, aud, train=False, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.shape == (2, 1, 32, 32)

    ss = AVSrcSep(tiny_cfg())
    variables = ss.init(jax.random.key(1), img, aud, train=False)
    serve.export_srcsep(ss, variables, str(tmp_path / "ss"), batch=2,
                        image_size=32, audio_mels=16, audio_frames=48,
                        platforms=("cpu",))
    infer = serve.load_bundle(str(tmp_path / "ss"))
    (got,) = infer(img, aud)
    _, want, _ = ss.apply(variables, img, aud, train=False, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert infer.meta["task"] == "avsrcsep"


def test_export_bundle_cli_avsegm(tmp_path):
    """export_bundle.py task=avsegm builds a dense-mask bundle (binary head
    by default) from the linprobe config surface."""
    import sys

    sys.path.insert(0, "/root/repo")
    import export_bundle
    from deepavfusion_tpu.config import load_config

    args = load_config("linprobe", overrides=[
        "task=avsegm",
        f"bundle_dir={tmp_path}/segm",
        "bundle_batch=2",
        "model.image.backbone=vit_small", "model.audio.backbone=vit_small",
        "model.image.depth=2", "model.audio.depth=2",
        "model.fusion.num_heads=6",
        "data.image_size=32", "data.audio_mels=16", "data.audio_dur=0.75",
        f"output_dir={tmp_path}",
    ])
    out = export_bundle.main_worker(args)
    infer = serve.load_bundle(out)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)
    (mask,) = infer(img, aud)
    assert mask.shape == (2, 1, 32, 32)
    assert infer.meta["task"] == "avsegm"


def test_int8_quantize_roundtrip():
    """Per-channel symmetric int8: dequant error bounded by scale/2 per
    element; relative L2 error small for Gaussian weights."""
    rng = np.random.RandomState(7)
    params = {
        "attn": {"qkv": {"kernel": rng.randn(96, 288).astype(np.float32),
                         "bias": rng.randn(288).astype(np.float32)}},
        "norm": {"scale": np.ones(96, np.float32)},
        "tiny": {"kernel": rng.randn(8, 8).astype(np.float32)},  # < min_dim
        "conv": {"kernel": rng.randn(3, 3, 4, 8).astype(np.float32)},  # 4-D
    }
    qp = serve.quantize_params_int8(params)
    assert serve._is_q8_node(qp["attn"]["qkv"]["kernel"])
    assert qp["attn"]["qkv"]["kernel"]["__q8__"].dtype == np.int8
    # untouched leaves pass through
    assert qp["tiny"]["kernel"].shape == (8, 8)
    assert qp["conv"]["kernel"].shape == (3, 3, 4, 8)
    assert qp["norm"]["scale"].shape == (96,)

    deq = serve.dequantize_params(qp, dtype=jnp.float32)
    w = params["attn"]["qkv"]["kernel"]
    scale = np.abs(w).max(axis=0) / 127.0
    assert np.max(np.abs(np.asarray(deq["attn"]["qkv"]["kernel"]) - w)
                  / scale[None, :]) <= 0.5 + 1e-3
    assert serve.quantization_error(params, qp) < 0.01


def test_int8_bundle_roundtrip(tmp_path):
    """q8 bundle: int8 params on disk, logits close to the f32 export."""
    model = AVClassifier(tiny_cfg(), num_classes=5)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    aud = jnp.asarray(rng.randn(2, 16, 48, 1), jnp.float32)
    params = model.init(jax.random.key(0), img, aud)["params"]

    out_dir = str(tmp_path / "q8")
    serve.export_classifier(model, params, out_dir, batch=2,
                            image_size=32, audio_mels=16, audio_frames=48,
                            platforms=("cpu",), quantize="int8")
    infer = serve.load_bundle(out_dir)
    assert infer.meta["quantize"] == "int8"
    got = infer(img, aud)
    want = model.apply({"params": params}, img, aud,
                       train=False, deterministic=True)
    for w, g in zip(want, got):
        w = np.asarray(w)
        g = np.asarray(g)
        # weight-only int8 + bf16 dequant: logits agree to quantization noise
        assert np.max(np.abs(w - g)) < 0.15 * (np.abs(w).max() + 1.0)
        # ranking preserved on every sample (the serving contract that matters)
        assert (w.argmax(-1) == g.argmax(-1)).all()
