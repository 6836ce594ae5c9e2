"""Serving export: portable AOT bundles for trained models.

The reference has no deployment story beyond "load the .pth in the training
code"; production TPU serving wants the inference function frozen as a
hardware-portable artifact with no framework/model code on the serving host.
This module packages exactly that, TPU-natively:

  bundle/
    model.stablehlo   jax.export serialization of the jitted inference fn
                      (params are ARGUMENTS, not baked constants — the blob
                      stays KB-sized and params swap without re-export)
    params/           orbax checkpoint of the parameter pytree
    meta.json         input shapes/dtypes, output names, framework version

``export_fn`` serializes for multiple platforms (default cpu+tpu) so one
bundle serves on either backend; ``load_bundle`` restores a plain callable
with the params pre-loaded and device_put. No flax / model code is needed at
load time — only jax + orbax.

Typical use (classification):

    from deepavfusion_tpu import serve
    serve.export_classifier(model, params, out_dir, batch=8,
                            image_size=224, audio_mels=128, audio_frames=192)
    infer = serve.load_bundle(out_dir)
    logits_image, logits_audio, logits_fusion = infer(images, mels)
"""
from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_META = "meta.json"
_HLO = "model.stablehlo"
_PARAMS = "params"

DEFAULT_PLATFORMS = ("cpu", "tpu")


def _save_params(params, path: str):
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):  # re-export overwrites the bundle
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def _load_params(path: str, device=None):
    """Code-free restore: the target template comes from the checkpoint's own
    metadata (shapes/dtypes), placed on one device — some backends require a
    concrete sharding for deserialization."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)  # StepMetadata → TreeMetadata
    tree = getattr(tree, "tree", tree)
    dev = device if device is not None else jax.devices()[0]
    sharding = jax.sharding.SingleDeviceSharding(dev)
    target = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        tree,
    )
    return ckptr.restore(path, target=target)


def export_fn(
    fn: Callable,
    params,
    example_inputs: Sequence,
    out_dir: str,
    output_names: Sequence[str] = (),
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    extra_meta: dict | None = None,
) -> str:
    """Serialize ``fn(params, *inputs)`` as a serving bundle.

    ``fn`` must be jittable with static shapes; ``example_inputs`` fix the
    served shapes/dtypes (classic fixed-shape TPU serving). Returns out_dir.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    args = (params,) + tuple(example_inputs)
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype), args
    )
    # Trace with the Pallas route disabled: a bundle is a portable artifact
    # and jax.export offers no cross-version compatibility guarantee for
    # Mosaic custom calls (the route would otherwise bake one into the tpu
    # branch when exporting FROM a TPU host, ops/attention.py).
    prev = os.environ.get("DAVF_NO_PALLAS")
    os.environ["DAVF_NO_PALLAS"] = "1"
    try:
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)
    finally:
        if prev is None:
            os.environ.pop("DAVF_NO_PALLAS", None)
        else:
            os.environ["DAVF_NO_PALLAS"] = prev
    with open(os.path.join(out_dir, _HLO), "wb") as f:
        f.write(exp.serialize())
    _save_params(params, os.path.join(out_dir, _PARAMS))
    meta = {
        "inputs": [
            {"shape": list(np.shape(x)), "dtype": str(jnp.asarray(x).dtype)}
            for x in example_inputs
        ],
        "outputs": list(output_names),
        "platforms": list(platforms),
        "jax_version": jax.__version__,
    }
    meta.update(extra_meta or {})
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class Bundle:
    """A loaded serving bundle: ``bundle(*inputs)`` runs inference."""

    def __init__(self, out_dir: str, device=None):
        from jax import export as jexport

        with open(os.path.join(out_dir, _HLO), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        with open(os.path.join(out_dir, _META)) as f:
            self.meta = json.load(f)
        self._params = _load_params(os.path.join(out_dir, _PARAMS), device)
        self._call = jax.jit(self._exported.call)

    def __call__(self, *inputs):
        return self._call(self._params, *inputs)


def load_bundle(out_dir: str, device=None) -> Bundle:
    return Bundle(out_dir, device=device)


# --------------------------------------------------------------------------- #
# Task-level exporters
# --------------------------------------------------------------------------- #
def export_classifier(model, params, out_dir: str, batch: int,
                      image_size: int = 224, audio_mels: int = 128,
                      audio_frames: int = 192,
                      platforms: Sequence[str] = DEFAULT_PLATFORMS) -> str:
    """Export an AVClassifier's eval forward (mean-of-heads is left to the
    caller; all three logit heads are returned, eval_linprobe.py:233)."""

    def infer(p, image, audio):
        out = model.apply({"params": p}, image, audio,
                          train=False, deterministic=True)
        return tuple(jnp.asarray(o) for o in out)

    img = np.zeros((batch, image_size, image_size, 3), np.float32)
    aud = np.zeros((batch, audio_mels, audio_frames, 1), np.float32)
    return export_fn(
        infer, params, (img, aud), out_dir,
        output_names=("logits_image", "logits_audio", "logits_fusion"),
        platforms=platforms,
        extra_meta={"task": "classification"},
    )


def export_encoder(model, params, out_dir: str, batch: int,
                   image_size: int = 224, audio_mels: int = 128,
                   audio_frames: int = 192,
                   platforms: Sequence[str] = DEFAULT_PLATFORMS) -> str:
    """Export the DeepAVFusion trunk's eval forward (pooled features for
    retrieval / probing: image, audio, fusion means)."""

    def infer(p, image, audio):
        x_i, x_a, x_f = model.apply({"params": p}, image, audio,
                                    deterministic=True)
        return (x_i.mean(axis=1).astype(jnp.float32),
                x_a.mean(axis=1).astype(jnp.float32),
                x_f.mean(axis=1).astype(jnp.float32))

    img = np.zeros((batch, image_size, image_size, 3), np.float32)
    aud = np.zeros((batch, audio_mels, audio_frames, 1), np.float32)
    return export_fn(
        infer, params, (img, aud), out_dir,
        output_names=("feat_image", "feat_audio", "feat_fusion"),
        platforms=platforms,
        extra_meta={"task": "encoder"},
    )


def export_segm(model, variables, out_dir: str, batch: int,
                image_size: int = 224, audio_mels: int = 128,
                audio_frames: int = 192,
                platforms: Sequence[str] = DEFAULT_PLATFORMS) -> str:
    """Export AVSegmSimple's eval forward: dense per-pixel mask logits at
    the input resolution (eval_avsegm.py protocol). ``variables`` must carry
    params AND batch_stats (the FPN's BatchNorms serve with running stats)."""

    def infer(v, image, audio):
        _, logits = model.apply(v, image, audio, train=False,
                                deterministic=True)
        return (jnp.asarray(logits, jnp.float32),)

    img = np.zeros((batch, image_size, image_size, 3), np.float32)
    aud = np.zeros((batch, audio_mels, audio_frames, 1), np.float32)
    return export_fn(
        infer, dict(variables), (img, aud), out_dir,
        output_names=("mask_logits",),
        platforms=platforms,
        extra_meta={"task": "avsegm"},
    )


def export_srcsep(model, variables, out_dir: str, batch: int,
                  image_size: int = 224, audio_mels: int = 128,
                  audio_frames: int = 192,
                  platforms: Sequence[str] = DEFAULT_PLATFORMS) -> str:
    """Export AVSrcSep's eval forward: mel-domain separation-mask logits for
    (source frame, mixture log-mel) pairs (eval_avsrcsep.py:240-241); the
    host-side ISTFT stage (`eval_avsrcsep.separate_waveform`) consumes the
    sigmoid of these."""

    def infer(v, image, audio_mix):
        _, logits_mask, _ = model.apply(
            v, image, audio_mix, train=False, deterministic=True)
        return (jnp.asarray(logits_mask, jnp.float32),)

    img = np.zeros((batch, image_size, image_size, 3), np.float32)
    aud = np.zeros((batch, audio_mels, audio_frames, 1), np.float32)
    return export_fn(
        infer, dict(variables), (img, aud), out_dir,
        output_names=("mask_logits",),
        platforms=platforms,
        extra_meta={"task": "avsrcsep"},
    )
