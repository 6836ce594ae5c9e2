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
from collections.abc import Mapping
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


# --------------------------------------------------------------------------- #
# int8 weight-only quantization (serving)
#
# Per-output-channel symmetric int8 on the 2-D matmul kernels (qkv/proj/mlp/
# heads — where ~all the weight bytes are). TPU-native rationale: at serving
# batch sizes the matmuls are HBM-bound on WEIGHT traffic; int8 storage
# halves the bytes (vs bf16; 4x vs the f32 master copy) and XLA fuses the
# `convert * scale` dequant into the consuming dot's operand load, so the
# weights cross HBM as int8. Activations stay bf16 — accuracy-safe
# weight-only PTQ, no calibration data needed.
# --------------------------------------------------------------------------- #
_Q8_KEY = "__q8__"


def _is_q8_node(node) -> bool:
    return isinstance(node, Mapping) and _Q8_KEY in node


def quantize_params_int8(params, min_dim: int = 64):
    """Quantize every 2-D ``kernel`` with both dims >= min_dim.

    Each quantized leaf becomes ``{"__q8__": int8 (k, n), "scale": f32 (n,)}``
    (per-output-channel symmetric, max-abs scaling). Conv kernels, norms,
    biases, embeddings, and small projections pass through untouched.
    """

    def quant(w):
        w = np.asarray(jax.device_get(w), np.float32)
        scale = np.abs(w).max(axis=0) / 127.0
        scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {_Q8_KEY: q, "scale": scale}

    def rec(node, name):
        if isinstance(node, Mapping):
            return {k: rec(v, k) for k, v in node.items()}
        arr = np.asarray(jax.device_get(node))
        if (name == "kernel" and arr.ndim == 2
                and min(arr.shape) >= min_dim
                and arr.dtype in (np.float32, np.float64)):
            return quant(arr)
        return node

    return rec(params, "")


def dequantize_params(qparams, dtype=jnp.bfloat16):
    """Inverse of quantize_params_int8 — jittable; quantized kernels come
    back in ``dtype`` (the models' compute dtype), everything else verbatim.
    Inside a jit, XLA fuses the convert+scale into the consuming matmul."""

    def rec(node):
        if _is_q8_node(node):
            return jnp.asarray(node[_Q8_KEY]).astype(dtype) * jnp.asarray(
                node["scale"]).astype(dtype)
        if isinstance(node, Mapping):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(qparams)


def quantization_error(params, qparams):
    """Max relative per-tensor L2 error of the quantized leaves (sanity)."""
    worst = 0.0

    def rec(p, q):
        nonlocal worst
        if _is_q8_node(q):
            w = np.asarray(jax.device_get(p), np.float32)
            deq = np.asarray(q[_Q8_KEY], np.float32) * q["scale"]
            worst = max(worst, float(np.linalg.norm(deq - w) /
                                     (np.linalg.norm(w) + 1e-12)))
        elif isinstance(q, Mapping):
            for k in q:
                rec(p[k], q[k])

    rec(params, qparams)
    return worst


def export_fn(
    fn: Callable,
    params,
    example_inputs: Sequence,
    out_dir: str,
    output_names: Sequence[str] = (),
    platforms: Sequence[str] = DEFAULT_PLATFORMS,
    extra_meta: dict | None = None,
    quantize: str | None = None,
) -> str:
    """Serialize ``fn(params, *inputs)`` as a serving bundle.

    ``fn`` must be jittable with static shapes; ``example_inputs`` fix the
    served shapes/dtypes (classic fixed-shape TPU serving).
    ``quantize="int8"`` stores int8 weight-only params (see
    quantize_params_int8) with the dequant baked into the exported graph —
    the bundle shrinks ~4x vs f32 and serves with int8 HBM weight traffic.
    Returns out_dir.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    if quantize == "int8":
        inner = fn
        params = quantize_params_int8(params)

        def fn(qp, *inputs):  # noqa: F811 — the exported fn wraps dequant
            return inner(dequantize_params(qp), *inputs)

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
        "quantize": quantize,
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
                      platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      quantize: str | None = None) -> str:
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
        platforms=platforms, quantize=quantize,
        extra_meta={"task": "classification"},
    )


def export_encoder(model, params, out_dir: str, batch: int,
                   image_size: int = 224, audio_mels: int = 128,
                   audio_frames: int = 192,
                   platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      quantize: str | None = None) -> str:
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
        platforms=platforms, quantize=quantize,
        extra_meta={"task": "encoder"},
    )


def export_segm(model, variables, out_dir: str, batch: int,
                image_size: int = 224, audio_mels: int = 128,
                audio_frames: int = 192,
                platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      quantize: str | None = None) -> str:
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
        platforms=platforms, quantize=quantize,
        extra_meta={"task": "avsegm"},
    )


def export_srcsep(model, variables, out_dir: str, batch: int,
                  image_size: int = 224, audio_mels: int = 128,
                  audio_frames: int = 192,
                  platforms: Sequence[str] = DEFAULT_PLATFORMS,
                      quantize: str | None = None) -> str:
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
        platforms=platforms, quantize=quantize,
        extra_meta={"task": "avsrcsep"},
    )
