"""In-graph image normalization — the uint8-H2D lever.

The reference normalizes frames on the host (torchvision Normalize,
util/image_labels_transforms.py:58-60) and ships float32 over PCIe. On TPU
the host→device copy of a B=64 pretrain batch is 45 MB of f32 — 4x more
bytes than the information content. Shipping the post-crop/flip frame as
uint8 and folding ``x/255 → −mean → /std`` into the jitted step cuts H2D
bytes 4x with identical bf16 compute: the arithmetic runs in f32 on device
in the same op order as the host path (data/transforms.to_normalized_array),
and any ≤1-ulp f32 division difference is absorbed by the bf16 cast the
model applies anyway (tested in tests/test_u8_pipeline.py).

Enabled per-loader with ``normalize=False`` on the image transforms +
dtype-dispatch in the task loss functions (train/pretrain.py): a float
batch passes through untouched, so pre-normalized pipelines (synthetic
batches, older callers) keep working unchanged.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Canonical ImageNet statistics — must match
# data/transforms.IMAGENET_MEAN/STD (host path) exactly.
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_imagenet_u8(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., 3) RGB → f32 normalized, same op order as the host path
    (``to_normalized_array``: /255, −mean, /std — all f32)."""
    xf = x.astype(jnp.float32) / 255.0
    return (xf - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def maybe_normalize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """Dtype dispatch (trace-time): uint8 batches are normalized in-graph,
    float batches pass through (already normalized on host)."""
    if x.dtype == jnp.uint8:
        return normalize_imagenet_u8(x)
    return x
