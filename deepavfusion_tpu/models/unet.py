"""U-Net building blocks shared by the separation and segmentation heads.

Reference parity (models/avsrcsep.py:7-46): DoubleConv = (3×3 conv, no bias →
BN → ReLU) × 2; Up = ConvTranspose(k=factor, s=factor) (or bilinear upsample)
followed by DoubleConv over the concat with the lateral input. Channel-last
layout; BatchNorm statistics are global-batch under the sharded train step
(SyncBatchNorm semantics). Conv weights use kaiming-normal fan_out like the
reference init (models/avsrcsep.py:84-85).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_out, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=kaiming_out, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(x)
        return nn.relu(x)


def bilinear_resize(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="bilinear")


class Up(nn.Module):
    """Upscale x1 by ``factor`` then DoubleConv over cat(x1, x2)."""

    in_channels: int
    out_channels: int
    in2_channels: int = 0
    factor: int = 2
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2=None, train: bool = False):
        if self.bilinear:
            x1 = bilinear_resize(x1, self.factor)
            conv = DoubleConv(self.out_channels,
                              mid_channels=self.in_channels // self.factor,
                              dtype=self.dtype, name="conv")
        else:
            x1 = nn.ConvTranspose(
                self.in_channels // self.factor,
                (self.factor, self.factor), strides=(self.factor, self.factor),
                dtype=self.dtype, kernel_init=kaiming_out, name="up",
            )(x1)
            conv = DoubleConv(self.out_channels, dtype=self.dtype, name="conv")
        if x2 is not None:
            x1 = jnp.concatenate([x1, x2], axis=-1)
        return conv(x1, train=train)
