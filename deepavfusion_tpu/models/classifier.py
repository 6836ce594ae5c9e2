"""AVClassifier: three linear heads over mean-pooled track features.

Reference parity (models/classifier.py): optional frozen encoder (handled by
the training loop via jax.lax.stop_gradient + optax.masked rather than
requires_grad), optional affine-free BatchNorm1d feature normalization with
eps=1e-6 used by the linear probe.

TPU-first note on the BatchNorm: inside the jitted, batch-sharded train step
the batch statistics are computed over the *global* batch — XLA inserts the
cross-replica mean — which reproduces the reference's SyncBatchNorm
conversion (util/misc.py:33) with zero extra code. Running averages live in
the 'batch_stats' collection for eval.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .deepavfusion import DeepAVFusion, DeepAVFusionConfig
from .layers import Dtype


class AVClassifier(nn.Module):
    cfg: DeepAVFusionConfig
    num_classes: int
    freeze_encoder: bool = False
    input_norm: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = DeepAVFusion(self.cfg, dtype=self.dtype, name="encoder")
        if self.input_norm:
            # affine-free BatchNorm1d(eps=1e-6), reference models/classifier.py:14-18
            kw = dict(use_bias=False, use_scale=False, epsilon=1e-6,
                      momentum=0.9, dtype=jnp.float32)
            self.image_norm = nn.BatchNorm(**kw, name="image_norm")
            self.audio_norm = nn.BatchNorm(**kw, name="audio_norm")
            self.fusion_norm = nn.BatchNorm(**kw, name="fusion_norm")
        self.image_head = nn.Dense(self.num_classes, dtype=jnp.float32, name="image_head")
        self.audio_head = nn.Dense(self.num_classes, dtype=jnp.float32, name="audio_head")
        self.fusion_head = nn.Dense(self.num_classes, dtype=jnp.float32, name="fusion_head")

    def __call__(self, image, audio, train: bool = False, deterministic: bool = True):
        x_image, x_audio, x_fusion = self.encoder(
            image, audio, deterministic=deterministic
        )
        if self.freeze_encoder:
            x_image = jax.lax.stop_gradient(x_image)
            x_audio = jax.lax.stop_gradient(x_audio)
            x_fusion = jax.lax.stop_gradient(x_fusion)

        x_image = x_image.mean(axis=1).astype(jnp.float32)
        x_audio = x_audio.mean(axis=1).astype(jnp.float32)
        x_fusion = x_fusion.mean(axis=1).astype(jnp.float32)

        if self.input_norm:
            # frozen-encoder probe keeps BN in train mode only during training
            use_ra = not train
            x_image = self.image_norm(x_image, use_running_average=use_ra)
            x_audio = self.audio_norm(x_audio, use_running_average=use_ra)
            x_fusion = self.fusion_norm(x_fusion, use_running_average=use_ra)

        return (
            self.image_head(x_image),
            self.audio_head(x_audio),
            self.fusion_head(x_fusion),
        )
