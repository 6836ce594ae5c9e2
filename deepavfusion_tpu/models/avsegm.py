"""Audio-visual semantic segmentation head (reference models/avsegm.py).

AVSegmSimple: taps 4 image-encoder depths (linspace(0, L-1, 4) = [0, 3, 7, 11]
for ViT-B, reference :93), FPN-style upsampling with the *final-layer* audio
embedding globally pooled, projected per scale and broadcast-concatenated at
every lateral (:94-105). Predictor: 3×3 conv → 2× bilinear → 3×3 conv to
num_classes at the input resolution (:57-61). BCE (binary) or CE loss.

The reference adds a zero-valued keepalive term Σ p.sum()*0 (:115) to satisfy
DDP's all-params-used check — unnecessary under jit, omitted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .deepavfusion import DeepAVFusion, DeepAVFusionConfig
from .layers import Dtype, layer_norm
from .unet import DoubleConv, Up, bilinear_resize


class AVSegmSimple(nn.Module):
    cfg: DeepAVFusionConfig
    num_classes: int = 71
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = DeepAVFusion(self.cfg, dtype=self.dtype, name="encoder")
        d = self.cfg.embed_dim
        self.scales = (1, 2, 4, 8)
        self.layer_dims = tuple(max(128, d // s) for s in self.scales)
        self.normv = [layer_norm(1e-5, self.dtype, f"normv_{i}") for i in range(4)]
        self.proja = [
            nn.Dense(self.layer_dims[i], dtype=self.dtype, name=f"proja_{i}")
            for i in range(4)
        ]
        self.norma = [layer_norm(1e-5, self.dtype, f"norma_{i}") for i in range(4)]
        self.top = DoubleConv(d, dtype=self.dtype, name="top")
        self.lat = [
            Up(d, self.layer_dims[i], factor=self.scales[i], dtype=self.dtype,
               name=f"lat_{i}")
            for i in range(1, 4)
        ]
        self.up = [
            Up(self.layer_dims[i], self.layer_dims[i + 1],
               in2_channels=self.layer_dims[i + 1] * 2, dtype=self.dtype,
               name=f"up_{i}")
            for i in range(3)
        ]
        self.pred_conv1 = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                                  name="pred_conv1")
        self.pred_conv2 = nn.Conv(self.num_classes, (3, 3), padding=1,
                                  dtype=self.dtype, name="pred_conv2")

    def __call__(self, image, audio, gt_segm=None, train: bool = False,
                 deterministic: bool = True):
        _, _, _, embs = self.encoder(
            image, audio, return_embs=True, deterministic=deterministic
        )
        gh, gw = self.cfg.image.grid_size
        b = image.shape[0]
        depth_idx = np.linspace(0, len(embs) - 1, 4, endpoint=True).astype(int)

        xv_list = [embs[di][0] for di in depth_idx]
        xa_last = embs[-1][1]
        xa_list = [
            self.norma[i](self.proja[i](xa_last)).mean(axis=1) for i in range(4)
        ]
        xv_list = [
            self.normv[i](xv).reshape(b, gh, gw, -1) for i, xv in enumerate(xv_list)
        ]

        xa_top = jnp.broadcast_to(
            xa_list[0][:, None, None, :], (b, gh, gw, xa_list[0].shape[-1])
        )
        x = self.top(jnp.concatenate([xv_list[0], xa_top], -1), train=train)
        for i in range(3):
            xv = self.lat[i](xv_list[i + 1], train=train)
            xa = jnp.broadcast_to(
                xa_list[i + 1][:, None, None, :],
                xv.shape[:3] + (xa_list[i + 1].shape[-1],),
            )
            x = self.up[i](x, jnp.concatenate([xv, xa], -1), train=train)

        x = self.pred_conv1(x)
        x = bilinear_resize(x, 2)
        logits = self.pred_conv2(x)              # (B, H, W, num_classes)
        logits = jnp.moveaxis(logits, -1, 1)     # (B, C, H, W) like reference

        loss = None
        if gt_segm is not None:
            logits32 = logits.astype(jnp.float32)
            if self.num_classes == 1:
                gt = gt_segm.astype(jnp.float32)
                logp = jax.nn.log_sigmoid(logits32[:, 0])
                lognp = jax.nn.log_sigmoid(-logits32[:, 0])
                loss = -(gt * logp + (1 - gt) * lognp).mean()
            else:
                logp = jax.nn.log_softmax(logits32, axis=1)
                onehot = jax.nn.one_hot(gt_segm, self.num_classes, axis=1)
                loss = -(onehot * logp).sum(axis=1).mean()
        return loss, logits
