"""Visually-guided audio source separation head (reference models/avsrcsep.py).

AVSrcSepUNet: taps 5 audio-encoder depths (linspace(0, L-1, 5) reversed, e.g.
[11, 8, 5, 2, 0] for ViT-B; reference :92), reshapes tokens to the mel grid,
and runs an FPN/U-Net over them with the mean-pooled final image tokens
injected at every lateral via per-scale linear conditioners. Predicts a
1-channel mel-domain mask logit map at (mels, frames).

AVSrcSep.loss: un-log the specs (10**log_spec), optional log1p-magnitude
weighting clamped to [1e-3, 10], binary (spec > spec_mix) or ratio target
mask, weighted BCE-with-logits (reference :136-155).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .deepavfusion import DeepAVFusion, DeepAVFusionConfig
from .layers import Dtype, layer_norm
from .unet import DoubleConv, Up


class AVSrcSepUNet(nn.Module):
    embed_dim: int
    bilinear: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xa_embs, xv, audio_gs=(8, 12), train: bool = False):
        d = self.embed_dim
        bs = xa_embs[0].shape[0]
        gh, gw = audio_gs
        enc_idx = np.linspace(0, len(xa_embs) - 1, 5, endpoint=True)[::-1].astype(int)

        xs = []
        for i, e in enumerate(enc_idx):
            t = layer_norm(1e-5, self.dtype, f"xa_norm_{i}")(xa_embs[e])
            xs.append(t.reshape(bs, gh, gw, d))
        xa1, xa2, xa3, xa4, xa5 = xs

        xv = layer_norm(1e-5, self.dtype, "xv_norm")(xv).mean(axis=1)

        def cond(name, dim, h, w):
            c = nn.Dense(dim, dtype=self.dtype, name=name)(xv)
            return jnp.broadcast_to(c[:, None, None, :], (bs, h, w, dim))

        x = DoubleConv(d, dtype=self.dtype, name="top")(
            jnp.concatenate([xa5, cond("cond5", d, gh, gw)], -1), train=train
        )

        lat4 = Up(d, d // 2, factor=2, bilinear=self.bilinear, dtype=self.dtype,
                  name="lat4")(xa4, train=train)
        x = Up(d, d // 2, in2_channels=d, bilinear=self.bilinear, dtype=self.dtype,
               name="up4")(x, jnp.concatenate([lat4, cond("cond4", d // 2, gh * 2, gw * 2)], -1), train=train)

        lat3 = Up(d, d // 4, factor=4, bilinear=self.bilinear, dtype=self.dtype,
                  name="lat3")(xa3, train=train)
        x = Up(d // 2, d // 4, in2_channels=d // 2, bilinear=self.bilinear,
               dtype=self.dtype, name="up3")(x, jnp.concatenate([lat3, cond("cond3", d // 4, gh * 4, gw * 4)], -1), train=train)

        lat2 = Up(d, d // 8, factor=8, bilinear=self.bilinear, dtype=self.dtype,
                  name="lat2")(xa2, train=train)
        x = Up(d // 4, d // 8, in2_channels=d // 4, bilinear=self.bilinear,
               dtype=self.dtype, name="up2")(x, jnp.concatenate([lat2, cond("cond2", d // 8, gh * 8, gw * 8)], -1), train=train)

        lat1 = Up(d, d // 16, factor=16, bilinear=self.bilinear, dtype=self.dtype,
                  name="lat1")(xa1, train=train)
        x = Up(d // 8, d // 16, in2_channels=d // 8, bilinear=self.bilinear,
               dtype=self.dtype, name="up1")(x, jnp.concatenate([lat1, cond("cond1", d // 16, gh * 16, gw * 16)], -1), train=train)

        logits = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="pred")(x)
        return logits[..., 0]  # (B, mels, frames)


def srcsep_loss(
    pred_mask: jnp.ndarray,
    log_spec_mix: jnp.ndarray,
    log_spec: jnp.ndarray,
    weighted_loss: bool = True,
    binary_mask: bool = True,
):
    """(loss, gt_masks) per reference models/avsrcsep.py:136-155."""
    pred_mask = pred_mask.astype(jnp.float32)
    spec = jnp.power(10.0, log_spec.astype(jnp.float32))
    spec_mix = jnp.power(10.0, log_spec_mix.astype(jnp.float32))

    if weighted_loss:
        weight = jnp.clip(jnp.log1p(spec_mix), 1e-3, 10.0)
    else:
        weight = jnp.ones_like(spec_mix)

    if binary_mask:
        gt = (spec > spec_mix).astype(jnp.float32)
    else:
        gt = jnp.clip(spec / (spec + spec_mix + 1e-5), 0.0, 1.0)

    logp = jax.nn.log_sigmoid(pred_mask)
    lognp = jax.nn.log_sigmoid(-pred_mask)
    loss = -(gt * logp + (1.0 - gt) * lognp) * weight
    return loss.mean(), gt


class AVSrcSep(nn.Module):
    """Full separation model: encoder(return_embs) → conditioned U-Net → mask."""

    cfg: DeepAVFusionConfig
    log_freq: bool = True
    weighted_loss: bool = True
    binary_mask: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = DeepAVFusion(self.cfg, dtype=self.dtype, name="encoder")
        self.avss_decoder = AVSrcSepUNet(self.cfg.embed_dim, dtype=self.dtype,
                                         name="avss_decoder")

    def __call__(self, image, audio_mix, audio_gt=None, train: bool = False,
                 deterministic: bool = True):
        _, _, _, embs = self.encoder(
            image, audio_mix, return_embs=True, deterministic=deterministic
        )
        xv = embs[-1][0]
        xa_embs = [e[1] for e in embs]
        # audio spectrogram input is (B, mels, frames, 1); mel grid from cfg
        audio_gs = self.cfg.audio.grid_size
        logits_mask = self.avss_decoder(xa_embs, xv, audio_gs, train=train)

        loss = gt_masks = None
        if audio_gt is not None:
            loss, gt_masks = srcsep_loss(
                logits_mask, audio_mix[..., 0], audio_gt[..., 0],
                self.weighted_loss, self.binary_mask,
            )
        return loss, logits_mask, gt_masks
