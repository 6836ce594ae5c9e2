"""AVMAE: masked-autoencoder pretraining wrapper over the DeepAVFusion trunk.

Functional parity with reference models/avmae.py. Each modality has its own
decoder (embed → mask-token unshuffle → +sincos pos → depth×Block → norm →
per-patch linear pred). The 'plain' decoder prepends the fusion tokens to the
sequence (reference :168-172); 'swin' passes them per-window (models/swin.py).

TPU-first: masking happens INSIDE the jitted step from threaded PRNG keys
(static keep lengths → fixed-shape argsort/gather, SURVEY.md §7 hard-part #3);
the whole forward (two encoders + two decoders + losses) is one traced
function. Decoder pos-embeds are *trainable* parameters initialized to sin-cos
— the reference declares them nn.Parameter without freezing (avmae.py:34,64)
despite the "fixed" comment, and we match that behavior.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import masking as mask_ops
from ..ops import pos_embed as pe
from .deepavfusion import DeepAVFusion, DeepAVFusionConfig
from .layers import Block, Dtype, layer_norm


@dataclasses.dataclass(frozen=True)
class MAEDecoderConfig:
    arch: str = "plain"          # 'plain' | 'swin'
    depth: int = 8
    mask_ratio: float = 0.75
    norm_loss: bool = True       # per-patch normalized pixel loss


@dataclasses.dataclass(frozen=True)
class AVMAEConfig:
    encoder: DeepAVFusionConfig = dataclasses.field(default_factory=DeepAVFusionConfig)
    image_decoder: MAEDecoderConfig = dataclasses.field(
        default_factory=lambda: MAEDecoderConfig(mask_ratio=0.75)
    )
    audio_decoder: MAEDecoderConfig = dataclasses.field(
        default_factory=lambda: MAEDecoderConfig(mask_ratio=0.8)
    )
    decoder_dim: int = 512
    decoder_num_heads: int = 16
    decoder_mlp_ratio: float = 4.0
    norm_eps: float = 1e-5  # decoders use plain nn.LayerNorm (avmae.py:14)
    remat: bool = False     # rematerialize decoder blocks (plain + swin archs)


class MAEDecoder(nn.Module):
    """One modality's decoder (reference avmae.py:147-180)."""

    cfg: MAEDecoderConfig
    grid_size: tuple[int, int]
    patch_dim: int               # pH*pW*C prediction size
    decoder_dim: int = 512
    num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embed = nn.Dense(self.decoder_dim, dtype=self.dtype, name="embed")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, self.decoder_dim)
        )
        # Trainable, sincos-initialized (see module docstring).
        gh, gw = self.grid_size
        init_pe = pe.sincos_2d(self.decoder_dim, (gh, gw))[None]
        self.decoder_pos_embed = self.param(
            "pos_embed", lambda key: jnp.asarray(init_pe, jnp.float32)
        )
        if self.cfg.arch == "swin":
            from .swin import SwinBlock

            SwinCls = (nn.remat(SwinBlock, static_argnums=(3,))
                       if self.remat else SwinBlock)
            self.blocks = [
                SwinCls(
                    input_resolution=self.grid_size,
                    num_heads=self.num_heads,
                    window_size=4,
                    shift_size=(i % 2) * 2,
                    mlp_ratio=self.mlp_ratio,
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )
                for i in range(self.cfg.depth)
            ]
        else:
            BlockCls = (nn.remat(Block, static_argnums=(2,))
                        if self.remat else Block)
            self.blocks = [
                BlockCls(
                    self.num_heads, self.mlp_ratio, qkv_bias=True,
                    norm_eps=self.norm_eps, dtype=self.dtype, name=f"blocks_{i}",
                )
                for i in range(self.cfg.depth)
            ]
        self.norm = layer_norm(self.norm_eps, self.dtype, "norm")
        self.pred = nn.Dense(self.patch_dim, dtype=self.dtype, name="pred")

    def __call__(
        self,
        x: jnp.ndarray,
        x_fusion: jnp.ndarray,
        ids_restore: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        nF = x_fusion.shape[1]
        x = self.embed(x)
        x_fusion = self.embed(x_fusion)
        x = mask_ops.unshuffle_with_mask_tokens(
            x, self.mask_token.astype(x.dtype), ids_restore
        )
        x = x + self.decoder_pos_embed.astype(x.dtype)

        if self.cfg.arch == "plain":
            x = jnp.concatenate([x_fusion, x], axis=1)
            for blk in self.blocks:
                x = blk(x, deterministic)   # positional: remat static_argnums
            x = x[:, nF:]
        elif self.cfg.arch == "swin":
            for blk in self.blocks:
                x, x_fusion = blk(x, x_fusion, deterministic)  # positional: remat static_argnums
        else:
            raise ValueError(f"unknown decoder arch {self.cfg.arch}")
        return self.pred(self.norm(x))


def mae_loss(
    target: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray, norm_pix_loss: bool
) -> jnp.ndarray:
    """MSE over masked patches only (reference avmae.py:182-198).

    norm_pix: target standardized per patch with var (not std) eps semantics
    ``(t - mean) / sqrt(var + 1e-6)``. torch's Tensor.var is UNBIASED
    (correction=1), unlike numpy/jnp's default — ddof=1 here is load-bearing
    for checkpoint-level loss parity (caught by test_reference_parity.py).
    """
    target = target.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True, ddof=1)
        target = (target - mean) / jnp.sqrt(var + 1e-6)
    loss = ((pred - target) ** 2).mean(axis=-1)
    return (loss * mask).sum() / mask.sum()


class AVMAE(nn.Module):
    """Full pretraining model: masking + trunk + dual decoders + losses.

    __call__(image (B,H,W,3), audio (B,128,192,1), key) →
    dict(loss, loss_image, loss_audio, pred_image, pred_audio).
    """

    cfg: AVMAEConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = DeepAVFusion(c.encoder, dtype=self.dtype, name="encoder")
        ips = c.encoder.image.patch_size
        aps = c.encoder.audio.patch_size
        self.image_decoder = MAEDecoder(
            c.image_decoder, c.encoder.image.grid_size, ips[0] * ips[1] * 3,
            c.decoder_dim, c.decoder_num_heads, c.decoder_mlp_ratio,
            c.norm_eps, remat=c.remat, dtype=self.dtype, name="image_decoder",
        )
        self.audio_decoder = MAEDecoder(
            c.audio_decoder, c.encoder.audio.grid_size, aps[0] * aps[1] * 1,
            c.decoder_dim, c.decoder_num_heads, c.decoder_mlp_ratio,
            c.norm_eps, remat=c.remat, dtype=self.dtype, name="audio_decoder",
        )

    def __call__(
        self,
        image: jnp.ndarray,
        audio: jnp.ndarray,
        mask_key: jax.Array,
        deterministic: bool = True,
    ):
        c = self.cfg
        B = image.shape[0]
        k_img, k_aud = jax.random.split(mask_key)

        img_info = mask_ops.random_masking(
            k_img, B, c.encoder.image.num_patches, c.image_decoder.mask_ratio
        )
        aud_info = mask_ops.random_masking(
            k_aud, B, c.encoder.audio.num_patches, c.audio_decoder.mask_ratio
        )

        x_image, x_audio, x_fusion = self.encoder(
            image, audio,
            image_ids_keep=img_info.ids_keep,
            audio_ids_keep=aud_info.ids_keep,
            deterministic=deterministic,
        )

        target_image = mask_ops.patchify(image, c.encoder.image.patch_size)
        pred_image = self.image_decoder(
            x_image, x_fusion, img_info.ids_restore, deterministic=deterministic
        )
        loss_image = mae_loss(
            target_image, pred_image, img_info.mask, c.image_decoder.norm_loss
        )

        target_audio = mask_ops.patchify(audio, c.encoder.audio.patch_size)
        pred_audio = self.audio_decoder(
            x_audio, x_fusion, aud_info.ids_restore, deterministic=deterministic
        )
        loss_audio = mae_loss(
            target_audio, pred_audio, aud_info.mask, c.audio_decoder.norm_loss
        )

        return {
            "loss": loss_image + loss_audio,
            "loss_image": loss_image,
            "loss_audio": loss_audio,
            "pred_image": pred_image,
            "pred_audio": pred_audio,
            "image_mask": img_info.mask,
            "audio_mask": aud_info.mask,
        }
