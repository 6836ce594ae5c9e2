"""Video ViT encoder for the AV-sync task (reference models/video_vits.py).

Tube patch embedding (Conv3D, default (2,16,16)), 3D sin-cos position
embedding, and either joint space-time self-attention ('joint_all') or
TimeSformer divided space-time attention ('divided_space_time': temporal
attention over same-position tokens across frames with a zero-initializable
temporal_fc, then spatial attention per frame; reference :18-95).

Note: the reference's no-cls prepare_patch_tokens adds pos_embed *after* the
mask gather (video_vits.py:233-237), which would shape-error for any real
ids_keep — video masking is never used there. We add pos before gather (the
functioning order, same as the image ViT).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import masking as mask_ops
from ..ops import pos_embed as pe
from .layers import Dtype, Mlp, SelfAttention, layer_norm


@dataclasses.dataclass(frozen=True)
class VideoViTConfig:
    input_size: tuple[int, int, int] = (16, 224, 224)     # (T, H, W)
    patch_size: tuple[int, int, int] = (2, 16, 16)
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = False
    attention_type: str = "joint_all"   # or 'divided_space_time'
    drop_path: float = 0.0
    attn_drop: float = 0.0
    drop: float = 0.0
    norm_eps: float = 1e-6
    remat: bool = False     # rematerialize blocks (video activations are large)

    @property
    def grid_size(self) -> tuple[int, int, int]:
        return tuple(s // p for s, p in zip(self.input_size, self.patch_size))

    @property
    def num_patches(self) -> int:
        t, h, w = self.grid_size
        return t * h * w


VIDEO_VIT_ARCHS = {
    "video_vit_small": dict(embed_dim=384, depth=12, num_heads=6),
    "video_vit_base": dict(embed_dim=768, depth=12, num_heads=12),
    "video_vit_large": dict(embed_dim=1024, depth=24, num_heads=16),
    "video_vit_huge": dict(embed_dim=1280, depth=32, num_heads=16),
    "timesformer_small": dict(embed_dim=384, depth=12, num_heads=6,
                              attention_type="divided_space_time"),
    "timesformer_base": dict(embed_dim=768, depth=12, num_heads=12,
                             attention_type="divided_space_time"),
    "timesformer_large": dict(embed_dim=1024, depth=24, num_heads=16,
                              attention_type="divided_space_time"),
    "timesformer_huge": dict(embed_dim=1280, depth=32, num_heads=16,
                             attention_type="divided_space_time"),
}


def video_vit_config(arch: str, input_size=(16, 224, 224), in_chans=3, **kw):
    spec = dict(VIDEO_VIT_ARCHS[arch])
    spec.update(kw)
    return VideoViTConfig(input_size=tuple(input_size), in_chans=in_chans, **spec)


class PatchEmbed3D(nn.Module):
    """Tube embedding: Conv3D over (B, T, H, W, C) → (B, t*h*w, D)
    (reference util/pos_embed.py:123-146, channel-last)."""

    patch_size: tuple[int, int, int]
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        b, t, h, w, d = x.shape
        return x.reshape(b, t * h * w, d)


class VideoBlock(nn.Module):
    """joint_all or divided_space_time transformer block (reference :18-95)."""

    num_heads: int
    mlp_ratio: float = 4.0
    attention_type: str = "joint_all"
    drop: float = 0.0
    attn_drop: float = 0.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, T: int = 1, deterministic: bool = True):
        d = x.shape[-1]
        b, l, _ = x.shape
        if self.attention_type == "joint_all":
            y = layer_norm(self.norm_eps, self.dtype, "norm1")(x)
            y = SelfAttention(self.num_heads, True, self.attn_drop, self.drop,
                              dtype=self.dtype, name="attn")(y, deterministic)
            x = x + y
        elif self.attention_type == "divided_space_time":
            s = l // T
            # temporal: attend across frames at the same spatial position
            xt = x.reshape(b, T, s, d).transpose(0, 2, 1, 3).reshape(b * s, T, d)
            rt = layer_norm(self.norm_eps, self.dtype, "temporal_norm1")(xt)
            rt = SelfAttention(self.num_heads, True, self.attn_drop, self.drop,
                               dtype=self.dtype, name="temporal_attn")(rt, deterministic)
            rt = rt.reshape(b, s, T, d).transpose(0, 2, 1, 3).reshape(b, l, d)
            rt = nn.Dense(d, dtype=self.dtype, name="temporal_fc")(rt)
            x = x + rt
            # spatial: attend within each frame
            xs = x.reshape(b * T, s, d)
            rs = layer_norm(self.norm_eps, self.dtype, "norm1")(xs)
            rs = SelfAttention(self.num_heads, True, self.attn_drop, self.drop,
                               dtype=self.dtype, name="attn")(rs, deterministic)
            x = x + rs.reshape(b, l, d)
        else:
            raise ValueError(self.attention_type)

        y = layer_norm(self.norm_eps, self.dtype, "norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
                name="mlp")(y, deterministic)
        return x + y


class VideoViT(nn.Module):
    """Video encoder trunk; input (B, T, H, W, C)."""

    cfg: VideoViTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed3D(c.patch_size, c.embed_dim,
                                        dtype=self.dtype, name="patch_embed")
        BlockCls = (nn.remat(VideoBlock, static_argnums=(2, 3))
                    if c.remat else VideoBlock)
        self.blocks = [
            BlockCls(c.num_heads, c.mlp_ratio, c.attention_type,
                     c.drop, c.attn_drop, c.norm_eps, dtype=self.dtype,
                     name=f"blocks_{i}")
            for i in range(c.depth)
        ]
        self.norm = layer_norm(c.norm_eps, self.dtype, "norm")

    @property
    def pos_embed_const(self) -> jnp.ndarray:
        return jnp.asarray(
            pe.sincos_3d(self.cfg.embed_dim, self.cfg.grid_size)[None], self.dtype
        )

    def prepare_patch_tokens(self, x, ids_keep: Optional[jnp.ndarray] = None):
        x = self.patch_embed(x.astype(self.dtype))
        x = x + self.pos_embed_const
        if ids_keep is not None:
            x = mask_ops.gather_tokens(x, ids_keep)
        return x

    def __call__(self, x, deterministic: bool = True):
        x = self.prepare_patch_tokens(x)
        T = self.cfg.grid_size[0]
        for blk in self.blocks:
            x = blk(x, T, deterministic)   # positional: remat static_argnums
        return self.norm(x)
