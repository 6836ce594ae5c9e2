"""ViT backbone for both modalities (functional parity with reference models/vits.py).

Differences from the reference that are deliberate TPU-first choices:
  * channel-last inputs (B, H, W, C) — XLA's native conv layout;
  * the frozen sin-cos pos_embed (reference: models/vits.py:29,
    ``requires_grad=False``, and overwritten on every checkpoint load at
    :79) is a compile-time constant, not a parameter;
  * blocks run under the caller's dtype policy (bf16 activations on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import masking as mask_ops
from ..ops import pos_embed as pe
from .layers import Block, Dtype, PatchEmbed, layer_norm


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    input_size: tuple[int, int] = (224, 224)
    patch_size: tuple[int, int] = (16, 16)
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    use_cls_token: bool = False
    drop_path: float = 0.0
    attn_drop: float = 0.0
    drop: float = 0.0
    norm_eps: float = 1e-6  # reference vit ctors: partial(nn.LayerNorm, eps=1e-6)
    remat: bool = False     # rematerialize blocks (trade FLOPs for HBM)

    @property
    def grid_size(self) -> tuple[int, int]:
        return (
            self.input_size[0] // self.patch_size[0],
            self.input_size[1] // self.patch_size[1],
        )

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid_size
        return gh * gw


# Reference ctor table (models/vits.py:121-176)
VIT_ARCHS = {
    "vit_small": dict(embed_dim=384, depth=12, num_heads=6, patch_size=(16, 16)),
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12, patch_size=(16, 16)),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16, patch_size=(16, 16)),
    "vit_huge": dict(embed_dim=1280, depth=32, num_heads=16, patch_size=(14, 14)),
}


def vit_config(arch: str, input_size, in_chans: int, **kw) -> ViTConfig:
    spec = dict(VIT_ARCHS[arch])
    spec.update(kw)
    if isinstance(input_size, int):
        input_size = (input_size, input_size)
    return ViTConfig(input_size=tuple(input_size), in_chans=in_chans, **spec)


class ViT(nn.Module):
    """Vision Transformer trunk; exposes the same three call paths as the
    reference: prepare_patch_tokens, per-block application, final norm."""

    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.patch_size, c.embed_dim, dtype=self.dtype, name="patch_embed")
        if c.use_cls_token:
            self.cls_token = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, c.embed_dim)
            )
        BlockCls = (
            nn.remat(Block, static_argnums=(2,)) if c.remat else Block
        )
        self.blocks = [
            BlockCls(
                c.num_heads, c.mlp_ratio, qkv_bias=True,
                drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
                norm_eps=c.norm_eps, dtype=self.dtype, name=f"blocks_{i}",
            )
            for i in range(c.depth)
        ]
        self.norm = layer_norm(c.norm_eps, self.dtype, "norm")

    @property
    def pos_embed_const(self) -> jnp.ndarray:
        """Frozen sin-cos table (reference: models/vits.py:39-41)."""
        return jnp.asarray(
            pe.sincos_2d(self.cfg.embed_dim, self.cfg.grid_size)[None], self.dtype
        )

    def prepare_patch_tokens(
        self, x: jnp.ndarray, ids_keep: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """patch embed + pos embed + optional mask-gather + optional cls
        (reference: models/vits.py:91-107)."""
        x = self.patch_embed(x.astype(self.dtype))
        x = x + self.pos_embed_const
        if ids_keep is not None:
            x = mask_ops.gather_tokens(x, ids_keep)
        if self.cfg.use_cls_token:
            cls = jnp.broadcast_to(
                self.cls_token.astype(x.dtype), (x.shape[0], 1, x.shape[-1])
            )
            x = jnp.concatenate([cls, x], axis=1)
        return x

    def __call__(
        self,
        x: jnp.ndarray,
        ids_keep: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.prepare_patch_tokens(x, ids_keep)
        for blk in self.blocks:
            x = blk(x, deterministic)
        return self.norm(x)
