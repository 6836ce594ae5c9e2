"""DeepAVFusion encoder trunk: dual ViTs joined per-layer by fusion blocks.

Functional parity with reference models/deepavfusion.py. The per-layer
interleave (reference :99-107) reproduces two load-bearing quirks:

  * fusion tokens join each modality's self-attention as *context* — they are
    prepended to the token sequence for blk_image/blk_audio — but their
    updated values from those blocks are DISCARDED (the ``_`` split at
    :104-105);
  * the fusion track updates from the PRE-block modality states (:106), not
    the just-computed ones.

TPU-first notes: one jittable pure function over the parameter pytree;
``fusion_layers`` resolves to a static python set at construction so the
layer loop unrolls with no dynamic control flow; per-layer embeddings
(return_embs) are plain tuples the downstream heads index statically.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .fusion_blocks import FUSION_NORM_EPS, FusionBlock
from .layers import Block, Dtype, layer_norm
from .vit import ViT, ViTConfig, vit_config


def parse_fusion_layers(spec, max_depth: int) -> frozenset[int]:
    """'all' | 'none' | int | 'i-j-k' → set of layer indices
    (reference: models/deepavfusion.py:38-46)."""
    if spec == "all":
        return frozenset(range(max_depth))
    if spec == "none" or spec is None:
        return frozenset()
    if isinstance(spec, int):
        return frozenset({spec})
    return frozenset(int(l) for l in str(spec).split("-"))


@dataclasses.dataclass(frozen=True)
class DeepAVFusionConfig:
    image: ViTConfig = dataclasses.field(
        default_factory=lambda: vit_config("vit_base", (224, 224), 3)
    )
    audio: ViTConfig = dataclasses.field(
        default_factory=lambda: vit_config("vit_base", (128, 192), 1)
    )
    fusion_arch: str = "factorized_mmi"
    fusion_layers: str | int = "all"
    num_fusion_tkns: tuple[int, int, int] = (16, 8, 8)
    fusion_mlp_ratio: float = 4.0
    fusion_attn_ratio: float = 0.25
    fusion_num_heads: int = 12
    drop_path: float = 0.0
    attn_drop: float = 0.0
    drop: float = 0.0
    # Compile the per-layer trio ONCE and lax.scan over stacked layer params
    # instead of unrolling max_depth copies — cuts XLA program size (and the
    # remote-compile latency that dominates on tunneled TPUs) ~depth-fold.
    # Requires uniform layers: fusion at every layer, equal encoder depths.
    # Param layout changes (blocks live stacked under 'layers'); use
    # convert.torch2jax.stack_trunk / unstack_trunk to translate.
    scan_layers: bool = False
    # Rematerialize blocks in the backward pass: the step is HBM-traffic-bound
    # (measured ~15 GB of XLA temps for the B=64 ViT-B MAE step), so trading
    # saved activations for recompute targets the actual bottleneck. With
    # scan_layers it wraps the scanned trio; unrolled it wraps the ViT blocks
    # and fusion blocks.
    remat: bool = False

    @property
    def embed_dim(self) -> int:
        return self.image.embed_dim

    @property
    def total_fusion_tokens(self) -> int:
        return sum(self.num_fusion_tkns)

    @property
    def max_depth(self) -> int:
        return max(self.image.depth, self.audio.depth)

    @property
    def fusion_layer_set(self) -> frozenset[int]:
        return parse_fusion_layers(self.fusion_layers, self.max_depth)


def config_from_args(
    image_arch="vit_base", image_size=(224, 224),
    audio_arch="vit_base", audio_size=(128, 192),
    fusion_arch="factorized_mmi", fusion_layers="all",
    num_fusion_tkns=(16, 8, 8), fusion_mlp_ratio=4.0, fusion_attn_ratio=0.25,
    fusion_num_heads=12, drop_path=0.0, attn_drop=0.0, drop=0.0,
) -> DeepAVFusionConfig:
    """Constructor-argument surface mirroring reference DeepAVFusion.__init__
    (models/deepavfusion.py:7-15)."""
    return DeepAVFusionConfig(
        image=vit_config(image_arch, image_size, 3, drop_path=drop_path,
                         attn_drop=attn_drop, drop=drop),
        audio=vit_config(audio_arch, audio_size, 1, drop_path=drop_path,
                         attn_drop=attn_drop, drop=drop),
        fusion_arch=fusion_arch,
        fusion_layers=fusion_layers,
        num_fusion_tkns=tuple(num_fusion_tkns),
        fusion_mlp_ratio=fusion_mlp_ratio,
        fusion_attn_ratio=fusion_attn_ratio,
        fusion_num_heads=fusion_num_heads,
        drop_path=drop_path,
        attn_drop=attn_drop,
        drop=drop,
    )


class TrunkLayer(nn.Module):
    """One interleave step: image block + audio block + fusion block, in the
    reference's exact dataflow (discarded fusion context, pre-block fusion
    update). Used as the scanned body when cfg.scan_layers."""

    cfg: DeepAVFusionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, deterministic: bool = True):
        c = self.cfg
        x_fusion, x_image, x_audio = carry
        nF = c.total_fusion_tokens
        blk_image = Block(
            c.image.num_heads, c.image.mlp_ratio, qkv_bias=True,
            drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
            norm_eps=c.image.norm_eps, dtype=self.dtype, name="blk_image",
        )
        blk_audio = Block(
            c.audio.num_heads, c.audio.mlp_ratio, qkv_bias=True,
            drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
            norm_eps=c.audio.norm_eps, dtype=self.dtype, name="blk_audio",
        )
        blk_fusion = FusionBlock(
            arch=c.fusion_arch, num_heads=c.fusion_num_heads,
            attn_ratio=c.fusion_attn_ratio, mlp_ratio=c.fusion_mlp_ratio,
            fusion_tkns=c.num_fusion_tkns, qkv_bias=True,
            drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
            dtype=self.dtype, name="blk_fusion",
            # scan bodies must not route the fused megakernel: the scan
            # transpose's stacked-dW accumulation blows scoped VMEM inside
            # the cond branch (see FusionBlock.allow_fused)
            allow_fused=False,
        )
        _x_image = blk_image(
            jnp.concatenate([x_fusion, x_image], axis=1), deterministic
        )[:, nF:]
        _x_audio = blk_audio(
            jnp.concatenate([x_fusion, x_audio], axis=1), deterministic
        )[:, nF:]
        x_fusion = blk_fusion(x_fusion, x_image, x_audio,
                              deterministic=deterministic)
        carry = (x_fusion, _x_image, _x_audio)
        return carry, carry  # ys = per-layer states (return_embs)


class DeepAVFusion(nn.Module):
    """The audio-visual trunk. __call__(image, audio[, ids_keep...]) →
    (x_image, x_audio, x_fusion[, embs])."""

    cfg: DeepAVFusionConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.use_scan = bool(
            c.scan_layers
            and c.image.depth == c.audio.depth
            and c.fusion_layer_set == frozenset(range(c.max_depth))
        )
        import dataclasses as _dc

        if self.use_scan:
            vit_image_cfg = _dc.replace(c.image, depth=0)
            vit_audio_cfg = _dc.replace(c.audio, depth=0)
        else:
            # cfg.remat covers the unrolled blocks too (ViT remat + fusion)
            vit_image_cfg = _dc.replace(c.image, remat=c.image.remat or c.remat)
            vit_audio_cfg = _dc.replace(c.audio, remat=c.audio.remat or c.remat)
        self.image = ViT(vit_image_cfg, dtype=self.dtype, name="image")
        self.audio = ViT(vit_audio_cfg, dtype=self.dtype, name="audio")
        self.fusion_tokens = self.param(
            "fusion_tokens",
            nn.initializers.normal(0.02),
            (1, c.total_fusion_tokens, c.embed_dim),
        )
        if self.use_scan:
            body = (nn.remat(TrunkLayer, static_argnums=(2,))
                    if c.remat else TrunkLayer)
            ScanLayer = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=c.max_depth,
                in_axes=(nn.broadcast,),
            )
            self.layers = ScanLayer(c, dtype=self.dtype, name="layers")
            self.fusion_blocks = []
        else:
            layers = c.fusion_layer_set
            FB = (nn.remat(FusionBlock, static_argnums=(4,))
                  if c.remat else FusionBlock)
            self.fusion_blocks = [
                FB(
                    arch=c.fusion_arch,
                    num_heads=c.fusion_num_heads,
                    attn_ratio=c.fusion_attn_ratio,
                    mlp_ratio=c.fusion_mlp_ratio,
                    fusion_tkns=c.num_fusion_tkns,
                    qkv_bias=True,
                    drop=c.drop,
                    attn_drop=c.attn_drop,
                    drop_path=c.drop_path,
                    dtype=self.dtype,
                    name=f"fusion_blocks_{i}",
                )
                if i in layers
                else None
                for i in range(c.max_depth)
            ]
        self.fusion_norm = layer_norm(FUSION_NORM_EPS, self.dtype, "fusion_norm")

    def __call__(
        self,
        image: jnp.ndarray,
        audio: jnp.ndarray,
        image_ids_keep: Optional[jnp.ndarray] = None,
        audio_ids_keep: Optional[jnp.ndarray] = None,
        return_embs: bool = False,
        deterministic: bool = True,
    ):
        B = image.shape[0]
        x_image = self.image.prepare_patch_tokens(image, image_ids_keep)
        x_audio = self.audio.prepare_patch_tokens(audio, audio_ids_keep)

        nF = self.cfg.total_fusion_tokens
        nI, nA = x_image.shape[1], x_audio.shape[1]
        x_fusion = jnp.broadcast_to(
            self.fusion_tokens.astype(x_image.dtype), (B, nF, self.cfg.embed_dim)
        )

        if self.use_scan:
            (x_fusion, x_image, x_audio), ys = self.layers(
                (x_fusion, x_image, x_audio), deterministic
            )
            x_image_out = self.image.norm(x_image)
            x_audio_out = self.audio.norm(x_audio)
            x_fusion_out = self.fusion_norm(x_fusion)
            if return_embs:
                yf, yi, ya = ys
                embs = tuple(
                    (yi[d], ya[d], yf[d]) for d in range(self.cfg.max_depth)
                )
                return x_image_out, x_audio_out, x_fusion_out, embs
            return x_image_out, x_audio_out, x_fusion_out

        embs = []
        for i in range(self.cfg.max_depth):
            blk_image = self.image.blocks[i] if i < len(self.image.blocks) else None
            blk_audio = self.audio.blocks[i] if i < len(self.audio.blocks) else None
            blk_fusion = self.fusion_blocks[i]
            if blk_fusion is None:
                if blk_image is not None:
                    x_image = blk_image(x_image, deterministic)
                if blk_audio is not None:
                    x_audio = blk_audio(x_audio, deterministic)
            else:
                # fusion tokens as discarded self-attention context (quirk)
                _x_image = blk_image(
                    jnp.concatenate([x_fusion, x_image], axis=1), deterministic
                )[:, nF:]
                _x_audio = blk_audio(
                    jnp.concatenate([x_fusion, x_audio], axis=1), deterministic
                )[:, nF:]
                # fusion track updates from PRE-block modality states (quirk)
                # (deterministic positional: nn.remat static_argnums)
                x_fusion = blk_fusion(x_fusion, x_image, x_audio, deterministic)
                x_image, x_audio = _x_image, _x_audio
            if return_embs:
                embs.append((x_image, x_audio, x_fusion))

        x_image = self.image.norm(x_image)
        x_audio = self.audio.norm(x_audio)
        x_fusion = self.fusion_norm(x_fusion)

        if return_embs:
            return x_image, x_audio, x_fusion, tuple(embs)
        return x_image, x_audio, x_fusion
