"""Video-audio early fusion trunk for AV-sync (reference models/video_earlyfusion.py).

Same interleave pattern as DeepAVFusion but with a VideoViT visual branch and
factorized fusion blocks; ctors video_efav_{small,base,large,huge} set the
fusion-token budgets (8,4,4) → (64,16,16) (reference :135-172). The released
surface of the avsync task: configs/avsync.yaml names worker eval_avsync but
no such entry point exists in the reference snapshot (SURVEY.md §2.1 #17) —
we provide the models plus an eval_avsync entry built on them.
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp
from flax import linen as nn

from .fusion_blocks import FUSION_NORM_EPS, FusionBlock
from .layers import Dtype, layer_norm
from .video_vit import VideoViT, VideoViTConfig, video_vit_config
from .vit import ViT, ViTConfig, vit_config
from .deepavfusion import parse_fusion_layers


@dataclasses.dataclass(frozen=True)
class VideoEarlyFusionConfig:
    video: VideoViTConfig = dataclasses.field(
        default_factory=lambda: video_vit_config("video_vit_base", (16, 224, 224), 3)
    )
    audio: ViTConfig = dataclasses.field(
        default_factory=lambda: vit_config("vit_base", (128, 192), 1)
    )
    fusion_layers: str | int = "all"
    num_fusion_tkns: tuple[int, int, int] = (16, 8, 8)
    fusion_mlp_ratio: float = 1.0
    fusion_attn_ratio: float = 0.25
    fusion_num_heads: int = 12
    drop_path: float = 0.0
    attn_drop: float = 0.0
    drop: float = 0.0
    remat: bool = False     # rematerialize video/audio/fusion blocks
    # Compile the per-layer trio ONCE and lax.scan over stacked layer params.
    # The scan layout shrinks the 24-block video program ~12x — minutes off
    # cold compiles through remote XLA compile services (NOTES.md r3). Same
    # contract as DeepAVFusionConfig.scan_layers — checkpoints translate
    # between layouts via convert.torch2jax.{stack,unstack}_video_trunk.
    scan_layers: bool = False

    @property
    def embed_dim(self) -> int:
        return self.video.embed_dim

    @property
    def max_depth(self) -> int:
        return max(self.video.depth, self.audio.depth)


# reference ctor table (video_earlyfusion.py:135-172)
VIDEO_EFAV_ARCHS = {
    "video_efav_small": dict(video="video_vit_small", audio="vit_small",
                             tkns=(8, 4, 4), heads=6),
    "video_efav_base": dict(video="video_vit_base", audio="vit_base",
                            tkns=(16, 8, 8), heads=12),
    "video_efav_large": dict(video="video_vit_large", audio="vit_large",
                             tkns=(32, 12, 12), heads=16),
    "video_efav_huge": dict(video="video_vit_huge", audio="vit_huge",
                            tkns=(64, 16, 16), heads=16),
}


def video_efav_config(arch: str, video_size=(16, 224, 224),
                      audio_size=(128, 192), **kw) -> VideoEarlyFusionConfig:
    spec = VIDEO_EFAV_ARCHS[arch]
    return VideoEarlyFusionConfig(
        video=video_vit_config(spec["video"], video_size, 3),
        audio=vit_config(spec["audio"], audio_size, 1),
        num_fusion_tkns=spec["tkns"],
        fusion_num_heads=spec["heads"],
        **kw,
    )


class VideoTrunkLayer(nn.Module):
    """One video-audio interleave step (video block + audio block + factorized
    fusion block) in the reference's exact dataflow — the scanned body when
    cfg.scan_layers. Mirrors deepavfusion.TrunkLayer; the video block is
    called with T=1, the reference's default inside the fusion interleave
    (reference video_earlyfusion.py:112,115 — joint_all ignores T)."""

    cfg: VideoEarlyFusionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, deterministic: bool = True):
        from .layers import Block
        from .video_vit import VideoBlock

        c = self.cfg
        x_fusion, x_video, x_audio = carry
        nF = sum(c.num_fusion_tkns)
        blk_video = VideoBlock(
            c.video.num_heads, c.video.mlp_ratio, c.video.attention_type,
            c.drop, c.attn_drop, c.video.norm_eps, dtype=self.dtype,
            name="blk_video",
        )
        blk_audio = Block(
            c.audio.num_heads, c.audio.mlp_ratio, qkv_bias=True,
            drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
            norm_eps=c.audio.norm_eps, dtype=self.dtype, name="blk_audio",
        )
        blk_fusion = FusionBlock(
            arch="factorized_mmi", num_heads=c.fusion_num_heads,
            attn_ratio=c.fusion_attn_ratio, mlp_ratio=c.fusion_mlp_ratio,
            fusion_tkns=c.num_fusion_tkns, qkv_bias=True,
            drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
            dtype=self.dtype, name="blk_fusion",
        )
        _x_video = blk_video(
            jnp.concatenate([x_fusion, x_video], axis=1), 1, deterministic
        )[:, nF:]
        _x_audio = blk_audio(
            jnp.concatenate([x_fusion, x_audio], axis=1), deterministic
        )[:, nF:]
        x_fusion = blk_fusion(x_fusion, x_video, x_audio, deterministic)
        carry = (x_fusion, _x_video, _x_audio)
        return carry, carry  # ys = per-layer states (return_embs)


class VideoEarlyFusion(nn.Module):
    cfg: VideoEarlyFusionConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        import dataclasses as _dc

        c = self.cfg
        layers = parse_fusion_layers(c.fusion_layers, c.max_depth)
        self.use_scan = bool(
            c.scan_layers
            and c.video.depth == c.audio.depth
            and layers == set(range(c.max_depth))
        )
        if self.use_scan:
            video_cfg = _dc.replace(c.video, depth=0)
            audio_cfg = _dc.replace(c.audio, depth=0)
        else:
            video_cfg = _dc.replace(c.video, remat=c.video.remat or c.remat)
            audio_cfg = _dc.replace(c.audio, remat=c.audio.remat or c.remat)
        self.video = VideoViT(video_cfg, dtype=self.dtype, name="video")
        self.audio = ViT(audio_cfg, dtype=self.dtype, name="audio")
        self.fusion_tokens = self.param(
            "fusion_tokens", nn.initializers.normal(0.02),
            (1, sum(c.num_fusion_tkns), c.embed_dim),
        )
        if self.use_scan:
            body = (nn.remat(VideoTrunkLayer, static_argnums=(2,))
                    if c.remat else VideoTrunkLayer)
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
            FB = (nn.remat(FusionBlock, static_argnums=(4,))
                  if c.remat else FusionBlock)
            self.fusion_blocks = [
                FB(
                    arch="factorized_mmi", num_heads=c.fusion_num_heads,
                    attn_ratio=c.fusion_attn_ratio, mlp_ratio=c.fusion_mlp_ratio,
                    fusion_tkns=c.num_fusion_tkns, qkv_bias=True,
                    drop=c.drop, attn_drop=c.attn_drop, drop_path=c.drop_path,
                    dtype=self.dtype, name=f"fusion_blocks_{i}",
                )
                if i in layers else None
                for i in range(c.max_depth)
            ]
        self.fusion_norm = layer_norm(FUSION_NORM_EPS, self.dtype, "fusion_norm")

    def __call__(self, video, audio, video_ids_keep=None, audio_ids_keep=None,
                 return_embs: bool = False, deterministic: bool = True):
        B = video.shape[0]
        x_video = self.video.prepare_patch_tokens(video, video_ids_keep)
        x_audio = self.audio.prepare_patch_tokens(audio, audio_ids_keep)

        nF = sum(self.cfg.num_fusion_tkns)
        # reference calls video blocks with default T=1 inside the fusion
        # interleave (video_earlyfusion.py:112,115) — joint_all ignores T.
        T = 1
        x_fusion = jnp.broadcast_to(
            self.fusion_tokens.astype(x_video.dtype), (B, nF, self.cfg.embed_dim)
        )
        if self.use_scan:
            (x_fusion, x_video, x_audio), ys = self.layers(
                (x_fusion, x_video, x_audio), deterministic
            )
            x_video_out = self.video.norm(x_video)
            x_audio_out = self.audio.norm(x_audio)
            x_fusion_out = self.fusion_norm(x_fusion)
            if return_embs:
                yf, yv, ya = ys
                embs = tuple(
                    (yv[d], ya[d], yf[d]) for d in range(self.cfg.max_depth)
                )
                return x_video_out, x_audio_out, x_fusion_out, embs
            return x_video_out, x_audio_out, x_fusion_out

        embs = []
        for i in range(self.cfg.max_depth):
            blk_video = self.video.blocks[i]
            blk_audio = self.audio.blocks[i]
            blk_fusion = self.fusion_blocks[i]
            if blk_fusion is None:
                x_video = blk_video(x_video, T, deterministic)
                x_audio = blk_audio(x_audio, deterministic)
            else:
                _x_video = blk_video(
                    jnp.concatenate([x_fusion, x_video], axis=1),
                    T, deterministic,
                )[:, nF:]
                _x_audio = blk_audio(
                    jnp.concatenate([x_fusion, x_audio], axis=1),
                    deterministic,
                )[:, nF:]
                x_fusion = blk_fusion(x_fusion, x_video, x_audio,
                                      deterministic)
                x_video, x_audio = _x_video, _x_audio
            if return_embs:
                embs.append((x_video, x_audio, x_fusion))

        x_video = self.video.norm(x_video)
        x_audio = self.audio.norm(x_audio)
        x_fusion = self.fusion_norm(x_fusion)
        if return_embs:
            return x_video, x_audio, x_fusion, tuple(embs)
        return x_video, x_audio, x_fusion
