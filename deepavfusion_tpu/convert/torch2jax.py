"""PyTorch checkpoint → JAX parameter-pytree converter.

Handles the three checkpoint families the reference consumes/produces
(SURVEY.md §5.4):

  * released DeepAVFusion/AVMAE training checkpoints
    (``checkpoint_latest.pth`` with a ``state_dict`` dict whose keys are
    prefixed ``encoder.`` for the trunk; reference util/misc.py:222-309,
    models/deepavfusion.py:81-86);
  * MAE-IN1k ViT inits (``model`` dict; decoder/mask_token keys skipped,
    cls_token dropped when unused, pos_embed always regenerated — reference
    models/vits.py:64-80);
  * AudioMAE AS2M init (same layout).

Layout rules:
  torch Linear weight (out, in)            → flax Dense kernel (in, out): .T
  torch LayerNorm weight/bias              → flax scale/bias
  torch Conv2d weight (out, in, kh, kw)    → flax Conv kernel (kh, kw, in, out)
  torch Conv3d weight (out, in, kt, kh, kw)→ (kt, kh, kw, in, out)

Key accounting is strict in both directions (mirrors the reference's
``load_state_dict(strict=True)``): every source key must be consumed and every
destination leaf must be produced, or we raise.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

try:  # torch is only needed when actually reading .pth files
    import torch
except Exception:  # pragma: no cover
    torch = None


# --------------------------------------------------------------------------- #
# Low-level tensor layout converters
# --------------------------------------------------------------------------- #
def _np(t) -> np.ndarray:
    if torch is not None and isinstance(t, torch.Tensor):
        # .numpy() SHARES storage with the live torch tensor (and jnp.asarray
        # on CPU can keep that zero-copy alias) — an optimizer.step() on the
        # torch side would silently mutate the "converted" arrays. Copy.
        return t.detach().cpu().float().numpy().copy()
    return np.array(t, dtype=np.float32, copy=True)


def linear(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def layernorm(sd: Mapping, prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def conv2d(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def conv3d(sd: Mapping, prefix: str) -> dict:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


# --------------------------------------------------------------------------- #
# Module-level converters
# --------------------------------------------------------------------------- #
def block(sd: Mapping, p: str) -> dict:
    """timm Block → models/layers.Block param subtree."""
    return {
        "norm1": layernorm(sd, f"{p}.norm1"),
        "attn": {
            "qkv": linear(sd, f"{p}.attn.qkv"),
            "proj": linear(sd, f"{p}.attn.proj"),
        },
        "norm2": layernorm(sd, f"{p}.norm2"),
        "mlp": {
            "fc1": linear(sd, f"{p}.mlp.fc1"),
            "fc2": linear(sd, f"{p}.mlp.fc2"),
        },
    }


def cross_attention(sd: Mapping, p: str) -> dict:
    return {
        "q": linear(sd, f"{p}.q"),
        "kv": linear(sd, f"{p}.kv"),
        "proj": linear(sd, f"{p}.proj"),
    }


def fusion_block(sd: Mapping, p: str, arch: str) -> dict:
    """reference models/fusion_blocks.py FusionBlock_* → FusionBlock subtree."""
    if arch == "factorized_mmi":
        attn = {
            "attn_v": cross_attention(sd, f"{p}.attn.attn_v"),
            "attn_a": cross_attention(sd, f"{p}.attn.attn_a"),
            "q": linear(sd, f"{p}.attn.q"),
            "k": linear(sd, f"{p}.attn.k"),
            "v": linear(sd, f"{p}.attn.v"),
            "proj": linear(sd, f"{p}.attn.proj"),
        }
    else:  # token / dense_mmi share the q/kv/proj layout
        attn = {
            "q": linear(sd, f"{p}.attn.q"),
            "kv": linear(sd, f"{p}.attn.kv"),
            "proj": linear(sd, f"{p}.attn.proj"),
        }
    return {
        "norm1_mm": layernorm(sd, f"{p}.norm1_mm"),
        "norm1_aud": layernorm(sd, f"{p}.norm1_aud"),
        "norm1_img": layernorm(sd, f"{p}.norm1_img"),
        "attn": attn,
        "norm2": layernorm(sd, f"{p}.norm2"),
        "mlp": {
            "fc1": linear(sd, f"{p}.mlp.fc1"),
            "fc2": linear(sd, f"{p}.mlp.fc2"),
        },
    }


def vit(sd: Mapping, p: str = "", depth: int = 12, use_cls_token: bool = False) -> dict:
    """reference models/vits.py ViT → models/vit.ViT subtree.

    pos_embed source keys are ignored — the reference loader itself always
    overrides them with the model's own sincos table (models/vits.py:79), and
    our table is a compile-time constant.
    """
    pre = f"{p}." if p else ""
    tree: dict[str, Any] = {
        "patch_embed": {"proj": conv2d(sd, f"{pre}patch_embed.proj")},
        "norm": layernorm(sd, f"{pre}norm"),
    }
    for i in range(depth):
        tree[f"blocks_{i}"] = block(sd, f"{pre}blocks.{i}")
    if use_cls_token and f"{pre}cls_token" in sd:
        tree["cls_token"] = _np(sd[f"{pre}cls_token"])
    return tree


def deepavfusion(
    sd: Mapping,
    prefix: str = "",
    image_depth: int = 12,
    audio_depth: int = 12,
    fusion_arch: str = "factorized_mmi",
) -> dict:
    """reference models/deepavfusion.py DeepAVFusion → trunk subtree.

    ``prefix`` handles cross-job loading by key-prefix strip, e.g.
    'encoder.' for eval entry points (reference configs/linprobe.yaml:11,
    models/deepavfusion.py:81-86).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: dict[str, Any] = {
        "image": vit(sd, "image", image_depth),
        "audio": vit(sd, "audio", audio_depth),
        "fusion_tokens": _np(sd["fusion_tokens"]),
        "fusion_norm": layernorm(sd, "fusion_norm"),
    }
    max_depth = max(image_depth, audio_depth)
    for i in range(max_depth):
        if f"fusion_blocks.{i}.norm1_mm.weight" in sd:
            tree[f"fusion_blocks_{i}"] = fusion_block(sd, f"fusion_blocks.{i}", fusion_arch)
    return tree


def swin_block(sd: Mapping, p: str) -> dict:
    """reference models/swin.py SwinTransformerBlock → models/swin.SwinBlock
    subtree. The relative_position_index / attn_mask buffers are not
    converted — both are recomputed as compile-time constants on our side."""
    return {
        "norm1": layernorm(sd, f"{p}.norm1"),
        "attn_qkv": linear(sd, f"{p}.attn.qkv"),
        "attn_proj": linear(sd, f"{p}.attn.proj"),
        "relative_position_bias_table": _np(
            sd[f"{p}.attn.relative_position_bias_table"]
        ),
        "norm2": layernorm(sd, f"{p}.norm2"),
        "mlp": {
            "fc1": linear(sd, f"{p}.mlp.fc1"),
            "fc2": linear(sd, f"{p}.mlp.fc2"),
        },
    }


def mae_decoder(sd: Mapping, modality: str, depth: int = 8, arch: str = "plain") -> dict:
    """reference models/avmae.py per-modality decoder attrs → MAEDecoder
    subtree; ``arch`` mirrors {modality}_decoder_arch ('plain' | 'swin',
    reference avmae.py:37-56)."""
    p = f"{modality}_decoder"
    tree: dict[str, Any] = {
        "embed": linear(sd, f"{p}_embed"),
        "mask_token": _np(sd[f"{p}_mask_token"]),
        "pos_embed": _np(sd[f"{p}_pos_embed"]),
        "norm": layernorm(sd, f"{p}_norm"),
        "pred": linear(sd, f"{p}_pred"),
    }
    convert_block = swin_block if arch == "swin" else block
    for i in range(depth):
        tree[f"blocks_{i}"] = convert_block(sd, f"{p}_blocks.{i}")
    return tree


def avmae(
    sd: Mapping,
    image_depth: int = 12,
    audio_depth: int = 12,
    decoder_depth: int = 8,
    fusion_arch: str = "factorized_mmi",
    image_decoder_arch: str = "plain",
    audio_decoder_arch: str = "plain",
) -> dict:
    """Full pretraining checkpoint → AVMAE param tree."""
    return {
        "encoder": deepavfusion(sd, "encoder.", image_depth, audio_depth, fusion_arch),
        "image_decoder": mae_decoder(sd, "image", decoder_depth, image_decoder_arch),
        "audio_decoder": mae_decoder(sd, "audio", decoder_depth, audio_decoder_arch),
    }


# --------------------------------------------------------------------------- #
# Checkpoint IO + strict accounting
# --------------------------------------------------------------------------- #
def load_torch_state_dict(path: str) -> dict:
    """torch.load with the reference's wrapper handling
    (models/vits.py:66-74: 'state_dict' or 'model' envelope)."""
    if torch is None:
        raise RuntimeError("torch is required to read .pth checkpoints")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]
        elif "model" in ckpt:
            ckpt = ckpt["model"]
    return ckpt


SKIP_KEY_PATTERNS = (
    r"^decoder",          # MAE init decoder keys (models/vits.py:64 skip list)
    r"^mask_token",
    r"pos_embed$",        # always regenerated / loaded separately
    r"^cls_token$",       # dropped when the trunk runs without cls tokens
)


def vit_from_mae_init(sd: Mapping, depth: int = 12) -> dict:
    """MAE-IN1k / AudioMAE encoder init → ViT subtree, skipping decoder keys
    exactly like the reference loader (models/vits.py:74-79)."""
    kept = {
        k: v
        for k, v in sd.items()
        if not any(re.search(pat, k) for pat in SKIP_KEY_PATTERNS)
    }
    return vit(kept, "", depth)


def assert_tree_matches(converted: dict, reference_tree: dict, path: str = "") -> None:
    """Strict two-way structural check: same keys, same leaf shapes."""
    ck, rk = set(converted), set(reference_tree)
    if ck != rk:
        missing = rk - ck
        extra = ck - rk
        raise ValueError(f"at '{path}': missing={sorted(missing)} extra={sorted(extra)}")
    for k in ck:
        c, r = converted[k], reference_tree[k]
        if isinstance(r, dict):
            assert_tree_matches(c, r, f"{path}/{k}")
        else:
            # r is either an expected-shape tuple or an array to match against
            want = tuple(r) if isinstance(r, tuple) else tuple(np.shape(r))
            if tuple(np.shape(c)) != want:
                raise ValueError(
                    f"at '{path}/{k}': shape {np.shape(c)} != expected {want}"
                )


def inflate_patch_embed_2d_to_3d(kernel_2d: np.ndarray, t: int) -> np.ndarray:
    """Inflate a 2D patch-embed conv kernel (kh, kw, C, D) to a 3D tube kernel
    (t, kh, kw, C, D) by temporal replication — the reference's video-model
    adaptation of image checkpoints (models/video_vits.py:176-177,
    video_earlyfusion.py:90-91: unsqueeze(2).repeat over the tube length)."""
    return np.repeat(kernel_2d[None], t, axis=0)


def video_vit(sd: Mapping, p: str = "", depth: int = 12, tube: int = 2) -> dict:
    """Image-ViT or VideoViT state dict → VideoViT subtree, inflating the
    patch embed when the source is 2D. Divided-space-time extras
    (temporal_attn/temporal_fc/temporal_norm1) convert when present."""
    pre = f"{p}." if p else ""
    pk = f"{pre}patch_embed.proj.weight"
    w = _np(sd[pk])
    if w.ndim == 4:  # (D, C, kh, kw) → inflate to 3D tube
        k2 = w.transpose(2, 3, 1, 0)
        kernel = inflate_patch_embed_2d_to_3d(k2, tube)
    else:  # (D, C, kt, kh, kw)
        kernel = w.transpose(2, 3, 4, 1, 0)
    tree: dict[str, Any] = {
        "patch_embed": {"proj": {"kernel": kernel}},
        "norm": layernorm(sd, f"{pre}norm"),
    }
    if f"{pk[:-7]}.bias" in sd:
        tree["patch_embed"]["proj"]["bias"] = _np(sd[f"{pre}patch_embed.proj.bias"])
    for i in range(depth):
        bp = f"{pre}blocks.{i}"
        blk = block(sd, bp)
        if f"{bp}.temporal_attn.qkv.weight" in sd:
            blk["temporal_norm1"] = layernorm(sd, f"{bp}.temporal_norm1")
            blk["temporal_attn"] = {
                "qkv": linear(sd, f"{bp}.temporal_attn.qkv"),
                "proj": linear(sd, f"{bp}.temporal_attn.proj"),
            }
            blk["temporal_fc"] = linear(sd, f"{bp}.temporal_fc")
        tree[f"blocks_{i}"] = blk
    return tree


def av_classifier(
    sd: Mapping,
    image_depth: int = 12,
    audio_depth: int = 12,
    fusion_arch: str = "factorized_mmi",
    input_norm: bool = False,
) -> tuple[dict, dict | None]:
    """reference models/classifier.py AVClassifier → (params, batch_stats).

    The affine-free input BatchNorms (classifier.py:16-18) carry only running
    stats, which live in flax's batch_stats collection; returns None for it
    when input_norm is off."""
    params: dict[str, Any] = {
        "encoder": deepavfusion(sd, "encoder.", image_depth, audio_depth, fusion_arch),
        "image_head": linear(sd, "image_head"),
        "audio_head": linear(sd, "audio_head"),
        "fusion_head": linear(sd, "fusion_head"),
    }
    batch_stats = None
    if input_norm:
        batch_stats = {
            f"{m}_norm": {
                "mean": _np(sd[f"{m}_norm.running_mean"]),
                "var": _np(sd[f"{m}_norm.running_var"]),
            }
            for m in ("image", "audio", "fusion")
        }
    return params, batch_stats


def video_earlyfusion(
    sd: Mapping,
    prefix: str = "",
    video_depth: int = 12,
    audio_depth: int = 12,
    tube: int = 2,
) -> dict:
    """reference models/video_earlyfusion.py VideoEarlyFusion →
    VideoEarlyFusion subtree (video VideoViT + audio ViT + factorized fusion
    blocks; reference :29-56)."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: dict[str, Any] = {
        "video": video_vit(sd, "video", video_depth, tube),
        "audio": vit(sd, "audio", audio_depth),
        "fusion_tokens": _np(sd["fusion_tokens"]),
        "fusion_norm": layernorm(sd, "fusion_norm"),
    }
    for i in range(max(video_depth, audio_depth)):
        if f"fusion_blocks.{i}.norm1_mm.weight" in sd:
            tree[f"fusion_blocks_{i}"] = fusion_block(
                sd, f"fusion_blocks.{i}", "factorized_mmi")
    return tree


# --------------------------------------------------------------------------- #
# Unrolled ↔ scanned trunk layouts (DeepAVFusionConfig.scan_layers)
# --------------------------------------------------------------------------- #
def stack_trunk(unrolled: dict, depth: int) -> dict:
    """Unrolled trunk params (image/blocks_i, audio/blocks_i, fusion_blocks_i)
    → scan layout: blocks stacked along a leading layer axis under
    'layers/blk_{image,audio,fusion}'."""
    import jax

    def stacked(subtrees):
        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *subtrees)

    out: dict[str, Any] = {
        "image": {k: v for k, v in unrolled["image"].items()
                  if not k.startswith("blocks_")},
        "audio": {k: v for k, v in unrolled["audio"].items()
                  if not k.startswith("blocks_")},
        "fusion_tokens": unrolled["fusion_tokens"],
        "fusion_norm": unrolled["fusion_norm"],
        "layers": {
            "blk_image": stacked([unrolled["image"][f"blocks_{i}"]
                                  for i in range(depth)]),
            "blk_audio": stacked([unrolled["audio"][f"blocks_{i}"]
                                  for i in range(depth)]),
            "blk_fusion": stacked([unrolled[f"fusion_blocks_{i}"]
                                   for i in range(depth)]),
        },
    }
    return out


def unstack_trunk(scanned: dict, depth: int) -> dict:
    """Inverse of stack_trunk."""
    import jax

    def slice_layer(tree, d):
        return jax.tree.map(lambda x: np.asarray(x)[d], tree)

    out: dict[str, Any] = {
        "image": dict(scanned["image"]),
        "audio": dict(scanned["audio"]),
        "fusion_tokens": scanned["fusion_tokens"],
        "fusion_norm": scanned["fusion_norm"],
    }
    for i in range(depth):
        out["image"][f"blocks_{i}"] = slice_layer(scanned["layers"]["blk_image"], i)
        out["audio"][f"blocks_{i}"] = slice_layer(scanned["layers"]["blk_audio"], i)
        out[f"fusion_blocks_{i}"] = slice_layer(scanned["layers"]["blk_fusion"], i)
    return out


def stack_video_trunk(unrolled: dict, depth: int) -> dict:
    """VideoEarlyFusion unrolled params (video/blocks_i, audio/blocks_i,
    fusion_blocks_i) → scan layout under 'layers/blk_{video,audio,fusion}'
    (models/video_earlyfusion.py scan_layers)."""
    import jax

    def stacked(subtrees):
        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *subtrees)

    return {
        "video": {k: v for k, v in unrolled["video"].items()
                  if not k.startswith("blocks_")},
        "audio": {k: v for k, v in unrolled["audio"].items()
                  if not k.startswith("blocks_")},
        "fusion_tokens": unrolled["fusion_tokens"],
        "fusion_norm": unrolled["fusion_norm"],
        "layers": {
            "blk_video": stacked([unrolled["video"][f"blocks_{i}"]
                                  for i in range(depth)]),
            "blk_audio": stacked([unrolled["audio"][f"blocks_{i}"]
                                  for i in range(depth)]),
            "blk_fusion": stacked([unrolled[f"fusion_blocks_{i}"]
                                   for i in range(depth)]),
        },
    }


def unstack_video_trunk(scanned: dict, depth: int) -> dict:
    """Inverse of stack_video_trunk."""
    import jax

    def slice_layer(tree, d):
        return jax.tree.map(lambda x: np.asarray(x)[d], tree)

    out: dict[str, Any] = {
        "video": dict(scanned["video"]),
        "audio": dict(scanned["audio"]),
        "fusion_tokens": scanned["fusion_tokens"],
        "fusion_norm": scanned["fusion_norm"],
    }
    for i in range(depth):
        out["video"][f"blocks_{i}"] = slice_layer(scanned["layers"]["blk_video"], i)
        out["audio"][f"blocks_{i}"] = slice_layer(scanned["layers"]["blk_audio"], i)
        out[f"fusion_blocks_{i}"] = slice_layer(scanned["layers"]["blk_fusion"], i)
    return out
