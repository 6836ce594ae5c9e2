"""Pretraining task assembly: model + optimizer + jitted step from a config.

The programmatic core of the ``train.py`` entry point (reference train.py:20-137),
shared by the CLI, __graft_entry__ and bench.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..models import avmae as avmae_mod
from ..models import deepavfusion as trunk_mod
from ..models.vit import vit_config
from ..ops import image as image_ops
from . import lr_sched, trainer
from .. import runtime


@dataclasses.dataclass
class PretrainConfig:
    image_backbone: str = "vit_base"
    audio_backbone: str = "vit_base"
    image_depth: Optional[int] = None      # test-only depth override
    audio_depth: Optional[int] = None
    scan_layers: bool = False              # lax.scan over layer trios
    remat: bool = False                    # rematerialize scanned layer trios
    # Rematerialize ONLY the MAE decoder blocks (trunk untouched). The r5
    # roofline (bench_decoder_attr.py) measured the decoder block fwd+bwd
    # AT the HBM roofline — 3.18 GB of stored intermediates per layer step
    # moving at 831 GB/s — so trading those bytes for recompute FLOPs is
    # the one lever left; A/B via DAVF_BENCH_DEC_REMAT (bench.py).
    decoder_remat: bool = False
    image_size: int = 224
    audio_mels: int = 128
    audio_frames: int = 192          # int(audio_dur * 64), train.py:65
    fusion_arch: str = "factorized_mmi"
    fusion_layers: str = "all"
    num_fusion_tkns: tuple = (16, 8, 8)
    fusion_mlp_ratio: float = 4.0
    fusion_attn_ratio: float = 0.25
    fusion_num_heads: int = 12
    image_decoder_arch: str = "plain"
    image_decoder_depth: int = 8
    image_mask_ratio: float = 0.75
    image_norm_loss: bool = True
    audio_decoder_arch: str = "plain"
    audio_decoder_depth: int = 8
    audio_mask_ratio: float = 0.8
    audio_norm_loss: bool = True
    # optimizer (configs/deepavfusion.yaml:46-60)
    epochs: float = 300.0
    warmup_epochs: float = 50.0
    batch_size: int = 128
    accum_iter: int = 1
    weight_decay: float = 0.05
    blr: float = 1.5e-4
    lr: Optional[float] = None
    min_lr: float = 0.0
    clip_grad: Optional[float] = None
    pt_lr_mult_start: Optional[float] = 0.0
    pt_lr_mult_end: float = 1.0
    pt_warmup_epochs: Any = "epochs/2"
    image_pretrained: bool = True
    audio_pretrained: bool = True
    steps_per_epoch: float = 1000.0
    decoder_num_heads: int = 16      # reference avmae.py decoder heads
    # AdamW first-moment storage. bf16 halves the m read+write of the
    # HBM-bound update tail — measured on the v5e (B=64 full step):
    # 114.97 -> 113.34 ms/step (NOTES.md r5). Production DEFAULT since r5;
    # it does NOT affect checkpoint compatibility with the reference (the
    # optimizer state is this framework's own), only bit-level trajectory
    # reproduction of torch AdamW — set "float32" for that (what the
    # parity suites pin: tests/test_train_{step,trajectory}_parity.py).
    adam_mu_dtype: Any = "bfloat16"
    dtype: Any = jnp.bfloat16


def _mu_dtype(v):
    """Normalize the adam_mu_dtype config field (dtype | name | None).

    "float32"/None mean optax's native f32 moments (bit-parity with torch
    AdamW); any other name is resolved through jnp.dtype."""
    if v is None or v == "float32" or v == "f32":
        return None
    if isinstance(v, str):
        return jnp.dtype(v)
    return v


def build_model(cfg: PretrainConfig) -> avmae_mod.AVMAE:
    extra_i = {"depth": cfg.image_depth} if cfg.image_depth else {}
    extra_a = {"depth": cfg.audio_depth} if cfg.audio_depth else {}
    enc = trunk_mod.DeepAVFusionConfig(
        image=vit_config(cfg.image_backbone, (cfg.image_size, cfg.image_size), 3, **extra_i),
        audio=vit_config(cfg.audio_backbone, (cfg.audio_mels, cfg.audio_frames), 1, **extra_a),
        fusion_arch=cfg.fusion_arch,
        fusion_layers=cfg.fusion_layers,
        num_fusion_tkns=tuple(cfg.num_fusion_tkns),
        fusion_mlp_ratio=cfg.fusion_mlp_ratio,
        fusion_attn_ratio=cfg.fusion_attn_ratio,
        fusion_num_heads=cfg.fusion_num_heads,
        scan_layers=cfg.scan_layers,
        remat=cfg.remat,
    )
    mae = avmae_mod.AVMAEConfig(
        encoder=enc,
        remat=cfg.remat or cfg.decoder_remat,
        image_decoder=avmae_mod.MAEDecoderConfig(
            cfg.image_decoder_arch, cfg.image_decoder_depth,
            cfg.image_mask_ratio, cfg.image_norm_loss,
        ),
        audio_decoder=avmae_mod.MAEDecoderConfig(
            cfg.audio_decoder_arch, cfg.audio_decoder_depth,
            cfg.audio_mask_ratio, cfg.audio_norm_loss,
        ),
        decoder_num_heads=cfg.decoder_num_heads,
    )
    return avmae_mod.AVMAE(mae, dtype=cfg.dtype)


def effective_lr(cfg: PretrainConfig, world_batch: int) -> float:
    """lr = blr * eff_batch / 256 (reference train.py:32-34)."""
    if cfg.lr is not None:
        return cfg.lr
    return cfg.blr * world_batch * cfg.accum_iter / 256.0


def init_params(model, cfg: PretrainConfig, seed: int = 0):
    """Initialize on the host CPU (fast; avoids op-by-op TPU dispatch)."""
    with jax.default_device(runtime.host_cpu_device()):
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        aud = jnp.zeros((1, cfg.audio_mels, cfg.audio_frames, 1))
        return model.init(jax.random.key(seed), img, aud, jax.random.key(1))["params"]


def make_pretrain_step(model, params, cfg: PretrainConfig, world_batch: int,
                       mesh=None, watch_gradients: bool = False):
    """(tx, state, step_fn): the jitted MAE train step."""
    opt_cfg = lr_sched.OptimizerConfig(
        lr=effective_lr(cfg, world_batch),
        min_lr=cfg.min_lr,
        warmup_epochs=cfg.warmup_epochs,
        epochs=cfg.epochs,
        steps_per_epoch=cfg.steps_per_epoch,
        weight_decay=cfg.weight_decay,
        clip_grad=cfg.clip_grad,
        pt_lr_mult_start=cfg.pt_lr_mult_start if (cfg.image_pretrained or cfg.audio_pretrained) else None,
        pt_lr_mult_end=cfg.pt_lr_mult_end,
        pt_warmup_epochs=lr_sched.eval_epochs_expr(cfg.pt_warmup_epochs, cfg.epochs),
        image_pt=cfg.image_pretrained,
        audio_pt=cfg.audio_pretrained,
        mu_dtype=_mu_dtype(cfg.adam_mu_dtype),
    )
    tx, lr_fn = lr_sched.make_adamw(params, opt_cfg)

    def loss_fn(p, batch, key):
        drop_key, mask_key = jax.random.split(key)
        # uint8-H2D lever: a uint8 image batch is normalized in-graph
        # (4x fewer host->device bytes; ops/image.py)
        image = image_ops.maybe_normalize_u8(batch["image"])
        out = model.apply(
            {"params": p}, image, batch["audio"], mask_key,
            deterministic=False, rngs={"dropout": drop_key},
        )
        metrics = {
            "loss": out["loss"],
            "loss_image": out["loss_image"],
            "loss_audio": out["loss_audio"],
        }
        return out["loss"], metrics

    state = trainer.TrainState.create(params, tx)
    step = trainer.make_train_step(loss_fn, tx, cfg.accum_iter, mesh=mesh,
                                   watch_gradients=watch_gradients)
    return tx, state, step, lr_fn
