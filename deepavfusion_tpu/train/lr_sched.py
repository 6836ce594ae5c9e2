"""Learning-rate schedules + per-parameter-group machinery (optax).

Reference semantics reproduced exactly (util/lr_sched.py):

  * warmup→cosine-to-zero base schedule, epoch-fractional, applied per
    optimizer update (adjust_learning_rate, :4-24);
  * a separate cosine ramp ``pt_lr_mult_start→end`` over ``pt_warmup_epochs``
    multiplying groups flagged *pretrained* (:12-16) — used during MAE
    pretraining to keep the MAE-IN1k/AudioMAE-initialized encoder trunks
    slow-started while fusion blocks + decoders train at full rate
    (param_groups_pretrained, :77-93);
  * BEiT layer-wise lr decay via per-leaf layer ids (param_groups_lrd, :27-59),
    with the reference's params_layer_ids() numbering: patch_embed/cls/
    fusion_tokens→0, block i→i+1, final norms & heads→depth+1;
  * no weight decay for 1-D params and 'bias'/'norm'-named leaves
    (train.py:89, timm param_groups_weight_decay semantics).

TPU-first: instead of mutating optimizer param-group dicts per step, all of
this is static pytrees of multipliers + pure schedule functions folded into a
single optax GradientTransformation inside the jitted train step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------- #
# Schedules
# --------------------------------------------------------------------------- #
def warmup_cosine(base_lr: float, warmup_epochs: float, total_epochs: float,
                  steps_per_epoch: float, min_lr: float = 0.0) -> Callable:
    """lr(update_step): linear warmup then cosine decay, epoch-fractional
    (reference util/lr_sched.py:4-9; min_lr kept for config parity — the
    reference formula decays to 0 and ships min_lr=0 in every config)."""

    def fn(step):
        epoch = step / steps_per_epoch
        warm = base_lr * epoch / jnp.maximum(warmup_epochs, 1e-8)
        frac = (epoch - warmup_epochs) / jnp.maximum(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return fn


def pretrained_mult(pt_lr_mult_start: float, pt_lr_mult_end: float,
                    pt_warmup_epochs: float, steps_per_epoch: float) -> Callable:
    """Cosine ramp multiplier for pretrained groups (util/lr_sched.py:12-16)."""

    def fn(step):
        epoch = step / steps_per_epoch
        ramp = (0.5 - 0.5 * jnp.cos(jnp.pi * epoch / jnp.maximum(pt_warmup_epochs, 1e-8)))
        scale = ramp * (pt_lr_mult_end - pt_lr_mult_start) + pt_lr_mult_start
        return jnp.where(epoch < pt_warmup_epochs, scale, pt_lr_mult_end)

    return fn


def eval_epochs_expr(expr, total_epochs: float) -> float:
    """The reference's ``pt_warmup_epochs: ${opt.epochs}/2`` is a string
    evaluated with python eval (util/lr_sched.py:12). We support the same
    surface safely: numbers pass through; strings may reference 'epochs'."""
    if expr is None:
        return -1.0
    if isinstance(expr, (int, float)):
        return float(expr)
    return float(eval(str(expr), {"__builtins__": {}}, {"epochs": total_epochs}))  # noqa: S307


# --------------------------------------------------------------------------- #
# Per-leaf masks / multiplier trees
# --------------------------------------------------------------------------- #
def path_str(path) -> str:
    return "/".join(getattr(p, "key", str(getattr(p, "idx", p))) for p in path)


def tree_from_path_fn(params, fn: Callable[[str, Any], Any]):
    return jax.tree_util.tree_map_with_path(lambda p, v: fn(path_str(p), v), params)


def is_scanned_path(path: str) -> bool:
    """Leaves of the scan-over-layers trunk (models/deepavfusion.py ScanLayer,
    name='layers'): every leaf carries a leading stacked-depth axis."""
    return path.startswith("layers/") or "/layers/" in path


def weight_decay_mask(params):
    """True where decay applies: ndim>1 and not a bias/norm leaf
    (reference train.py:89 + timm param_groups_weight_decay). Scanned leaves
    discount the stacked-depth axis so per-layer semantics match unrolled."""

    def fn(path, v):
        name = path.lower()
        nd = v.ndim - 1 if is_scanned_path(path) else v.ndim
        return nd > 1 and "bias" not in name and "norm" not in name

    return tree_from_path_fn(params, fn)


def pretrained_mask(params, image_pt: bool = True, audio_pt: bool = True):
    """True for leaves under the (pretrained-initialized) modality trunks
    (reference param_groups_pretrained, util/lr_sched.py:77-93)."""

    def fn(path, v):
        if image_pt and ("encoder/image/" in path or path.startswith("image/")
                         or "layers/blk_image/" in path):
            return True
        if audio_pt and ("encoder/audio/" in path or path.startswith("audio/")
                         or "layers/blk_audio/" in path):
            return True
        return False

    return tree_from_path_fn(params, fn)


def layer_id_for_path(path: str, depth: int) -> int:
    """Reference params_layer_ids numbering (models/vits.py:82-89,
    models/deepavfusion.py:70-79, models/classifier.py:34-40):
    embeddings→0, block i→i+1, everything after the blocks→depth+1."""
    parts = path.split("/")
    for i, seg in enumerate(parts):
        if seg.startswith("blocks_") or seg.startswith("fusion_blocks_"):
            return int(seg.split("_")[-1]) + 1
    name = parts[-2] if len(parts) > 1 else parts[-1]
    if any(s in path for s in ("patch_embed", "cls_token", "fusion_tokens", "pos_embed")):
        return 0
    # final norms, fusion_norm, heads, decoders
    return depth + 1


def layer_decay_scales(params, layer_decay: float, depth: int):
    """Per-leaf lr multiplier tree: layer_decay ** (num_layers - layer_id)
    (reference util/lr_sched.py:27-59).

    Scanned-trunk leaves (stacked along a leading depth axis) get a
    per-layer multiplier VECTOR shaped (depth, 1, ..., 1) — it broadcasts
    against the stacked update inside scale_by_reference_lr, giving exactly
    the unrolled per-block decay without abandoning the scan layout."""
    num_layers = depth + 1

    def fn(path, v):
        if is_scanned_path(path):
            ids = jnp.arange(1, v.shape[0] + 1)          # block i → id i+1
            s = layer_decay ** (num_layers - ids)
            return s.reshape((-1,) + (1,) * (v.ndim - 1)).astype(jnp.float32)
        lid = layer_id_for_path(path, depth)
        return layer_decay ** (num_layers - lid)

    return tree_from_path_fn(params, fn)


def ones_like_scales(params):
    return jax.tree.map(lambda v: 1.0, params)


# --------------------------------------------------------------------------- #
# The combined optax transformation
# --------------------------------------------------------------------------- #
def scale_by_reference_lr(
    lr_fn: Callable,
    scale_tree,
    pt_mask_tree=None,
    pt_mult_fn: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Final lr scaling: update ← -lr(step) · leaf_scale · pt_mult(step)^is_pt."""

    def init(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        step = state.count
        lr = lr_fn(step)
        ptm = pt_mult_fn(step) if pt_mult_fn is not None else 1.0

        def scale_leaf(u, s, is_pt):
            m = lr * s * jnp.where(jnp.asarray(is_pt), ptm, 1.0)
            return -m * u

        if pt_mask_tree is None:
            out = jax.tree.map(lambda u, s: -lr * s * u, updates, scale_tree)
        else:
            out = jax.tree.map(scale_leaf, updates, scale_tree, pt_mask_tree)
        return out, optax.ScaleByScheduleState(count=step + 1)

    return optax.GradientTransformation(init, update)


@dataclasses.dataclass
class OptimizerConfig:
    lr: float = 1.5e-4
    min_lr: float = 0.0
    warmup_epochs: float = 40.0
    epochs: float = 300.0
    steps_per_epoch: float = 1000.0
    weight_decay: float = 0.05
    betas: tuple[float, float] = (0.9, 0.95)
    # Optional bf16 first-moment storage (optax mu_dtype): halves the m
    # read+write HBM traffic of the AdamW update — the update tail is
    # HBM-bound (bench_step_attribution.py). From-scratch knob: None (f32)
    # matches torch AdamW bit-for-bit (test_train_step_parity.py).
    mu_dtype: Optional[Any] = None
    clip_grad: Optional[float] = None
    layer_decay: Optional[float] = None
    depth: int = 12
    # pretrained-group ramp (pretraining only)
    pt_lr_mult_start: Optional[float] = None
    pt_lr_mult_end: float = 1.0
    pt_warmup_epochs: Optional[float] = None
    image_pt: bool = True
    audio_pt: bool = True


def make_adamw(params, cfg: OptimizerConfig) -> optax.GradientTransformation:
    """AdamW with the full reference scheduling stack as one transformation."""
    lr_fn = warmup_cosine(cfg.lr, cfg.warmup_epochs, cfg.epochs,
                          cfg.steps_per_epoch, cfg.min_lr)
    pt_mask = None
    pt_fn = None
    if cfg.pt_lr_mult_start is not None and cfg.pt_warmup_epochs is not None:
        pt_mask = pretrained_mask(params, cfg.image_pt, cfg.audio_pt)
        pt_fn = pretrained_mult(cfg.pt_lr_mult_start, cfg.pt_lr_mult_end,
                                cfg.pt_warmup_epochs, cfg.steps_per_epoch)
    if cfg.layer_decay is not None and cfg.layer_decay < 1.0:
        scales = layer_decay_scales(params, cfg.layer_decay, cfg.depth)
    else:
        scales = ones_like_scales(params)

    chain = []
    if cfg.clip_grad:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    chain += [
        optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1],
                            mu_dtype=cfg.mu_dtype),
        optax.add_decayed_weights(cfg.weight_decay, mask=weight_decay_mask(params)),
        scale_by_reference_lr(lr_fn, scales, pt_mask, pt_fn),
    ]
    return optax.chain(*chain), lr_fn
