"""Classification task stack shared by the linear-probe and fine-tune entries.

Reference parity:
  * losses — CE / BCE-with-logits / timm SoftTargetCE / LabelSmoothingCE
    (eval_linprobe.py:111, eval_finetune.py:185-192);
  * AVMixup — joint image+audio mixup with per-element lambda and smoothed
    soft targets (eval_finetune.py:24-57);
  * class-frequency loss weighting incl. the reference's broadcast quirk for
    single-label datasets (scalar loss × mean(1/freq), eval_finetune.py:287-296);
  * class-prior head-bias init log(f/(1-f)) (eval_finetune.py:177-181);
  * eval metrics — top-1 accuracy per head + mean-of-heads, or per-class
    AP/AUC over seen classes ×100 (util/misc.py:312-326, eval_linprobe.py:242-263).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Losses
# --------------------------------------------------------------------------- #
def cross_entropy(logits, labels):
    return -jnp.take_along_axis(
        jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1
    )[:, 0].mean()


def label_smoothing_ce(logits, labels, smoothing=0.1):
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    smooth = -logp.mean(axis=-1)
    return ((1.0 - smoothing) * nll + smoothing * smooth).mean()


def soft_target_ce(logits, soft_targets):
    return (-soft_targets * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()


def bce_with_logits(logits, targets, weight=None, reduce=True):
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    loss = -(targets * logp + (1.0 - targets) * lognp)
    if weight is not None:
        loss = loss * weight
    return loss.mean() if reduce else loss


def class_weighted_loss(loss, class_freq, multi_label: bool):
    """Reference eval_finetune.py:296 quirk: for single-label datasets the
    criterion returns a scalar and ``(loss / freq).mean()`` reduces to
    loss × mean(1/freq); for multi-label the (B, C) BCE map is weighted
    per class then averaged.

    class_freq must be a host numpy array — the seen-class mask is resolved
    statically (boolean indexing is not stageable under jit).
    """
    class_freq = np.asarray(class_freq)
    seen = class_freq > 0
    inv = (1.0 / class_freq[seen]).astype(np.float32)
    if multi_label:
        # loss here is the per-element BCE map already restricted to seen cols
        return (loss * jnp.asarray(inv)[None, :]).mean()
    return loss * float(inv.mean())


def head_bias_init(class_freq: np.ndarray) -> np.ndarray:
    """log((f+1e-3)/(1-f+1e-3)) (reference eval_finetune.py:178)."""
    f = np.asarray(class_freq, np.float32)
    return np.log((f + 1e-3) / (1.0 - f + 1e-3))


# --------------------------------------------------------------------------- #
# AVMixup
# --------------------------------------------------------------------------- #
def av_mixup(
    key: jax.Array,
    image: jnp.ndarray,
    audio: jnp.ndarray,
    targets: jnp.ndarray,
    num_classes: int,
    mixup_alpha: float = 1.0,
    prob: float = 1.0,
    smoothing: float = 0.1,
):
    """Joint AV mixup with per-element lambda (reference eval_finetune.py:24-57).

    targets: int labels (B,) or multi-hot (B, C). Returns mixed (image, audio,
    soft_targets).
    """
    b = image.shape[0]
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, mixup_alpha, mixup_alpha, (b,))
    lam = jnp.where(jax.random.uniform(k2, (b,)) < prob, lam, 1.0)

    def mix(x):
        l = lam.reshape((b,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return x * l + jnp.flip(x, axis=0) * (1.0 - l)

    image_m, audio_m = mix(image), mix(audio)

    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    if targets.ndim == 1:
        y1 = jax.nn.one_hot(targets, num_classes) * (on - off) + off
        y2 = jax.nn.one_hot(jnp.flip(targets, 0), num_classes) * (on - off) + off
    else:
        y1 = jnp.where(targets == 1, on, off)
        y2 = jnp.where(jnp.flip(targets, 0) == 1, on, off)
    soft = y1 * lam[:, None] + y2 * (1.0 - lam[:, None])
    return image_m, audio_m, soft


# --------------------------------------------------------------------------- #
# Metrics
# --------------------------------------------------------------------------- #
def top1_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    return float((logits.argmax(-1) == labels).mean() * 100.0)


def calc_multi_class_stats(labels: np.ndarray, preds: np.ndarray) -> dict:
    """Per-class AP + ROC-AUC over seen classes, mean ×100
    (reference util/misc.py:312-326)."""
    from sklearn import metrics as skm

    seen = labels.sum(0) > 0
    ap = skm.average_precision_score(labels[:, seen], preds[:, seen], average=None)
    auc = skm.roc_auc_score(labels[:, seen], preds[:, seen], average=None)
    return {"ap": float(np.mean(ap) * 100.0), "auc": float(np.mean(auc) * 100.0)}


def classification_eval_stats(
    preds_image, preds_audio, preds_fusion, labels, multi_label: bool
) -> dict:
    preds_all = (preds_image + preds_audio + preds_fusion) / 3.0
    stats = {}
    heads = [("image", preds_image), ("audio", preds_audio),
             ("fusion", preds_fusion), ("all", preds_all)]
    if multi_label:
        for mod, p in heads:
            s = calc_multi_class_stats(labels, p)
            stats.update({f"val_ap_{mod}": s["ap"], f"val_auc_{mod}": s["auc"]})
    else:
        for mod, p in heads:
            stats[f"val_acc1_{mod}"] = top1_accuracy(p, labels)
    return stats
