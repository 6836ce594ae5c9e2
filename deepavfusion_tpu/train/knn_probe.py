"""Online kNN retrieval probe — the pretraining-time evaluation.

Reference parity (util/knn_probe.py:23-152): extract mean-pooled per-track
features on a held-out set, L2-normalize, cosine top-k=2 with the 2nd
neighbor (self-match skip), report per-modality nn accuracy (single-label)
or nn AP/AUC (multi-label). Feature extraction runs through the jitted
sharded encoder; the (small) gathered feature matrix is scored host-side.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Callable, Iterable

import numpy as np


def extract_features(
    encode_fn: Callable,
    loader: Iterable,
    params,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """encode_fn(params, image, audio) → (x_image, x_audio, x_fusion) tokens."""
    v_feats, a_feats, mm_feats, labels = [], [], [], []
    for batch in loader:
        xi, xa, xf = encode_fn(params, batch["image"], batch["audio"])
        v_feats.append(np.asarray(xi.mean(axis=1), np.float32))
        a_feats.append(np.asarray(xa.mean(axis=1), np.float32))
        mm_feats.append(np.asarray(xf.mean(axis=1), np.float32))
        labels.append(np.asarray(batch["label"]))
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    # cross-process feature gather (reference util/knn_probe.py:108-111):
    # the loader shards the probe set per host, so each host's features must
    # be all-gathered before the kNN search sees the full database.
    cat = lambda xs: mesh_lib.host_gather(np.concatenate(xs, axis=0))
    return cat(v_feats), cat(a_feats), cat(mm_feats), cat(labels)


def _l2norm(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def knn_metrics(
    v_feats: np.ndarray,
    a_feats: np.ndarray,
    mm_feats: np.ndarray,
    labels: np.ndarray,
    multi_label: bool = False,
    chunk: int = 128,
) -> dict:
    """Cosine 1-NN (2nd neighbor, self-skip) classification metrics
    (reference util/knn_probe.py:114-150)."""
    v, a, m = _l2norm(v_feats), _l2norm(a_feats), _l2norm(mm_feats)
    n = labels.shape[0]
    preds: dict[str, list] = defaultdict(list)
    for i in range(0, n, chunk):
        sa = a[i : i + chunk] @ a.T
        sv = v[i : i + chunk] @ v.T
        sm = m[i : i + chunk] @ m.T
        for mod, scores in [
            ("audio", sa), ("image", sv), ("fusion", sm), ("all", sa + sv + sm)
        ]:
            order = np.argsort(-scores, axis=1)
            nn_idx = order[:, 1]                       # 2nd neighbor (skip self)
            nn_score = np.take_along_axis(scores, nn_idx[:, None], axis=1)[:, 0]
            preds[mod].append((labels[nn_idx], nn_score))

    out = {}
    if multi_label:
        from sklearn import metrics as skm

        seen = labels.sum(0) > 0
        for mod, chunks in preds.items():
            scores = np.concatenate(
                [ypred * yscore[:, None] for ypred, yscore in chunks], axis=0
            )
            ap = skm.average_precision_score(labels[:, seen], scores[:, seen], average=None)
            auc = skm.roc_auc_score(labels[:, seen], scores[:, seen], average=None)
            out[f"{mod}_nn_ap"] = float(np.mean(ap)) * 1.0
            out[f"{mod}_nn_auc"] = float(np.mean(auc))
    else:
        for mod, chunks in preds.items():
            ypred = np.concatenate([p for p, _ in chunks], axis=0)
            out[f"{mod}_nn_acc"] = float(np.mean(ypred == labels) * 100.0)
    return out


class EvalAVNNProbe:
    """Drop-in probe object for the pretraining loop (reference train.py:117-134)."""

    def __init__(self, encode_fn: Callable, loader_fn: Callable,
                 multi_label: bool = False):
        self.encode_fn = encode_fn
        self.loader_fn = loader_fn
        self.multi_label = multi_label

    def evaluate(self, params, epoch: int = 0) -> dict:
        v, a, m, y = extract_features(self.encode_fn, self.loader_fn(), params)
        stats = knn_metrics(v, a, m, y, self.multi_label)
        print({k: round(v, 3) for k, v in stats.items()})
        return stats
