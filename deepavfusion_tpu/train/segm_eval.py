"""AVSBench segmentation evaluator (reference eval_avsegm.py:246-343 parity).

Histogram-based per-class IoU / precision / recall / F-score with class-count
weighted averaging; binary max-F over 256 thresholds; miou/fscore with and
without the background class. Host-side numpy; cross-host aggregation via
process_allgather of the summed stats.
"""
from __future__ import annotations

import numpy as np

import jax


def _histc(x: np.ndarray, nclass: int) -> np.ndarray:
    """torch.histc(bins=nclass, min=1, max=nclass) over integer class ids
    (class 0 = masked-out pixels falls outside the range, matching the
    reference's pred/target *= (target > 0) zeroing)."""
    return np.bincount(
        np.clip(x.astype(np.int64).reshape(-1), 0, nclass), minlength=nclass + 1
    )[1:].astype(np.float64)


class AVSegmEvaluator:
    def __init__(self, beta2: float = 0.3):
        self.beta2 = beta2
        self.clear()

    def clear(self):
        self.iou_list, self.cls_list = [], []
        self.precision_list, self.recall_list, self.fscore_list = [], [], []

    def update(self, pred_logits: np.ndarray, target: np.ndarray):
        """pred_logits: (B, C, H, W); target: (B, H, W) int (−1/0/1.. ; binary
        tasks use {0,1})."""
        pred_logits = np.asarray(pred_logits, np.float32)
        target = np.asarray(target).astype(np.int64) + 1
        nclass = pred_logits.shape[1]
        if nclass == 1:
            prob = 1.0 / (1.0 + np.exp(-pred_logits))
            pred = (prob[:, 0] > 0.5).astype(np.float32) + 1
        else:
            e = np.exp(pred_logits - pred_logits.max(axis=1, keepdims=True))
            prob = e / e.sum(axis=1, keepdims=True)
            pred = prob.argmax(axis=1).astype(np.float32) + 1
        prob = prob * (target[:, None] > 0)
        pred = pred * (target > 0)

        for y, p, t in zip(pred, prob, target):
            if (t > 1).sum() == 0:      # background-only frames are skipped
                continue
            if nclass == 1:
                iou, precision, recall, _, cls = self._miou_fscore(y, t, 2)
                fscore = np.asarray([self._fscore_bin(p[0], t)])
            else:
                iou, precision, recall, fscore, cls = self._miou_fscore(y, t, nclass)
            self.iou_list.append(iou)
            self.cls_list.append(cls)
            self.precision_list.append(precision)
            self.recall_list.append(recall)
            self.fscore_list.append(fscore)

    def _fscore_bin(self, prob, target, eps=1e-10, nbins=256):
        thr = np.linspace(0, 1 - eps, nbins)
        flat_p = prob.reshape(-1)
        flat_t = (target.reshape(-1) == 2)
        n_t = flat_t.sum()
        ypred = flat_p[None, :] >= thr[:, None]          # (nbins, HW)
        tp = (ypred & flat_t[None, :]).sum(1)
        prec = tp / (ypred.sum(1) + eps)
        recall = tp / (n_t + eps)
        f = (1 + self.beta2) * prec * recall / (self.beta2 * prec + recall + eps)
        return float(f.max())

    def _miou_fscore(self, pred, target, nclass, eps=1e-10):
        inter = pred * (pred == target)
        area_inter = _histc(inter, nclass)
        area_pred = _histc(pred, nclass)
        area_lab = _histc(target, nclass)
        area_union = area_pred + area_lab - area_inter
        iou = area_inter / (eps + area_union)
        cls = (area_union > 0).astype(np.float64)
        precision = area_inter / (eps + area_pred)
        recall = area_inter / (eps + area_lab)
        fscore = (1 + self.beta2) * precision * recall / (self.beta2 * precision + recall + eps)
        return iou, precision, recall, fscore, cls

    def _aggregate(self, x_list):
        s = np.stack(x_list).sum(0)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            s = multihost_utils.process_allgather(s).sum(0)
        return s

    def average_metrics(self) -> dict:
        cls_sum = self._aggregate(self.cls_list)
        iou_sum = self._aggregate(self.iou_list)
        precision_sum = self._aggregate(self.precision_list)
        recall_sum = self._aggregate(self.recall_list)
        fscore_sum = self._aggregate(self.fscore_list)

        seen = np.nonzero(cls_sum)[0]
        miou_c = iou_sum[seen] / cls_sum[seen]
        prec_c = precision_sum[seen] / cls_sum[seen]
        rec_c = recall_sum[seen] / cls_sum[seen]
        if fscore_sum.size == 1:
            n_images = len(self.fscore_list) * jax.process_count()
            f_c = np.asarray([fscore_sum[0], fscore_sum[0]]) / n_images
        else:
            f_c = fscore_sum[seen] / cls_sum[seen]

        return {
            "miou": float(miou_c.mean()),
            "miou_noBg": float(miou_c[1:].mean()),
            "precision": float(prec_c.mean()),
            "precision_noBg": float(prec_c[1:].mean()),
            "recall": float(rec_c.mean()),
            "recall_noBg": float(rec_c[1:].mean()),
            "fscore": float(f_c.mean()),
            "fscore_noBg": float(f_c[1:].mean()),
        }
