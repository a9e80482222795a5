"""Confusion-matrix IoU metrics (torchmetrics JaccardIndex equivalent).

The reference uses `JaccardIndex(task='multiclass', average='none')` pairs for
lidarseg (17 classes, ignore_index=0) and occupancy (18 classes, no ignore)
(base_exp.py:287-290), prints per-class IoU and logs nanmean slices
(mIoU = mean over classes 1..16; occ_mIoU = mean over classes 0..16, dropping
'free' via [:-1]) (base_exp.py:851-910).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def confusion_update(conf: jnp.ndarray, preds: jnp.ndarray,
                     labels: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Accumulate a (C, C) confusion matrix [true, pred] — jit-friendly."""
    C = conf.shape[0]
    idx = labels.reshape(-1).astype(jnp.int32) * C + \
        preds.reshape(-1).astype(jnp.int32)
    w = (valid.reshape(-1).astype(jnp.float32) if valid is not None
         else jnp.ones(idx.shape, jnp.float32))
    binc = jnp.zeros((C * C,), jnp.float32).at[idx].add(w)
    return conf + binc.reshape(C, C)


class JaccardIndex:
    """Host-side accumulator (device part = confusion_update)."""

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        self.conf = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update(self, preds: np.ndarray, labels: np.ndarray,
               valid: Optional[np.ndarray] = None):
        preds = np.asarray(preds).reshape(-1)
        labels = np.asarray(labels).reshape(-1)
        mask = np.ones(labels.shape, bool)
        if valid is not None:
            mask &= np.asarray(valid).reshape(-1)
        if self.ignore_index is not None:
            mask &= labels != self.ignore_index
        preds, labels = preds[mask], labels[mask]
        np.add.at(self.conf, (labels.astype(np.int64),
                              preds.astype(np.int64)), 1.0)

    def update_confusion(self, conf: np.ndarray):
        conf = np.asarray(conf, np.float64)
        if self.ignore_index is not None:
            conf = conf.copy()
            conf[self.ignore_index, :] = 0.0
        self.conf += conf

    def compute(self) -> np.ndarray:
        """Per-class IoU; classes with empty union -> nan."""
        tp = np.diag(self.conf)
        union = self.conf.sum(0) + self.conf.sum(1) - tp
        with np.errstate(divide='ignore', invalid='ignore'):
            iou = np.where(union > 0, tp / union, np.nan)
        return iou


def format_iou_report(iou: np.ndarray, names, title: str) -> str:
    lines = [f'{title} per class iou: ']
    for n, v in zip(names, iou):
        lines.append('%s : %.2f%%' % (n, v * 100))
    return '\n'.join(lines)
