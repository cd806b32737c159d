"""Streaming segmentation metrics, on device.

Replaces utils/evaluate.py (host numpy bincount per image, flushed in
chunks) with a batched one-hot confusion-matrix einsum that rides the MXU;
scores are computed from the final histogram exactly like
``evaluate.scores`` (utils/evaluate.py:18-36).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_update(hist: jax.Array, gt: jax.Array, pred: jax.Array,
                     num_classes: int) -> jax.Array:
    """hist += one_hot(gt)^T @ one_hot(pred) over pixels with
    0 <= gt < num_classes (utils/evaluate.py:9-15)."""
    gtf = gt.reshape(-1)
    prf = pred.reshape(-1)
    maskv = (gtf >= 0) & (gtf < num_classes)
    g1 = jax.nn.one_hot(jnp.where(maskv, gtf, 0), num_classes,
                        dtype=jnp.float32) * maskv[:, None]
    p1 = jax.nn.one_hot(jnp.clip(prf, 0, num_classes - 1), num_classes,
                        dtype=jnp.float32)
    return hist + jnp.einsum("pg,pk->gk", g1, p1,
                             preferred_element_type=jnp.float32)


def scores(hist: np.ndarray) -> Dict[str, object]:
    hist = np.asarray(hist, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
    valid = hist.sum(axis=1) > 0
    mean_iu = np.nanmean(iu[valid])
    return {"pAcc": acc, "mAcc": acc_cls, "miou": mean_iu,
            "iou": dict(zip(range(hist.shape[0]), iu))}


def zero_hist(num_classes: int) -> jax.Array:
    return jnp.zeros((num_classes, num_classes), jnp.float32)


def pseudo_scores(label_trues, label_preds, num_classes: int = 21):
    """Pseudo-label scoring that ignores predicted-255 pixels
    (utils/evaluate.py:38-59: gt[pred==255]=255, pred[pred==255]=0)."""
    hist = np.zeros((num_classes, num_classes), np.float64)
    for lt, lp in zip(label_trues, label_preds):
        lt = np.array(lt).flatten()
        lp = np.array(lp).flatten()
        lt[lp == 255] = 255
        lp = np.where(lp == 255, 0, lp)
        m = (lt >= 0) & (lt < num_classes)
        hist += np.bincount(num_classes * lt[m].astype(np.int64) + lp[m],
                            minlength=num_classes ** 2
                            ).reshape(num_classes, num_classes)
    return scores(hist)
