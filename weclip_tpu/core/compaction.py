"""Class-set compaction: static buckets of *present* classes.

The reference only runs GradCAM / the affinity walk / PAR for the classes
present in each image (clip_tool.py:139: a Python loop over label_list).
The batched TPU pipeline pads that per-image set to a small static bucket —
CAM pullbacks, walk matmuls and PAR channels then scale with the bucket
(typically 4) instead of the full class count (20 / 80), a 2-5x saving on
the pseudo-label chain.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def pick_bucket(presents: np.ndarray, buckets: Sequence[int]) -> int:
    """Smallest bucket that fits every image's present-class count."""
    count = int(presents.sum(axis=1).max()) if len(presents) else 1
    for b in buckets:
        if b >= max(count, 1):
            return b
    return buckets[-1]


def compact_classes(presents: np.ndarray, mc: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """(B, C_fg) bool -> (cls_idx (B, mc) int32, active (B, mc) bool)."""
    b = presents.shape[0]
    cls_idx = np.zeros((b, mc), np.int32)
    active = np.zeros((b, mc), bool)
    for i in range(b):
        ids = np.where(presents[i])[0][:mc]
        cls_idx[i, :len(ids)] = ids
        active[i, :len(ids)] = True
    return cls_idx, active
