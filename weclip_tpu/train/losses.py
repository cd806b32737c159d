"""Training losses and affinity-label construction.

Reference semantics:
- ``get_seg_loss`` (scripts/dist_clip_voc.py:105-113): cross-entropy computed
  twice — once with all foreground pixels ignored (background term) and once
  with background pixels ignored (foreground term) — averaged 50/50, both
  honoring ignore_index=255.
- ``get_aff_loss`` (utils/losses.py:11-22): balanced pos/neg loss on the
  sigmoid Gram affinity against a {0,1,255} affinity label.
- ``cams_to_affinity_label`` (utils/camutils.py:226-247): pseudo-label
  nearest-downsample x16, pairwise equality, radius-neighborhood mask and
  ignore handling.
- ``get_mask_by_radius`` (scripts/dist_clip_voc.py:116-133): static
  neighborhood mask.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def radius_mask(h: int, w: int, radius: int = 8) -> np.ndarray:
    """(hw, hw) 0/1 neighborhood mask (dist_clip_voc.py:116-133)."""
    ys, xs = np.mgrid[0:h, 0:w]
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    dy = np.abs(ys[:, None] - ys[None, :])
    dx = np.abs(xs[:, None] - xs[None, :])
    return ((dy <= radius) & (dx <= radius)).astype(np.float32)


def cams_to_affinity_label(cam_label: jax.Array, mask: jax.Array,
                           ignore_index: int = 255,
                           patch: int = 16) -> jax.Array:
    """(B, H, W) pseudo labels -> (B, hw, hw) affinity labels in {0,1,255}."""
    lab = cam_label[:, ::patch, ::patch]                      # torch 'nearest' x16
    b = lab.shape[0]
    flat = lab.reshape(b, -1)
    eq = (flat[:, :, None] == flat[:, None, :]).astype(jnp.int32)
    ign = jnp.int32(ignore_index)
    eq = jnp.where(mask[None] == 0, ign, eq)
    is_ign = flat == ignore_index
    eq = jnp.where(is_ign[:, None, :], ign, eq)               # ignore columns
    eq = jnp.where(is_ign[:, :, None], ign, eq)               # ignore rows
    return eq


def aff_loss(attn_pred: jax.Array, aff_label: jax.Array
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Balanced affinity loss (utils/losses.py:11-22)."""
    pos = (aff_label == 1).astype(jnp.float32)
    neg = (aff_label == 0).astype(jnp.float32)
    pos_count = pos.sum() + 1.0
    neg_count = neg.sum() + 1.0
    pos_loss = jnp.sum(pos * (1.0 - attn_pred)) / pos_count
    neg_loss = jnp.sum(neg * attn_pred) / neg_count
    return 0.5 * pos_loss + 0.5 * neg_loss, pos_count, neg_count


def _masked_ce(logits: jax.Array, label: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean cross-entropy over pixels where ``valid`` (torch ignore_index
    semantics: returns 0-safe value when nothing is valid)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)  # (B,K,H,W)
    lab = jnp.clip(label, 0, logits.shape[1] - 1)
    # per-pixel class pick as a one-hot contraction over the class axis:
    # the take_along_axis formulation lowers to a ~6 ms/step scalar gather
    # on TPU (21% of the VOC train step, xprof r3), and the r3 K-way
    # unrolled select-sum scaled badly in the BACKWARD at COCO's K=81
    # (81 accumulating where-cotangent chains = 5.9 ms/step of add_any,
    # 20% of the step, xprof r4).  The einsum keeps forward AND backward
    # as one fused pass each (d logp = -onehot * d nll) and differentiates
    # identically — the cotangent lands on the selected class either way.
    k = logits.shape[1]
    onehot = (lab[:, None] == jnp.arange(k, dtype=lab.dtype)[None, :, None, None])
    nll = -jnp.einsum("bkhw,bkhw->bhw", onehot.astype(jnp.float32), logp)
    v = valid.astype(jnp.float32)
    return jnp.sum(nll * v) / jnp.maximum(v.sum(), 1.0)


def seg_loss(logits: jax.Array, label: jax.Array,
             ignore_index: int = 255) -> jax.Array:
    """fg/bg-split cross-entropy (dist_clip_voc.py:105-113).

    logits: (B, K, H, W);  label: (B, H, W) int."""
    not_ign = label != ignore_index
    bg_valid = not_ign & (label == 0)
    fg_valid = not_ign & (label != 0)
    bg = _masked_ce(logits, label, bg_valid)
    fg = _masked_ce(logits, label, fg_valid)
    return 0.5 * (bg + fg)
