"""Attention fusion, Sinkhorn transition matrix, and the affinity random walk.

Reference semantics (clip/clip_tool.py):

- fuse: concat the 11 frozen per-layer attention maps with block-11's map,
  drop the CLS row/column, and either (a) mean of the last
  ``attn_fuse_layers`` (=8) maps (:172-175), or (b) after
  ``seg_trans_start_iter`` / at val, select among the last
  ``seg_trans_layers`` (=6 VOC / 10 COCO) the maps whose summed difference
  to the decoder's learned affinity is below the mean, average them, and
  multiply by the learned affinity (:153-170),
- Sinkhorn-style normalization: 3 rounds of column- then row-normalization,
  symmetrize, one self-matmul (:64-80),
- per class: multiply by the CAM-box mask and propagate
  ``cam_refined = trans_mat @ cam`` (:179-192).

All steps run masked on the padded grid, vmapped over the batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from weclip_tpu.refine.bbox import scoremap_box_mask


def fuse_attention_plain(layer_attn: jax.Array, attn_last: jax.Array,
                         n_fuse: int, num_patches: int = None) -> jax.Array:
    """Mean of the last ``n_fuse`` of [frozen layers ; last], CLS dropped.

    layer_attn: (K, B, L, L) frozen maps;  attn_last: (B, L, L).
    Returns (B, P, P).  ``num_patches`` gives P explicitly when the maps
    arrive at the backbone's stream-padded length (vit.VisionFeatures);
    default is P = L - 1.  (clip_tool.py:172-175)
    """
    pe = 1 + (num_patches if num_patches is not None
              else layer_attn.shape[-1] - 1)
    stack = jnp.concatenate([layer_attn, attn_last[None]], axis=0)
    tail = stack[-n_fuse:, :, 1:pe, 1:pe]
    return jnp.mean(tail, axis=0)


def fuse_attention_gated(layer_attn: jax.Array, attn_last: jax.Array,
                         seg_attn: jax.Array, n_window: int,
                         valid_p: jax.Array) -> jax.Array:
    """Learned-affinity-gated fusion (clip_tool.py:153-170).

    seg_attn: (B, P, P) sigmoid Gram affinity from the decoder features.
    valid_p:  (B, P) patch validity (used so padded cells don't skew the
    layer-selection statistics; at train time it is all-ones and this
    matches the reference bit-for-bit).  P comes from seg_attn, so
    stream-padded maps (L > 1 + P) slice down for free here.
    """
    pe = 1 + seg_attn.shape[1]
    stack = jnp.concatenate([layer_attn, attn_last[None]], axis=0)
    tail = stack[-n_window:, :, 1:pe, 1:pe]                   # (W, B, P, P)
    vm = (valid_p[:, :, None] * valid_p[:, None, :])[None]    # (1, B, P, P)
    diff = jnp.sum((seg_attn[None] - tail) * vm, axis=(2, 3))  # (W, B)
    thr = jnp.mean(diff, axis=0, keepdims=True)
    sel = (diff <= thr).astype(jnp.float32)                    # (W, B)
    num = jnp.einsum("wb,wbpq->bpq", sel, tail)
    den = jnp.sum(sel, axis=0)[:, None, None] + 1e-5
    fused = num / den
    return fused * jax.lax.stop_gradient(seg_attn)


def sinkhorn_transition(aff: jax.Array, valid_p: jax.Array,
                        rounds: int = 3) -> jax.Array:
    """Column/row normalization rounds + symmetrize + one self-matmul
    (clip_tool.py:64-80), masked to valid cells.

    aff: (P, P) nonnegative affinity;  valid_p: (P,) bool.
    """
    vm2 = valid_p[:, None] & valid_p[None, :]
    a = jnp.where(vm2, aff.astype(jnp.float32), 0.0)

    def norm_round(a, _):
        col = jnp.sum(a, axis=0, keepdims=True)
        a = a / jnp.where(col > 0, col, 1.0)
        row = jnp.sum(a, axis=1, keepdims=True)
        a = a / jnp.where(row > 0, row, 1.0)
        return a, None

    a, _ = jax.lax.scan(norm_round, a, None, length=rounds)
    a = (a + a.T) / 2.0
    # full fp32 multiplies: the transition matrix feeds pseudo-label parity
    a = jnp.dot(a, a, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return jnp.where(vm2, a, 0.0)


def random_walk_cams(
    cams: jax.Array,          # (C, P) normalized CAMs (padded grid, flat)
    trans_mat: jax.Array,     # (P, P)
    valid_grid: jax.Array,    # (G, G) bool
    gh: jax.Array, gw: jax.Array,
    bbox_threshold: float,
) -> jax.Array:
    """Per-class box-masked random walk: (trans * box_mask) @ cam
    (clip_tool.py:179-192).  Returns (C, P) refined CAMs."""
    g0, g1 = valid_grid.shape

    def one(cam_flat):
        box = scoremap_box_mask(cam_flat.reshape(g0, g1), valid_grid, gh, gw,
                                bbox_threshold).reshape(-1)
        t = trans_mat * box[None, :]
        return jnp.dot(t, cam_flat, precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(cams)


def gram_affinity(fts: jax.Array, valid_p: Optional[jax.Array] = None) -> jax.Array:
    """Learned affinity head: sigmoid(F^T F) over fused features
    (model_attn_aff_voc.py:134-137).  fts: (B, P, C) -> (B, P, P)."""
    g = jnp.einsum("bpc,bqc->bpq", fts.astype(jnp.float32),
                   fts.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    g = jax.nn.sigmoid(g)
    if valid_p is not None:
        vm = valid_p[:, :, None] * valid_p[:, None, :]
        g = g * vm
    return g
