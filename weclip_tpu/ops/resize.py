"""Torch/cv2-parity spatial resampling as pure XLA gathers.

The reference pipeline leans on three distinct resize semantics, all of which
are numerically load-bearing for pseudo-label parity:

- ``F.interpolate(mode='bilinear', align_corners=False)`` / ``cv2.resize``:
  positional-embedding upsampling (clip/model.py:11-27), seg-logit upsampling
  (scripts/dist_clip_voc.py:250), CAM upsampling (clip_tool.py:149,
  pytorch_grad_cam/utils/image.py:57).
- ``F.interpolate(mode='bilinear', align_corners=True)``: PAR image
  resampling (WeCLIP_model/PAR.py:67).
- ``F.interpolate(mode='nearest')``: affinity-label downsampling
  (utils/camutils.py:230).

Each is expressed as two 1-D interpolation matrices applied with einsum so
XLA lowers them to MXU matmuls (fast, fusable) instead of gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    elif align_corners:
        src = np.zeros_like(dst)
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    w_lo = 1.0 - w_hi
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += w_lo
    m[np.arange(out_size), hi] += w_hi
    return m.astype(np.float32)


def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Torch 'nearest' source index: floor(dst * in/out)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.floor(dst * (in_size / out_size)).astype(np.int64)
    return np.minimum(src, in_size - 1)


@partial(jax.jit, static_argnames=("out_h", "out_w", "align_corners"))
def resize_bilinear(x: jax.Array, out_h: int, out_w: int,
                    align_corners: bool = False) -> jax.Array:
    """Bilinear resize over the last two axes. Matches torch F.interpolate
    (and cv2.resize INTER_LINEAR when align_corners=False)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    mh = jnp.asarray(_linear_matrix(in_h, out_h, align_corners))
    mw = jnp.asarray(_linear_matrix(in_w, out_w, align_corners))
    dt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    # full fp32 multiplies: resize feeds parity-sensitive label math
    y = jnp.einsum("oh,...hw->...ow", mh, x.astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("pw,...ow->...op", mw, y,
                   precision=jax.lax.Precision.HIGHEST)
    return y.astype(dt)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Torch F.interpolate(mode='nearest') over the last two axes."""
    ih = jnp.asarray(_nearest_index(x.shape[-2], out_h))
    iw = jnp.asarray(_nearest_index(x.shape[-1], out_w))
    return x[..., ih, :][..., iw]


def upsample_pos_emb(pos_emb: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    """Resample a (1 + g*g, D) CLIP positional embedding to (1 + gh*gw, D).

    Reference: clip/model.py:11-27 (bilinear, align_corners=False, CLS kept).
    """
    n = pos_emb.shape[0] - 1
    g = int(round(n ** 0.5))
    assert g * g == n, f"pos emb is not square: {n}"
    cls_tok, grid = pos_emb[:1], pos_emb[1:]
    d = grid.shape[-1]
    grid = grid.reshape(g, g, d).transpose(2, 0, 1)          # (D, g, g)
    grid = resize_bilinear(grid, grid_h, grid_w, align_corners=False)
    grid = grid.transpose(1, 2, 0).reshape(grid_h * grid_w, d)
    return jnp.concatenate([cls_tok, grid], axis=0)
