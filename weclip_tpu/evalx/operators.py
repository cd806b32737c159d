"""Host-built per-image resize operators for shape-static evaluation.

The reference evaluates images one at a time because every image has its own
size: CAMs are resized to the *original* resolution (clip_tool.py:194-197),
PAR runs at original resolution (PAR.py:67), seg logits are upsampled to the
label size (test_msc_flip_voc.py:92-95), and the 0.75-scale seg grid is
interpolated onto the scale-1 grid (:86).

TPU-first redesign: each variable-size bilinear resize becomes a pair of
per-image interpolation matrices (rows = target coordinates on a fixed
canvas, cols = source coordinates on a fixed padded grid) applied with an
einsum.  Rows beyond the image's true extent *clamp* to the last valid row,
so the canvas padding is automatically edge-replicated — which makes PAR's
replicate-padding semantics exact on the padded canvas (reads past the true
boundary see the same values replicate padding would produce).

All matrices are cheap (canvas x grid) numpy constructions.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


def _src_coords(dst: np.ndarray, in_size: int, out_size: int,
                align_corners: bool) -> np.ndarray:
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    elif align_corners:
        src = np.zeros_like(dst)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    return np.clip(src, 0.0, in_size - 1)


@lru_cache(maxsize=4096)
def clamp_resize_matrix(in_size: int, out_size: int,
                        canvas: int, src_pad: int,
                        align_corners: bool = False) -> np.ndarray:
    """(canvas, src_pad) bilinear matrix: rows < out_size interpolate the
    first ``in_size`` source cells; rows >= out_size repeat row out_size-1
    (edge replication into the canvas padding).

    Cached: eval sets reuse a few dozen distinct sizes, and matrix
    construction dominates host-side batch prep otherwise."""
    dst = np.arange(canvas, dtype=np.float64)
    dst = np.minimum(dst, out_size - 1)          # clamp target coordinate
    src = _src_coords(dst, in_size, out_size, align_corners)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m = np.zeros((canvas, src_pad), dtype=np.float32)
    rows = np.arange(canvas)
    # lo == hi only at the clamp boundary where w_hi == 0, so plain indexed
    # assignment (not add.at) is exact and ~50x faster
    m[rows, hi] = w_hi
    m[rows, lo] += 1.0 - w_hi
    return m


@lru_cache(maxsize=4096)
def scale_factor_matrix(in_size: int, out_size: int,
                        scale: float) -> np.ndarray:
    """(out, in) bilinear matrix with torch's scale_factor semantics:
    F.interpolate(x, scale_factor=s) maps coordinates through the ORIGINAL
    scale (src = (dst+0.5)/s - 0.5), not out/in — the two differ whenever
    in*s is fractional (ATen compute_scales_value).  The reference's
    0.75-scale TTA input uses exactly this (test_msc_flip_voc.py:81)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.clip((dst + 0.5) / scale - 0.5, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w_hi = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    m[rows, hi] = w_hi
    m[rows, lo] += 1.0 - w_hi
    return m


def resize_by_scale(img_chw: np.ndarray, out_hw, scale: float) -> np.ndarray:
    """Host bilinear resize of (C,H,W) with scale_factor coordinate
    mapping (see scale_factor_matrix)."""
    oh, ow = out_hw
    mh = scale_factor_matrix(img_chw.shape[1], oh, scale)
    mw = scale_factor_matrix(img_chw.shape[2], ow, scale)
    out = np.tensordot(mh, img_chw, axes=(1, 1))          # (oh, C, W)
    return np.tensordot(out, mw, axes=(2, 1)).transpose(1, 0, 2)


def device_resize_matrix(in_size, out_size, canvas: int, src_pad: int,
                         align_corners: bool = False):
    """On-device closed-form clamp-resize matrix from *traced* sizes.

    Bilinear interpolation weights are the triangular hat function
    max(0, 1 - |src(r) - c|); rows past out_size repeat the last row
    (edge replication) because the target coordinate clamps.  Equivalent to
    clamp_resize_matrix but built inside jit from two scalars — so the host
    ships 4 ints per image instead of megabytes of matrices."""
    import jax.numpy as jnp
    in_f = jnp.asarray(in_size, jnp.float32)
    out_f = jnp.asarray(out_size, jnp.float32)
    r = jnp.arange(canvas, dtype=jnp.float32)
    dst = jnp.minimum(r, out_f - 1.0)
    if align_corners:
        src = dst * (in_f - 1.0) / jnp.maximum(out_f - 1.0, 1.0)
    else:
        src = (dst + 0.5) * (in_f / out_f) - 0.5
    src = jnp.clip(src, 0.0, in_f - 1.0)
    c = jnp.arange(src_pad, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - c[None, :]))


def device_scale_matrix(in_size, out_size, scale: float, canvas: int,
                        src_pad: int):
    """On-device clamp-resize matrix with torch's scale_factor coordinate
    mapping (src = (dst+0.5)/s - 0.5 — see scale_factor_matrix): the
    reference's 0.75-scale TTA input (test_msc_flip_voc.py:81) derives from
    the already-resized scale-1 tensor through the ORIGINAL scale, which
    differs from size-ratio mapping whenever in*s is fractional."""
    import jax.numpy as jnp
    in_f = jnp.asarray(in_size, jnp.float32)
    out_f = jnp.asarray(out_size, jnp.float32)
    r = jnp.arange(canvas, dtype=jnp.float32)
    dst = jnp.minimum(r, out_f - 1.0)
    src = jnp.clip((dst + 0.5) / jnp.float32(scale) - 0.5, 0.0, in_f - 1.0)
    c = jnp.arange(src_pad, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - c[None, :]))
