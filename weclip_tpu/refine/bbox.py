"""On-device CAM -> bounding-box affinity masks.

Replaces the reference's host round-trip through OpenCV
(clip/utils.py:115-142: ``cv2.threshold`` at 0.4*max, ``cv2.findContours``,
per-contour ``boundingRect``, union of boxes painted into a mask,
clip_tool.py:179-186) with a fully vectorized XLA program:

1. quantize the normalized CAM exactly like cv2 (uint8 truncation, strict
   ``>`` threshold against ``int(thr * max)``),
2. 8-connected component labeling by iterative min-label propagation
   (a ``lax.while_loop`` of 3x3 min-pools — converges in O(component
   diameter) steps),
3. per-component bounding boxes via a one-hot (cells x components) matrix,
4. union of boxes with the reference's odd ``min(x1, w-1)`` clipping
   (clip/utils.py:139-140) — the last valid row/column is excluded for
   components that touch it.

Everything is static-shape on the padded grid; a validity mask carries the
true (gh, gw) extent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def connected_components(binary: jax.Array) -> jax.Array:
    """8-connected component labels of a 2-D bool grid.

    Returns int32 labels (= min flat index in the component); background
    cells get G*G (an out-of-range sentinel).
    """
    h, w = binary.shape
    sentinel = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(binary, idx, sentinel)

    def min_pool(lab):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                best = jnp.minimum(best, p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        return jnp.where(binary, best, sentinel)

    def cond(state):
        lab, changed = state
        return changed

    def body(state):
        lab, _ = state
        new = min_pool(lab)
        return new, jnp.any(new != lab)

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return labels


def scoremap_box_mask(cam: jax.Array, valid: jax.Array,
                      gh: jax.Array, gw: jax.Array,
                      threshold: float) -> jax.Array:
    """Union-of-component-bboxes mask for one normalized CAM.

    cam:   (G, G) min-max-normalized scores (0 on invalid cells)
    valid: (G, G) bool validity; gh/gw: true grid extent (traced scalars ok)
    Returns (G, G) float32 mask in {0, 1}.
    """
    g0, g1 = cam.shape
    q = jnp.floor(jnp.clip(cam, 0.0, 1.0) * 255.0).astype(jnp.int32)
    q = jnp.where(valid, q, 0)
    thr = jnp.floor(threshold * jnp.max(q).astype(jnp.float32)).astype(jnp.int32)
    binary = (q > thr) & valid

    labels = connected_components(binary)

    ncell = g0 * g1
    flat_bin = binary.reshape(-1)
    flat_lab = labels.reshape(-1)
    ys = (jnp.arange(ncell, dtype=jnp.int32) // g1)
    xs = (jnp.arange(ncell, dtype=jnp.int32) % g1)

    # component r exists iff some cell has label r (r is the root's own index)
    onehot = (flat_lab[None, :] == jnp.arange(ncell, dtype=jnp.int32)[:, None]) & flat_bin[None, :]
    exists = jnp.any(onehot, axis=1)
    big = jnp.int32(1 << 20)
    ymin = jnp.min(jnp.where(onehot, ys[None], big), axis=1)
    xmin = jnp.min(jnp.where(onehot, xs[None], big), axis=1)
    ymax = jnp.max(jnp.where(onehot, ys[None], -1), axis=1)
    xmax = jnp.max(jnp.where(onehot, xs[None], -1), axis=1)

    # reference clipping: x1 = min(x+w, width-1), mask[y0:y1, x0:x1] = 1
    y1 = jnp.minimum(ymax + 1, gh - 1)
    x1 = jnp.minimum(xmax + 1, gw - 1)

    inbox = ((ys[None, :] >= ymin[:, None]) & (ys[None, :] < y1[:, None])
             & (xs[None, :] >= xmin[:, None]) & (xs[None, :] < x1[:, None]))
    mask = jnp.any(inbox & exists[:, None], axis=0)
    return mask.reshape(g0, g1).astype(jnp.float32)


def box_iou(box_a, box_b):
    """Pairwise IoU of x0y0x1y1 integer boxes (clip/utils.py:40-87
    ``calculate_multiple_iou``): inclusive-pixel areas (+1 convention),
    degenerate pairs scored 0.  Host-side numpy utility."""
    import numpy as np
    a = np.asarray(box_a)[:, None, :].astype(np.float64)   # (na, 1, 4)
    b = np.asarray(box_b)[None, :, :].astype(np.float64)   # (1, nb, 4)
    ix = np.maximum(0, np.minimum(a[..., 2], b[..., 2])
                    - np.maximum(a[..., 0], b[..., 0]) + 1)
    iy = np.maximum(0, np.minimum(a[..., 3], b[..., 3])
                    - np.maximum(a[..., 1], b[..., 1]) + 1)
    inter = ix * iy
    area_a = (a[..., 2] - a[..., 0] + 1) * (a[..., 3] - a[..., 1] + 1)
    area_b = (b[..., 2] - b[..., 0] + 1) * (b[..., 3] - b[..., 1] + 1)
    denom = area_a + area_b - inter
    bad = denom <= 0
    out = inter / np.where(bad, 1.0, denom)
    return np.where(bad, 0.0, out)
