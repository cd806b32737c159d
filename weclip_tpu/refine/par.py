"""PAR — pixel-adaptive refinement (reference WeCLIP_model/PAR.py).

Semantics reproduced exactly:
- 8 neighbors at dilations (1,2,4,8,12,24) -> 48 neighbors/pixel, replicate
  padding (PAR.py:39-49),
- appearance affinity: softmax over neighbors of
  -(|I_k - I| / (std_k(I) + 1e-8) / w1)^2 averaged over RGB (PAR.py:70-86),
- positional kernel: same form on the dilation-scaled offset distances with
  weight w2 = 0.01 (PAR.py:51-62,83-86),
- 20 Jacobi iterations of masks <- sum_k aff_k * neighbor_k(masks)
  (PAR.py:88-91), run under stop_gradient by callers.

TPU-first notes: neighbor extraction is edge-padded slicing (never a 48x
grouped convolution), the affinity tensor (B,48,H,W) is computed once and
kept, and the propagation is a ``lax.scan`` whose body is a fused
multiply-accumulate over the 48 shifts — nothing materializes the
(B,C,48,H,W) neighbor tensor inside the loop.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core.config import ParConfig
from weclip_tpu.ops.resize import resize_bilinear

# 8-neighbor offsets in the reference's kernel order (PAR.py:10-24):
# (-1,-1) (-1,0) (-1,+1) (0,-1) (0,+1) (+1,-1) (+1,0) (+1,+1)
_OFFSETS: Tuple[Tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
)
# diagonal neighbors carry sqrt(2) positional distance (PAR.py:54-58)
_POS_DIST = (math.sqrt(2), 1.0, math.sqrt(2), 1.0, 1.0,
             math.sqrt(2), 1.0, math.sqrt(2))


def _shift(x: jax.Array, dy: int, dx: int, d: int) -> jax.Array:
    """Edge-replicated shift by (dy*d, dx*d) over the last two axes."""
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(d, d), (d, d)]
    xp = jnp.pad(x, pad, mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, d + dy * d, h, axis=-2),
        d + dx * d, w, axis=-1)


def _pos_kernel(dilations: Sequence[int]) -> np.ndarray:
    return np.asarray([p * d for d in dilations for p in _POS_DIST], np.float32)


def par_affinity(imgs: jax.Array, cfg: ParConfig,
                 order: tuple = None) -> jax.Array:
    """(B, 48, H, W) mixing weights from image appearance + position.

    ``order``: optional permutation of the neighbor axis applied at build
    time (free — it reorders a python list pre-stack) so callers that want
    a sorted shift schedule don't pay a 400 MB gather afterwards.

    The neighbor statistics use one-pass moments instead of materializing
    the (B, 3, n, H, W) neighbor stack (1.2 GB at eval shapes, re-read ~5x
    by the naive formulation — measured 13.5 ms of the PAR prologue's
    20 ms).  Algebraically identical to torch.std's unbiased estimator
    (PAR.py:77); values are O(1) normalized pixels so the one-pass
    variance is numerically safe."""
    dil = cfg.dilations
    n = 8 * len(dil)

    shifted = [_shift(imgs, dy, dx, d)
               for d in dil for (dy, dx) in _OFFSETS]         # n x (B,3,H,W)
    pos = _pos_kernel(dil)                                    # (n,)
    if order is not None:
        shifted = [shifted[i] for i in order]
        pos = pos[list(order)]
    s1 = sum(shifted)
    s2 = sum(sh * sh for sh in shifted)
    mean = s1 / n
    var = jnp.maximum((s2 - n * mean * mean) / (n - 1), 0.0)
    std = jnp.sqrt(var)                                       # (B,3,H,W)
    inv = 1.0 / ((std + 1e-8) * cfg.w1)
    aff = jnp.stack([jnp.mean(-(jnp.abs(sh - imgs) * inv) ** 2, axis=1)
                     for sh in shifted], axis=1)              # (B,n,H,W)
    aff = jax.nn.softmax(aff, axis=1)

    pos_std = float(np.std(pos, ddof=1))                      # constant per config
    pos_aff = -((pos / (pos_std + 1e-8) / cfg.w1) ** 2)
    pos_aff = jax.nn.softmax(jnp.asarray(pos_aff))            # (n,)

    return aff + cfg.w2 * pos_aff[None, :, None, None]


@partial(jax.jit, static_argnames=("cfg",))
def par_refine(imgs: jax.Array, masks: jax.Array, cfg: ParConfig) -> jax.Array:
    """Refine (B, C, Hm, Wm) mask scores guided by (B, 3, H, W) images.

    Matches PAR.forward (PAR.py:64-92): the image is bilinearly resized
    (align_corners=True) to the mask resolution first.
    """
    hm, wm = masks.shape[-2], masks.shape[-1]
    if imgs.shape[-2:] != (hm, wm):
        imgs = resize_bilinear(imgs.astype(jnp.float32), hm, wm, align_corners=True)
    aff = par_affinity(imgs.astype(jnp.float32), cfg)         # (B,n,H,W)

    shifts = [(dy, dx, d) for d in cfg.dilations for (dy, dx) in _OFFSETS]

    def body(m, _):
        acc = jnp.zeros_like(m)
        for k, (dy, dx, d) in enumerate(shifts):
            acc = acc + _shift(m, dy, dx, d) * aff[:, None, k]
        return acc, None

    masks, _ = jax.lax.scan(body, masks.astype(jnp.float32), None,
                            length=cfg.num_iter)
    return masks


def par_refine_auto(imgs: jax.Array, masks: jax.Array, cfg: ParConfig,
                    mesh=None) -> jax.Array:
    """Dispatch to the Pallas kernel on TPU (10x less HBM traffic), the XLA
    formulation elsewhere (CPU tests, odd shapes).

    ``mesh``: the caller's device mesh when the batch is sharded over its
    leading (data) axis.  PAR is embarrassingly batch-parallel and sits
    under stop_gradient, so on a multi-device mesh the per-device impl runs
    under shard_map — Mosaic kernels cannot be auto-partitioned by GSPMD
    (jax raises "wrap the call in a shard_map"), and the XLA fallback costs
    ~10x (PARITY.md floor table: 64.5 vs 663 ms/eval batch).  The global
    batch must divide the data-axis width (every caller guarantees it)."""
    kernel_ok = (jax.default_backend() == "tpu"
                 and masks.shape[-2] % 8 == 0 and masks.shape[-2] >= 64)
    if mesh is not None and mesh.size > 1:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if kernel_ok:
            from weclip_tpu.refine.pallas_par import par_refine_pallas
            impl = lambda i, m: par_refine_pallas(i, m, cfg)
        else:
            impl = lambda i, m: par_refine(i, m, cfg)
        spec = P(mesh.axis_names[0], None, None, None)
        return shard_map(impl, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec, check_vma=False)(imgs, masks)
    from weclip_tpu.core.runtime import pallas_ok
    if kernel_ok and pallas_ok():
        from weclip_tpu.refine.pallas_par import par_refine_pallas
        return par_refine_pallas(imgs, masks, cfg)
    return par_refine(imgs, masks, cfg)
