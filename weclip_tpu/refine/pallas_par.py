"""Pallas TPU kernel for PAR mask propagation.

The XLA formulation of PAR's Jacobi update
(masks <- sum_k shift_k(masks) * aff_k, 48 shifts x 20 iterations,
refine/par.py) materializes every shifted copy in HBM — measured at 663 ms
for a (8, 21, 512, 512) eval batch, the single hottest stage of the whole
pipeline.

Design (idiomatic Pallas pipeline):
- grid = (batch, channel_tiles, neighbors) with the neighbor axis innermost:
  the edge-padded masks block and the output block stay resident in VMEM
  across all 48 neighbor steps (revisited blocks), while the per-neighbor
  affinity slabs stream through the automatic double-buffered pipeline,
- each grid step is a single shift-multiply-accumulate: a sublane slice for
  the row offset, a lane roll for the column offset (Mosaic compiles rolls
  orders of magnitude faster than unaligned lane slices),
- one kernel invocation = one Jacobi iteration; the 20-iteration loop and
  the edge re-padding (replicate semantics) run at the XLA level via
  lax.scan, reusing the single compiled kernel.

Per iteration the masks are read/written once and the affinity tensor is
read once per channel tile — HBM traffic drops ~10x versus the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weclip_tpu.core.config import ParConfig
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.refine.par import _OFFSETS, par_affinity

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _step_kernel(dys_ref, dxs_ref, masks_ref, aff_ref, out_ref, band_ref,
                 last_dy_ref, *, d: int, h: int, w_pad: int, n_k: int):
    """One Jacobi update; the accumulator (out_ref) is always fp32, while
    masks/aff/band may be bf16 (the opt-in speed mode — halves the roll and
    stream traffic at ~1e-3 relative error per iteration)."""
    k = pl.program_id(2)
    dy = dys_ref[k]
    dx = dxs_ref[k]

    # dynamic shifts as rolls + static aligned slices (Mosaic cannot prove
    # alignment of dynamic slice offsets; rolls have no such constraint).
    # Shifts arrive sorted by dy, and the row-rolled band persists in scratch
    # across grid steps: 13 distinct row rolls instead of 48.  k==0 also
    # resets the band whenever the (batch, channel-tile) block changes.
    @pl.when((k == 0) | (dy != last_dy_ref[0]))
    def _():
        src = masks_ref[0]                                # (CT, Hp, Wp)
        hp = src.shape[1]
        band_ref[...] = pltpu.roll(src, (-(d + dy)) % hp, 1)[:, 0:h, :]
        last_dy_ref[0] = dy

    wp = band_ref.shape[2]
    shifted = pltpu.roll(band_ref[...], (-(d + dx)) % wp, 2)[:, :, 0:w_pad]
    contrib = (shifted.astype(jnp.float32)
               * aff_ref[0, 0][None].astype(jnp.float32))

    @pl.when(k == 0)
    def _():
        out_ref[0] = contrib

    @pl.when(k > 0)
    def _():
        out_ref[0] += contrib


def _pick_c_tile(c: int, max_tile: int = 10) -> int:
    """Pick the channel tile that minimizes (#tiles, padded channels):
    each extra tile re-streams the whole affinity tensor from HBM, and
    channel padding is pure wasted roll/MAC work.  max_tile bounds VMEM
    (blocks + the stack-allocated full output must fit the scoped limit)."""
    best, best_ct = None, 1
    for ct in range(1, max_tile + 1):
        cp = _round_up(c, ct)
        key = (cp // ct, cp, -ct)
        if best is None or key < best:
            best, best_ct = key, ct
    return best_ct


@functools.partial(jax.jit, static_argnames=("cfg", "c_tile", "interpret",
                                              "compute_dtype"))
def par_refine_pallas(imgs: jax.Array, masks: jax.Array, cfg: ParConfig,
                      c_tile: int | None = None,
                      interpret: bool = False,
                      compute_dtype=jnp.float32) -> jax.Array:
    """Drop-in replacement for refine.par.par_refine (same semantics).

    ``compute_dtype=jnp.bfloat16`` is an opt-in speed mode: masks/affinity
    stream and roll at half the bytes with an fp32 accumulator (reference
    PAR is fp32, so the parity default stays fp32)."""
    if c_tile is None:
        c_tile = _pick_c_tile(masks.shape[1])
    hm, wm = masks.shape[-2], masks.shape[-1]
    if imgs.shape[-2:] != (hm, wm):
        imgs = resize_bilinear(imgs.astype(jnp.float32), hm, wm,
                               align_corners=True)
    aff = par_affinity(imgs.astype(jnp.float32), cfg)         # (B, K, H, W)

    b, c, h, w = masks.shape
    assert h % 8 == 0, "pallas PAR needs 8-aligned height"
    d = max(cfg.dilations)
    # sorted by dy so the kernel's row-band scratch is reused across steps;
    # the affinity slabs are permuted to the same order
    base_shifts = [(dy * dil, dx * dil)
                   for dil in cfg.dilations for (dy, dx) in _OFFSETS]
    perm = sorted(range(len(base_shifts)), key=lambda i: base_shifts[i])
    shifts = [base_shifts[i] for i in perm]
    aff = aff[:, jnp.asarray(perm, jnp.int32)]
    n_k = len(shifts)
    dys = jnp.asarray([s[0] for s in shifts], jnp.int32)
    dxs = jnp.asarray([s[1] for s in shifts], jnp.int32)

    cp = _round_up(c, c_tile)
    if cp != c:
        masks = jnp.pad(masks, [(0, 0), (0, cp - c), (0, 0), (0, 0)])

    w_pad = _round_up(w, _LANE)
    # lane dim must stay 128-aligned for Mosaic; halo is d on the left
    wp = _round_up(2 * d + w_pad, _LANE)
    # the sublane roll (tpu.dynamic_rotate on dim 1) needs an 8-aligned
    # extent; rolling by (d+dy) <= 2d never wraps past h+2d, so bottom
    # padding rows are never read and the 8-alignment pad is semantics-free
    hp = _round_up(h + 2 * d, 8)
    if aff.shape[-1] != w_pad:
        aff = jnp.pad(aff, [(0, 0), (0, 0), (0, 0), (0, w_pad - w)])
    aff = aff.astype(compute_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        # batch OUTERMOST: one kernel launch covers the whole batch per
        # Jacobi iteration.  The earlier lax.map-over-batch design issued
        # B x num_iter pallas calls; measured at bench shapes the kernel
        # itself is ~0.15 ms/iter/image while the per-call XLA glue
        # (dispatch + per-image pad/crop) dominated ~4x over compute.
        grid=(b, cp // c_tile, n_k),
        in_specs=[
            pl.BlockSpec((1, c_tile, hp, wp),
                         lambda bi, ci, ki, dys, dxs: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w_pad),
                         lambda bi, ci, ki, dys, dxs: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_tile, h, w_pad),
                               lambda bi, ci, ki, dys, dxs: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_tile, h, wp), compute_dtype),   # row-rolled band
            pltpu.SMEM((1,), jnp.int32),                  # last dy
        ],
    )
    step = pl.pallas_call(
        functools.partial(_step_kernel, d=d, h=h, w_pad=w_pad, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, h, w_pad), jnp.float32),
        # v5e has 128MB physical VMEM; the default 16MB scoped limit forces
        # tiny channel tiles (more grid steps + one affinity re-stream per
        # tile). Raise it so a whole compacted channel set fits in one tile.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )

    # the true image occupies cols [0, w); anything to the right of it in
    # the padded output is recomputed from replication each iteration, so
    # cropping to w before re-padding keeps replicate semantics exact.
    def one_iter(m, _):
        m_pad = jnp.pad(m, [(0, 0), (0, 0), (d, hp - h - d),
                            (d, wp - d - w)],
                        mode="edge").astype(compute_dtype)
        return step(dys, dxs, m_pad, aff)[..., :w], None

    out, _ = jax.lax.scan(one_iter, masks.astype(jnp.float32), None,
                          length=cfg.num_iter)
    return out[:, :c]
