"""Pallas TPU kernel for PAR mask propagation.

The XLA formulation of PAR's Jacobi update
(masks <- sum_k shift_k(masks) * aff_k, 48 shifts x 20 iterations,
refine/par.py) materializes every shifted copy in HBM — measured at 663 ms
for a (8, 21, 512, 512) eval batch, the single hottest stage of the whole
pipeline.

Design (fully fused — one kernel launch per PAR invocation):
- grid = (batch, channel_tiles, num_iter, neighbors), neighbors innermost:
  the output block (bi, ci) is *revisited* across the entire
  (num_iter x 48) sub-grid, so each Jacobi iteration reads the previous
  iteration's result straight out of VMEM — no XLA-level scan, no
  per-iteration pallas launches (measured ~1.9 ms of launch+pad+crop glue
  per iteration in the launch-per-iteration design), no host-visible
  intermediate at all,
- the replicate edge-padding that used to be a per-iteration XLA
  ``jnp.pad(mode="edge")`` happens in-kernel at the start of each
  iteration: columns via an EXACT one-hot clamp matmul on the MXU
  (0/1 coefficients, fp32 accumulation of a single term per output — free
  at these shapes and sidesteps Mosaic's unaligned-lane-write limits),
  rows via statically aligned sublane broadcasts (the halo d is a multiple
  of 8 whenever max(dilations) is),
- each neighbor step is a shift-multiply-accumulate: dynamic sublane/lane
  rolls (Mosaic compiles rolls orders of magnitude faster than unaligned
  dynamic slices); shifts arrive sorted by dy so the row-rolled band in
  scratch is reused across steps (13 distinct row rolls instead of 48);
  the constant halo offset d is pre-rotated into the pad layout (lanes via
  the clamp matmul's column mapping, sublanes via the concat order) so the
  roll amounts are -dx / -dy alone — the 12 dx == 0 neighbors and the
  dy == 0 band skip their dynamic roll entirely (rolls compose exactly
  mod the extent, so this is bit-identical),
- the per-neighbor affinity slabs stream through the automatic
  double-buffered pipeline.

Per iteration the affinity tensor is read once per channel tile and the
masks never leave VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weclip_tpu.core.config import ParConfig
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.refine.par import _OFFSETS

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(dys_ref, dxs_ref, m0_ref, aff_ref, cmat_ref, out_ref,
                  pad_ref, band_ref, last_dy_ref, *,
                  d: int, h: int, w_pad: int):
    """The whole PAR propagation for one (batch, channel-tile) block.

    Grid axes: (bi, ci, it, k).  out_ref is the revisited accumulator; at
    k == 0 it still holds the previous iteration's result (or is dead on
    it == 0), which is re-padded into pad_ref before the neighbor sweep.
    """
    it = pl.program_id(2)
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        # source of this iteration: initial masks (it 0) or previous
        # result.  Two predicated branches, not a jnp.where — the where
        # read BOTH tensors every iteration (one dead (CT, h, W) load).
        def _repad(src):
            # columns: exact replicate-clamp as a one-hot matmul (cols >= w
            # in src are garbage accumulation lanes; cmat's zero rows drop
            # them).  cmat ALSO pre-rotates the halo offset d into the lane
            # layout (pad[j] = src[clamp(j, ...)] with the wrap block at
            # the top end), so the per-neighbor lane roll amount is -dx
            # alone and the twelve dx == 0 neighbors skip their roll
            # entirely (exact: lane rolls compose additively mod wp).
            cols = jax.lax.dot_general(
                src, cmat_ref[...], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (CT, h, WP)
            ct, _, wp = cols.shape
            hp = pad_ref.shape[1]
            # rows: statically 8-aligned sublane broadcasts (d % 8 == 0).
            # The concat order [cols, bot, top] pre-rotates the halo offset
            # d into the sublane layout the same way
            # (pad2[r] = old_pad[(r+d) % hp]), so the band roll amount is
            # -dy alone and the dy == 0 group reads pad directly (below).
            top = jnp.broadcast_to(cols[:, 0:1, :], (ct, d, wp))
            bot = jnp.broadcast_to(cols[:, h - 1:h, :], (ct, hp - h - d, wp))
            pad_ref[...] = jnp.concatenate([cols, bot, top], axis=1)

        @pl.when(it == 0)
        def _():
            _repad(m0_ref[0].astype(jnp.float32))

        @pl.when(it > 0)
        def _():
            _repad(out_ref[0])

        last_dy_ref[0] = jnp.int32(-(1 << 30))                # force re-band

    dy = dys_ref[k]
    dx = dxs_ref[k]

    # dynamic shifts as rolls (Mosaic cannot prove alignment of dynamic
    # slice offsets; rolls have no such constraint).  Shifts are sorted by
    # dy and the row-rolled band persists in scratch across k.  The dy == 0
    # group never touches band scratch at all — its rows are pad[0:h]
    # as-is (halo pre-rotation), read directly in the accum paths below
    # (saves one full (CT, h, WP) band copy per iteration).
    @pl.when((dy != last_dy_ref[0]) & (dy != 0))
    def _():
        hp = pad_ref.shape[1]
        band_ref[...] = pltpu.roll(pad_ref[...], (-dy) % hp, 1)[:, 0:h, :]
        last_dy_ref[0] = dy

    wp = band_ref.shape[2]
    aff_blk = aff_ref[0, 0][None].astype(jnp.float32)

    def _accum(shifted):
        contrib = shifted * aff_blk

        @pl.when(k == 0)
        def _():
            out_ref[0] = contrib

        @pl.when(k > 0)
        def _():
            out_ref[0] += contrib

    @pl.when(dx == 0)
    def _():
        @pl.when(dy == 0)
        def _():
            _accum(pad_ref[:, 0:h, 0:w_pad])

        @pl.when(dy != 0)
        def _():
            _accum(band_ref[:, :, 0:w_pad])

    @pl.when(dx != 0)
    def _():
        @pl.when(dy == 0)
        def _():
            _accum(pltpu.roll(pad_ref[:, 0:h, :], (-dx) % wp, 2)
                   [:, :, 0:w_pad])

        @pl.when(dy != 0)
        def _():
            _accum(pltpu.roll(band_ref[...], (-dx) % wp, 2)[:, :, 0:w_pad])


def _aff_kernel(posw_ref, img_ref, out_ref, scr_ref, *,
                shifts, d: int, h_t: int, wc: int, n: int, w1: float):
    """Affinity-builder block: one (batch, row-tile) of (K, h_t, wc).

    All 48 shifts are STATIC here (python-unrolled slices of the
    edge-padded image tile in scratch) — unlike the propagation kernel
    above, whose shifts vary per grid step and need dynamic rolls.  The
    accumulation order, op sequence, and scalar constants mirror
    refine.par.par_affinity line by line so the two paths agree to fp32
    reduction-order noise (the only divergence: the softmax sum over K
    is sequential here vs XLA's reduction tree).
    """
    ti = pl.program_id(1)
    # dynamic-but-8-aligned row window (h_t % 8 == 0); static unaligned
    # slices below are fine for Mosaic, dynamic unaligned ones are not
    scr_ref[...] = img_ref[0, :, pl.ds(ti * h_t, h_t + 2 * d), :]

    def sl(dy: int, dx: int) -> jax.Array:
        return scr_ref[:, d + dy:d + dy + h_t, d + dx:d + dx + wc]

    img0 = sl(0, 0)
    # one-pass moments, accumulated in list order like sum(shifted)
    s1 = sl(*shifts[0])
    s2 = s1 * s1
    for (dy, dx) in shifts[1:]:
        sh = sl(dy, dx)
        s1 = s1 + sh
        s2 = s2 + sh * sh
    mean = s1 / n
    var = jnp.maximum((s2 - n * mean * mean) / (n - 1), 0.0)
    inv = 1.0 / ((jnp.sqrt(var) + 1e-8) * w1)

    # logits into the (revisited) output block, tracking the running max
    m = None
    for k, (dy, dx) in enumerate(shifts):
        x = jnp.abs(sl(dy, dx) - img0) * inv
        logit = jnp.mean(-(x * x), axis=0)
        out_ref[0, k] = logit
        m = logit if m is None else jnp.maximum(m, logit)

    ssum = None
    for k in range(n):
        e = jnp.exp(out_ref[0, k] - m)
        out_ref[0, k] = e
        ssum = e if ssum is None else ssum + e
    for k in range(n):
        out_ref[0, k] = out_ref[0, k] / ssum + posw_ref[k]


def par_affinity_pallas(imgs: jax.Array, cfg: ParConfig,
                        order: tuple, w_out: int,
                        interpret: bool = False) -> jax.Array:
    """Fused (B, K, H, w_out) PAR mixing weights (refine.par.par_affinity
    semantics, PAR.py:41-62) in ONE pallas launch.

    The XLA formulation is HBM-bound at ~6 GB of traffic (48 shifted
    streams into the 400 MB logit stack, then 5+ full softmax/add passes
    over it — ~10.9 ms/call at the eval shape); here the image tile stays
    in VMEM, the shifts are register slices, and the affinity is written
    exactly once.  ``w_out`` (>= W, lane-aligned) sizes the output lane
    dim directly to what the propagation kernel streams — columns >= W
    hold finite garbage that the clamp re-pad keeps out of valid outputs,
    exactly like the zero-pad they replace.
    """
    b, _, h, w = imgs.shape
    dil = cfg.dilations
    base_shifts = [(dy * dd, dx * dd) for dd in dil for (dy, dx) in _OFFSETS]
    shifts = [base_shifts[i] for i in order]
    n = len(shifts)
    d = max(dil)

    # positional term: numerically identical to par_affinity's (numpy f32
    # through jax softmax), shipped as scalar-prefetch so the broadcast
    # add rides the single output write instead of its own 800 MB pass
    from weclip_tpu.refine.par import _pos_kernel
    pos = _pos_kernel(dil)[list(order)]
    pos_std = float(np.std(pos, ddof=1))
    pos_aff = jax.nn.softmax(jnp.asarray(-((pos / (pos_std + 1e-8)
                                            / cfg.w1) ** 2)))
    posw = (cfg.w2 * pos_aff).astype(jnp.float32)

    hp = h + 2 * d
    wp = _round_up(w_out + 2 * d, _LANE)
    x = imgs.astype(jnp.float32)
    x = jnp.pad(x, [(0, 0), (0, 0), (d, d), (d, d)], mode="edge")
    if wp != w + 2 * d:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, wp - (w + 2 * d))])

    h_t = next(t for t in (64, 32, 16, 8) if h % t == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // h_t),
        in_specs=[
            pl.BlockSpec((1, 3, hp, wp),
                         lambda bi, ti, posw: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, h_t, w_out),
                               lambda bi, ti, posw: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, h_t + 2 * d, wp), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_aff_kernel, shifts=shifts, d=d, h_t=h_t,
                          wc=w_out, n=n, w1=cfg.w1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h, w_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(posw, x)


def _pick_c_tile(c: int, max_tile: int = 10) -> int:
    """Pick the channel tile that minimizes (#tiles, padded channels):
    each extra tile re-streams the whole affinity tensor from HBM, and
    channel padding is pure wasted roll/MAC work.  max_tile bounds VMEM
    (blocks + scratch must fit the scoped limit)."""
    best, best_ct = None, 1
    for ct in range(1, max_tile + 1):
        cp = _round_up(c, ct)
        key = (cp // ct, cp, -ct)
        if best is None or key < best:
            best, best_ct = key, ct
    return best_ct


def _clamp_matrix(w_pad: int, wp: int, d: int, w: int) -> np.ndarray:
    """(w_pad, wp) one-hot replicate-clamp, pre-rotated by the halo d:
    out[j] = src[clamp(j, 0, w - 1)] for j < wp - d (the left halo lives in
    the wrap block j >= wp - d, where j maps to the negative column j - wp,
    i.e. clamps to src[0]).  Equivalent to rolling the d-left-halo layout
    left by d; the per-neighbor lane roll then needs -dx alone."""
    m = np.zeros((w_pad, wp), np.float32)
    for j in range(wp):
        jj = j if j < wp - d else j - wp
        m[min(max(jj, 0), w - 1), j] = 1.0
    return m


@functools.partial(jax.jit, static_argnames=("cfg", "c_tile", "interpret",
                                              "compute_dtype"))
def par_refine_pallas(imgs: jax.Array, masks: jax.Array, cfg: ParConfig,
                      c_tile: int | None = None,
                      interpret: bool = False,
                      compute_dtype=jnp.float32) -> jax.Array:
    """Drop-in replacement for refine.par.par_refine (same semantics).

    ``compute_dtype=jnp.bfloat16`` narrows the HBM-side input streams
    (initial masks, per-neighbor affinity slabs) to half the bytes; all
    in-VMEM math — roll scratch, MACs, accumulator — stays fp32 (Mosaic
    cannot rotate non-32-bit data, and the kernel is VPU-issue-bound on
    the rolls, so narrowing VMEM would not pay anyway).  Reference PAR is
    fp32, so the parity default stays fp32."""
    if c_tile is None:
        c_tile = _pick_c_tile(masks.shape[1])
    hm, wm = masks.shape[-2], masks.shape[-1]
    if imgs.shape[-2:] != (hm, wm):
        imgs = resize_bilinear(imgs.astype(jnp.float32), hm, wm,
                               align_corners=True)

    b, c, h, w = masks.shape
    assert h % 8 == 0, "pallas PAR needs 8-aligned height"
    d = _round_up(max(cfg.dilations), 8)   # halo: 8-aligned row broadcasts
    # sorted by dy so the kernel's row-band scratch is reused across steps;
    # the affinity is BUILT in that order (a post-hoc gather of the 400 MB
    # tensor measured 2.5 ms/round)
    base_shifts = [(dy * dil, dx * dil)
                   for dil in cfg.dilations for (dy, dx) in _OFFSETS]
    perm = sorted(range(len(base_shifts)), key=lambda i: base_shifts[i])
    shifts = [base_shifts[i] for i in perm]
    n_k = len(shifts)
    dys = jnp.asarray([s[0] for s in shifts], jnp.int32)
    dxs = jnp.asarray([s[1] for s in shifts], jnp.int32)

    cp = _round_up(c, c_tile)
    if cp != c:
        masks = jnp.pad(masks, [(0, 0), (0, cp - c), (0, 0), (0, 0)])

    w_pad = _round_up(w, _LANE)
    # lane dim must stay 128-aligned for Mosaic; halo is d on the left
    wp = _round_up(2 * d + w_pad, _LANE)
    # sublane roll needs an 8-aligned extent; rolling by (d+dy) <= 2d never
    # wraps past h+2d, so the 8-alignment pad rows are semantics-free
    hp = _round_up(h + 2 * d, 8)
    # fused builder emits the lane-padded (B, K, H, w_pad) layout the
    # propagation grid streams — no XLA logit stack, no post-pad pass
    aff = par_affinity_pallas(imgs, cfg, order=tuple(perm), w_out=w_pad,
                              interpret=interpret)
    aff = aff.astype(compute_dtype)
    if w_pad != w:
        # explicit zero columns: block cells outside the array are undefined
        # (cmat's zero rows keep them out of the math either way)
        masks = jnp.pad(masks, [(0, 0), (0, 0), (0, 0), (0, w_pad - w)])
    cmat = jnp.asarray(_clamp_matrix(w_pad, wp, d, w))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, cp // c_tile, cfg.num_iter, n_k),
        in_specs=[
            pl.BlockSpec((1, c_tile, h, w_pad),
                         lambda bi, ci, it, ki, dys, dxs: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, w_pad),
                         lambda bi, ci, it, ki, dys, dxs: (bi, ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_pad, wp),
                         lambda bi, ci, it, ki, dys, dxs: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_tile, h, w_pad),
                               lambda bi, ci, it, ki, dys, dxs: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # roll scratch is ALWAYS fp32: Mosaic has no non-32-bit rotate
            # ("Rotate with non-32-bit data"), so a bf16 band cannot compile
            # on TPU — compute_dtype narrows only the HBM-side streams
            pltpu.VMEM((c_tile, hp, wp), jnp.float32),    # padded source
            pltpu.VMEM((c_tile, h, wp), jnp.float32),     # row-rolled band
            pltpu.SMEM((1,), jnp.int32),                  # last dy
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_kernel, d=d, h=h, w_pad=w_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, h, w_pad), jnp.float32),
        # v5e has 128MB physical VMEM; the default 16MB scoped limit forces
        # tiny channel tiles (more grid steps + one affinity re-stream per
        # tile). Raise it so a whole compacted channel set fits in one tile.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(dys, dxs, masks.astype(compute_dtype), aff, cmat)

    return out[:, :c, :, :w]
