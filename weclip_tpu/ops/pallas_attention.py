"""Pallas TPU attention kernel that fuses softmax, value matmul, AND the
head-averaged attention-map export.

Why a custom kernel: classic flash attention exists to never materialize the
(L, L) attention matrix — but WeCLIP *requires* a head-averaged (L, L) map
from every block (the affinity random walk consumes it, SURVEY §5.7).  The
XLA path materializes the full per-head (B, H, L, L) tensor in HBM and then
reduces over H; this kernel streams per-head attention tiles through VMEM,
accumulates the head sum in the revisited output block, and writes only the
(B, L, L) mean — cutting HBM traffic for the maps by ~H x and fusing the
softmax chain.

Grid: (B, Q_tiles, H) with H innermost, so the attention-mean output block
(b, qt) stays resident in VMEM across the head loop and is accumulated in
place.  K/V for one (batch, head) fit comfortably in VMEM at WeCLIP's
sequence lengths (L <= ~1.2k after padding).

Numerics match ops/attention.py::mha_with_weights (fp32 scores/softmax,
NaN-safe masked rows) — asserted in tests/test_pallas_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weclip_tpu.core import precision
from weclip_tpu.ops.attention import MhaParams


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _q_tile_candidates(l: int) -> set:
    """Query-tile candidates shared by the forward/backward tile picks:
    128-multiples plus *divisor tiles* round_up(ceil(l/k), 16) — sublane
    granularity is 8 (fp32) / 16 (bf16), not 128, so e.g. L=1025 can run
    as 5 tiles of 208 (lp=1040) instead of 3 of 384 (lp=1152).  Keeping
    one candidate set means stream_pad_len-aligned lengths stay pad-free
    through every kernel that picks from it."""
    cands = {128, 256, 384, 512}
    for kdiv in (1, 2, 3, 4, 5, 6):
        cands.add(max(_round_up((l + kdiv - 1) // kdiv, 16), 64))
    return cands


def stream_pad_len(l: int) -> int:
    """Fixed point of the kernel's internal padding: the smallest L' >= l
    with ``_round_up(L', _pick_q_tile(L')) == L'``.

    The frozen backbone pads its residual stream ONCE to this length so
    every per-layer kernel invocation (12 layers x fwd, plus the GradCAM
    pullback's fwd+bwd) sees an already-aligned sequence and skips its
    q/k/v pad copies and output slices (~8 ms/round of HBM glue at eval
    shapes, xprof r3).  Invalid tokens are masked exactly like the padded
    grid's (weclip_tpu/models/clip/vit.py docstring)."""
    lp = max(l, 16)
    for _ in range(8):
        nlp = _round_up(lp, _pick_q_tile(lp))
        if nlp == lp:
            return lp
        lp = nlp
    return lp


def pad_stream(x: jax.Array, valid: Optional[jax.Array]):
    """Pad a (B, L, D) token stream (and its (B, L) valid mask) once to
    ``stream_pad_len(L)`` so downstream kernel calls run pad-free.

    The single owner of the alignment contract — used by the frozen
    backbone (vit.vision_forward_frozen) and the decoder
    (models/heads.py::decoder_forward).  Pad tokens are ordinary
    masked-invalid tokens; callers slice outputs back to L.  Returns
    ``(x, valid, L)``; ``valid=None`` stays None when no padding is
    needed, otherwise a full (B, L') bool mask is built (all callers
    need the batch dim — a (1, L') mask would be mis-indexed by the
    kernel's per-batch mask BlockSpec)."""
    b, l = x.shape[0], x.shape[1]
    ls = stream_pad_len(l)
    if ls == l:
        return x, valid, l
    x = jnp.pad(x, [(0, 0), (0, ls - l), (0, 0)])
    if valid is None:
        valid = jnp.broadcast_to(jnp.arange(ls)[None, :] < l, (b, ls))
    else:
        valid = jnp.pad(valid.astype(bool), [(0, 0), (0, ls - l)])
    return x, valid, l


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, attn_ref=None, *,
                 n_heads: int, scale: float, score_dtype=jnp.bfloat16,
                 head_axis: int = 2):
    # out_ref may be a narrower dtype than the fp32 accumulator (the store
    # is rounded once — numerically identical to the fp32-store + consumer
    # astype it replaces, at half the HBM write traffic).
    # head_axis: which grid axis walks heads — 2 (innermost) on the export
    # path so the head-mean accumulator block stays resident, 1 on the
    # no-export path so q-tiles are innermost and the K/V blocks are
    # fetched once per (b, h) instead of once per (b, h, q_tile).
    h = pl.program_id(head_axis)
    # bf16 score inputs with fp32 accumulation — matches the XLA path's
    # compute policy (the reference's fp16 inputs are comparable) and runs
    # the MXU at full rate
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(score_dtype)
    k = k_ref[0, 0].astype(score_dtype)                  # (L, Dh)
    v = v_ref[0, 0].astype(score_dtype)                  # (L, Dh)
    kbias = mask_ref[0]                                  # (1, L) fp32: 0 valid,
                                                         # -1e30 masked

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, L) fp32
    # additive mask: |scores| << ulp(1e30), so scores + (-1e30) rounds to
    # exactly -1e30 — bit-identical to the where(-1e30) select it replaces
    # at one VPU add instead of two compare+selects; exp underflows masked
    # entries to exact 0.0, so no post-exp re-mask is needed either
    scores = scores + kbias
    neg = jnp.float32(-1e30)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.maximum(smax, neg * 0.5)                  # all-masked row guard
    ex = jnp.exp(scores - smax)
    recip = 1.0 / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-30)

    if attn_ref is None:        # no-export variant (seg-only forwards)
        # normalize AFTER the value matmul: an (TQ, Dh) multiply replaces
        # the (TQ, L) one — L/Dh (~18x) fewer fp32 VPU ops, same softmax
        # up to one bf16 rounding (ex vs ex/denom rounds at the same
        # relative precision; the sum is linear in the scale)
        ov = jax.lax.dot_general(
            ex.astype(score_dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[0, 0] = (ov * recip).astype(out_ref.dtype)
        return

    attn = ex * recip                                    # (TQ, L) fp32

    out_ref[0, 0] = jax.lax.dot_general(
        attn.astype(score_dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @pl.when(h == 0)
    def _():
        attn_ref[0] = attn

    @pl.when(h > 0)
    def _():
        attn_ref[0] += attn

    @pl.when(h == n_heads - 1)
    def _():
        attn_ref[0] = attn_ref[0] * (1.0 / n_heads)


def _pick_q_tile(l: int) -> int:
    """Pick the query tile minimizing (tile_count, padded_length, -tile):
    fewer q-tiles means fewer per-tile K/V re-fetches (the dominant DMA
    cost on the export path — see the inline comment), padded rows are
    wasted score/softmax work (secondary), and the largest tile wins ties
    (measured differences within a count/padding class are small —
    6.7-8.7 ms across 128..512 at B16/L1025 on v5e).

    Candidates come from _q_tile_candidates (divisor tiles give e.g. 10%
    fewer softmax rows and ~18% fewer exported-map cells at L=1025; the
    lane dimension pads to 128-granule register tiles either way).  VMEM
    bound: ~5 live fp32 (qt, lp) tile temporaries (scores/ex/attn + export
    block + slack) capped at ~10 MB => qt*lp <= 500k."""
    best, best_qt = None, 128
    for qt in sorted(_q_tile_candidates(l)):
        lp = _round_up(l, qt)
        # (600k admitting 2 tiles of 528 at L=1025 measured neutral vs 3 of
        # 352 — 53.88 vs 53.89 — so the cap stays at the r3 calibration)
        if qt * lp > 500_000:
            continue
        # tile COUNT first: on the export path (h innermost) the (lp, dh)
        # K/V blocks are re-fetched once per q-tile, and with bf16 K/V the
        # kernel is near DMA-bound (~0.32 us K/V vs ~0.47 us/step at
        # L=1040) — 3 tiles of 352 (lp 1056, +1.5% padded rows) beats 5
        # of 208 (lp 1040) by 40% of that traffic.  Padding stays the
        # tiebreaker within equal counts.
        key = (lp // qt, lp, -qt)
        if best is None or key < best:
            best, best_qt = key, qt
    return best_qt


@functools.partial(jax.jit, static_argnames=("n_heads", "q_tile",
                                              "interpret", "score_dtype",
                                              "export_weights", "out_dtype"))
def attention_core_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                          kmask: jax.Array, n_heads: int,
                          q_tile: Optional[int] = None,
                          interpret: bool = False,
                          score_dtype=jnp.bfloat16,
                          export_weights: bool = True,
                          out_dtype=jnp.float32,
                          ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """q, k, v: (B, H, L, Dh) fp32;  kmask: (B, L) float {0,1}.

    Returns (out (B, H, L, Dh) fp32, attn_mean (B, L, L) fp32).  L is padded
    internally to a multiple of q_tile; padded keys are masked out and padded
    query rows produce garbage that callers mask (they already do: every
    consumer multiplies by the validity mask).

    ``export_weights=False`` drops the attention-map output entirely
    (attn_mean returns None): seg-only forwards (eval scale-2, the val
    short-circuit) skip the per-head map accumulation and its HBM writes.
    """
    b, h, l, dh = q.shape
    if q_tile is None:
        q_tile = _pick_q_tile(l)
    lp = _round_up(l, q_tile)
    if lp != l:
        pad = [(0, 0), (0, 0), (0, lp - l), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kmask = jnp.pad(kmask, [(0, 0), (0, lp - l)])
    # additive score bias: 0 for valid keys, -1e30 for masked (see kernel)
    kmask2 = ((kmask.astype(jnp.float32) - 1.0) * 1e30)[:, None, :]

    scale = dh ** -0.5

    if export_weights:
        # heads INNERMOST: the (b, qt) head-mean accumulator block stays
        # resident in VMEM across the head sweep
        grid = (b, lp // q_tile, h)
        head_axis = 2
        qkv_idx = lambda bi, qt, hi: (bi, hi, qt, 0)
        kv_idx = lambda bi, qt, hi: (bi, hi, 0, 0)
        mask_idx = lambda bi, qt, hi: (bi, 0, 0)
    else:
        # q-tiles INNERMOST (no accumulator constraint): the (lp, dh) K/V
        # blocks' index map is constant along qt, so Mosaic fetches them
        # once per (b, h) instead of once per (b, h, q_tile) — the kernel
        # is K/V-DMA-bound at these shapes (L~1k, Dh=64: ~0.65 us of K/V
        # per step vs ~0.28 us of MXU work), exactly the layout the
        # rectangular CTI kernel below already uses
        grid = (b, h, lp // q_tile)
        head_axis = 1
        qkv_idx = lambda bi, hi, qt: (bi, hi, qt, 0)
        kv_idx = lambda bi, hi, qt: (bi, hi, 0, 0)
        mask_idx = lambda bi, hi, qt: (bi, 0, 0)

    out_specs = [
        pl.BlockSpec((1, 1, q_tile, dh), qkv_idx, memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((b, h, lp, dh), out_dtype)]
    if export_weights:
        out_specs.append(pl.BlockSpec((1, q_tile, lp),
                                      lambda bi, qt, hi: (bi, qt, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, lp, lp), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_attn_kernel, n_heads=h, scale=scale,
                          score_dtype=score_dtype, head_axis=head_axis),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, dh), qkv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp, dh), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp, dh), kv_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lp), mask_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, kmask2)

    if not export_weights:
        return res[0][:, :, :l], None
    out, attn = res
    return out[:, :, :l], attn[:, :l, :l]


def mha_with_weights_pallas(
    x: jax.Array,
    p: MhaParams,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
    interpret: bool = False,
    want_weights: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in replacement for ops.attention.mha_with_weights using the
    Pallas core (projections stay XLA einsums — they are single MXU matmuls)."""
    b, l, d = x.shape
    hd = d // n_heads
    cd = policy.compute_dtype
    xc = x.astype(cd)
    # qkv materializes in the compute dtype: the dot EMITS cd directly (the
    # MXU still accumulates fp32; only the HBM store is rounded) and the
    # bias is added in cd — under bf16 this removes a standalone fp32
    # rounding read+write pass (~227 MB/layer, ~3 ms/round measured) and
    # matches the reference's fp16 GEMM epilogue; under fp32 it is
    # identical.  The packed projection is indexed on a leading axis — XLA
    # fuses the slices, where jnp.split on the feature axis copied all three
    w3 = p.in_w.reshape(3, d, d)
    b3 = p.in_b.reshape(3, d)
    qkv = (jnp.einsum("bld,ted->tble", xc, w3.astype(cd),
                      preferred_element_type=cd)
           + b3[:, None, None, :].astype(cd))
    q, k, v = qkv[0], qkv[1], qkv[2]

    def heads(t):
        return t.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    kmask = (valid.astype(jnp.float32) if valid is not None
             else jnp.ones((b, l), jnp.float32))
    # the kernel stores its output directly in cd (the only consumer is the
    # cd out-projection below — single rounding either way, half the bytes)
    out, attn_mean = attention_core_pallas(heads(q), heads(k), heads(v),
                                           kmask, n_heads,
                                           interpret=interpret,
                                           score_dtype=policy.compute_dtype,
                                           export_weights=want_weights,
                                           out_dtype=cd)
    # the out-projection contracts (h, dh) directly from the kernel's
    # (B, H, L, Dh) layout — out_w[e, h*hd+dh] == w_o[e, h, dh] (heads are
    # the major sub-axis of the packed feature dim), so this is the same
    # GEMM without the explicit head-merge transpose copy
    w_o = p.out_w.reshape(d, n_heads, hd).astype(cd)
    out = jnp.einsum("bhld,ehd->ble", out.astype(cd), w_o,
                     preferred_element_type=cd)
    out = out + p.out_b.astype(cd)
    if valid is not None:
        qmask = valid.astype(bool)
        out = jnp.where(qmask[..., None], out, jnp.zeros((), out.dtype))
        if attn_mean is not None:
            attn_mean = jnp.where(qmask[:, :, None], attn_mean, 0.0)
    return out.astype(x.dtype), attn_mean


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, mask_ref,
                     dq_ref, dk_ref, dv_ref, *, score_dtype=jnp.bfloat16):
    """Flash-style self-attention backward tile: recomputes the softmax in
    VMEM and emits dQ for this q-tile plus dK/dV partials accumulated across
    the q sweep (grid (B, H, Q_tiles), q-tiles innermost so the K/V input
    blocks and dK/dV output blocks stay resident per (b, h))."""
    qt = pl.program_id(2)
    q = q_ref[0, 0]                                      # (TQ, Dh) pre-scaled
    k = k_ref[0, 0]                                      # (L, Dh)
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)                # (TQ, Dh)
    kbias = mask_ref[0]                                  # (1, L) additive bias

    qs = q.astype(score_dtype)
    ks = k.astype(score_dtype)
    scores = jax.lax.dot_general(
        qs, ks, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, L)
    # additive mask + exact exp underflow — see _attn_kernel
    scores = scores + kbias
    neg = jnp.float32(-1e30)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.maximum(smax, neg * 0.5)
    ex = jnp.exp(scores - smax)
    p = ex * (1.0 / jnp.maximum(jnp.sum(ex, axis=-1, keepdims=True), 1e-30))

    dp = jax.lax.dot_general(
        do.astype(score_dtype), v.astype(score_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, L)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)      # (TQ, 1)
    ds = p * (dp - delta)                                # (TQ, L) fp32

    dq_ref[0, 0] = jax.lax.dot_general(
        ds.astype(score_dtype), ks, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (TQ, Dh)
    dkc = jax.lax.dot_general(
        ds.astype(score_dtype), qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (L, Dh)
    dvc = jax.lax.dot_general(
        p.astype(score_dtype), do.astype(score_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (L, Dh)

    @pl.when(qt == 0)
    def _():
        dk_ref[0, 0] = dkc
        dv_ref[0, 0] = dvc

    @pl.when(qt > 0)
    def _():
        dk_ref[0, 0] += dkc
        dv_ref[0, 0] += dvc


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret",
                                              "score_dtype"))
def attention_bwd_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                         do: jax.Array, kmask: jax.Array,
                         q_tile: Optional[int] = None,
                         interpret: bool = False,
                         score_dtype=jnp.bfloat16):
    """Attention backward: q (pre-scaled), do (B, H, Lq, Dh) fp32; k, v
    (B, H, Lk, Dh); kmask (B, Lk) -> (dq, dk, dv) fp32 w.r.t. the pre-scaled
    q.  Rectangular (Lq != Lk) shapes serve the CoMer CTI backward; the
    square case serves the GradCAM pullback.  Never materializes an
    (Lq, Lk) tensor in HBM — the fp32 softmax/ds chain lives in VMEM per
    q-tile (the XLA vjp wrote ~5 full (B, H, Lq, Lk) fp32 HBM temporaries)."""
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    # 16-granule K padding (not 128): sublane granularity suffices for the
    # (Lk, Dh) K/V blocks, and the forward kernel already runs divisor-tile
    # lane widths like 1040 for the (TQ, Lk) temporaries.  This keeps
    # stream_pad_len-aligned sequences pad-free through the backward too.
    lkp = _round_up(lk, 16)
    if q_tile is None:
        # ~4 live fp32 (TQ, Lk) temporaries (scores/p/dp/ds); cap at 12 MB.
        # Shared candidate set (_q_tile_candidates) keeps stream_pad_len-
        # aligned lengths (e.g. 1040 = 5 x 208) pad-free here too.
        best = None
        for qt in sorted(_q_tile_candidates(lq)):
            if 4 * qt * lkp * 4 > 12 * 2 ** 20 and qt != 128:
                continue
            key = (_round_up(lq, qt), -qt)
            if best is None or key < best:
                best, q_tile = key, qt
    lqp = _round_up(lq, q_tile)
    if lqp != lq:
        qpad = [(0, 0), (0, 0), (0, lqp - lq), (0, 0)]
        q = jnp.pad(q, qpad)
        do = jnp.pad(do, qpad)
    if lkp != lk:
        kpad = [(0, 0), (0, 0), (0, lkp - lk), (0, 0)]
        k = jnp.pad(k, kpad)
        v = jnp.pad(v, kpad)
        kmask = jnp.pad(kmask, [(0, 0), (0, lkp - lk)])
    kmask2 = ((kmask.astype(jnp.float32) - 1.0) * 1e30)[:, None, :]

    grid = (b, h, lqp // q_tile)
    qspec = pl.BlockSpec((1, 1, q_tile, dh), lambda bi, hi, qt: (bi, hi, qt, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, lkp, dh), lambda bi, hi, qt: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, score_dtype=score_dtype),
        grid=grid,
        in_specs=[qspec, kvspec, kvspec, qspec,
                  pl.BlockSpec((1, 1, lkp), lambda bi, hi, qt: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, dh), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, lkp, dh), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, lkp, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, kmask2)
    return dq[:, :, :lq], dk[:, :, :lk], dv[:, :, :lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def attention_core_diff(q, k, v, kmask, n_heads, score_dtype, interpret=False):
    """Differentiable fused attention core: Pallas forward (with the
    head-mean map export) + Pallas flash-style backward.

    q, k, v: (B, H, L, Dh) fp32 UNscaled; kmask (B, L).  Returns
    (out (B, H, L, Dh) fp32, attn_mean (B, L, L) fp32).

    The attn_mean output is NOT differentiable — the backward assumes its
    cotangent is zero (GradCAM exports it via has_aux / stop_gradient;
    asserting this at trace time is impossible).  Serves the vjp-GradCAM
    pullback, where the XLA attention forward+backward materialized
    multiple fp32 (B, H, L, L) HBM temporaries per class seed.
    """
    return attention_core_pallas(q, k, v, kmask, n_heads,
                                 interpret=interpret, score_dtype=score_dtype,
                                 export_weights=True)


def _acd_fwd(q, k, v, kmask, n_heads, score_dtype, interpret=False):
    out = attention_core_pallas(q, k, v, kmask, n_heads, interpret=interpret,
                                score_dtype=score_dtype, export_weights=True)
    return out, (q, k, v, kmask)


def _acd_bwd(n_heads, score_dtype, interpret, res, g):
    g_out, _g_attn_assumed_zero = g
    q, k, v, kmask = res
    scale = q.shape[-1] ** -0.5
    dq, dk, dv = attention_bwd_pallas(q * scale, k, v, g_out, kmask,
                                      interpret=interpret,
                                      score_dtype=score_dtype)
    return dq * scale, dk, dv, jnp.zeros_like(kmask)


attention_core_diff.defvjp(_acd_fwd, _acd_bwd)


def mha_with_weights_fused(
    x: jax.Array,
    p: MhaParams,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Differentiable drop-in for ops.attention.mha_with_weights backed by
    the Pallas core in BOTH directions (projections stay XLA einsums, which
    JAX differentiates exactly).  The attention-map output must only be
    consumed under stop_gradient/has_aux (see attention_core_diff)."""
    b, l, d = x.shape
    hd = d // n_heads
    cd = policy.compute_dtype
    xc = x.astype(cd)
    w3 = p.in_w.reshape(3, d, d)
    b3 = p.in_b.reshape(3, d)
    qkv = (jnp.einsum("bld,ted->tble", xc, w3.astype(cd),
                      preferred_element_type=cd)
           + b3[:, None, None, :].astype(cd))

    def heads(t):
        return t.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    kmask = (valid.astype(jnp.float32) if valid is not None
             else jnp.ones((b, l), jnp.float32))
    out, attn_mean = attention_core_diff(
        heads(qkv[0]).astype(jnp.float32), heads(qkv[1]).astype(jnp.float32),
        heads(qkv[2]).astype(jnp.float32), kmask, n_heads, cd, interpret)
    # contract (h, dh) straight from the kernel layout (see
    # mha_with_weights_pallas) — jax differentiates the einsum exactly
    w_o = p.out_w.reshape(d, n_heads, hd).astype(cd)
    out = jnp.einsum("bhld,ehd->ble", out.astype(cd), w_o,
                     preferred_element_type=cd)
    out = out + p.out_b.astype(cd)
    if valid is not None:
        qmask = valid.astype(bool)
        out = jnp.where(qmask[..., None], out, 0.0)
        attn_mean = jnp.where(qmask[:, :, None], attn_mean, 0.0)
    return out.astype(x.dtype), attn_mean


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret",
                                              "score_dtype"))
def cross_attention_core_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                                kmask: jax.Array,
                                q_tile: Optional[int] = None,
                                interpret: bool = False,
                                score_dtype=jnp.bfloat16) -> jax.Array:
    """Rectangular (Lq != Lk) fused attention, no map export.

    q: (B, H, Lq, Dh) pre-scaled; k, v: (B, H, Lk, Dh); kmask: (B, Lk).
    Returns (B, H, Lq, Dh) fp32.  Serves the CoMer CTI cross-attention,
    whose XLA formulation materialized fp32 (B, H, Lq, Lk) score tensors
    three times per stage (~131 ms/round of HBM traffic at eval shapes).
    """
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    lkp = _round_up(lk, 128)
    if q_tile is None:
        # VMEM-aware tile pick: the kernel keeps ~3 fp32 (TQ, Lk) softmax
        # temporaries live (scores/ex/attn) plus double-buffered K/V; the
        # scoped-VMEM limit is ~24.25 MB and TQ=256 at Lk=5376 measured
        # 24.65 MB (compile OOM) — cap the score working set at 12 MB and
        # break ties by least padding, largest tile.  Candidates shared
        # with the self-attention picks (_q_tile_candidates).
        best = None
        for qt in sorted(_q_tile_candidates(lq)):
            if 3 * qt * lkp * 4 > 12 * 2 ** 20 and qt != 128:
                continue
            key = (_round_up(lq, qt), -qt)
            if best is None or key < best:
                best, q_tile = key, qt
    lqp = _round_up(lq, q_tile)
    if lqp != lq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lqp - lq), (0, 0)])
    if lkp != lk:
        kv_pad = [(0, 0), (0, 0), (0, lkp - lk), (0, 0)]
        k = jnp.pad(k, kv_pad)
        v = jnp.pad(v, kv_pad)
        kmask = jnp.pad(kmask, [(0, 0), (0, lkp - lk)])
    kmask2 = ((kmask.astype(jnp.float32) - 1.0) * 1e30)[:, None, :]

    # grid: q-tiles INNERMOST (unlike the self-attention kernel, which needs
    # h innermost to accumulate the head-mean export) so the (Lk, Dh) K/V
    # blocks stay VMEM-resident across the whole q sweep of one (b, h)
    grid = (b, h, lqp // q_tile)
    res = pl.pallas_call(
        functools.partial(_attn_kernel, n_heads=h, scale=1.0,
                          score_dtype=score_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_tile, dh),
                         lambda bi, hi, qt: (bi, hi, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp, dh),
                         lambda bi, hi, qt: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp, dh),
                         lambda bi, hi, qt: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lkp),
                         lambda bi, hi, qt: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, q_tile, dh),
                                lambda bi, hi, qt: (bi, hi, qt, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, h, lqp, dh), jnp.float32)],
        interpret=interpret,
    )(q, k, v, kmask2)
    return res[0][:, :, :lq]
