"""Batched msc-flip TTA evaluation — the reference's per-image Python loop
(test_msc_flip_voc.py:32-113) as three jitted, batched XLA programs.

Program 1 (scale 1.0): flip-concatenated backbone+heads forward, the full
CAM -> walk -> PAR pseudo-label chain (unflipped halves only — the reference
computes CAMs for the flipped copies too but discards them,
test_msc_flip_voc.py:69-71), original-resolution CAM labels on a fixed
canvas via host-built clamp-resize operators.

Program 2 (scale 0.75): seg-only flip-averaged forward (the reference runs
the CAM chain here as well and throws the result away, :84 — we skip the
dead work; outputs are identical).

Program 3: combine scales, upsample to original resolution, argmax, and
update the three streaming confusion matrices (single / msc / cam) on
device.

Every image size compiles to the same programs: validity masks handle the
token grid, per-image interpolation matrices handle the resolution changes,
and clamp-style operators make PAR's replicate padding exact on the canvas
(see weclip_tpu/evalx/operators.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.models import weclip
from weclip_tpu.models.clip import vit
from weclip_tpu.refine import affinity as aff


class ScaleBatch(NamedTuple):
    """Inputs for one TTA scale.

    ``img`` is the ORIGINAL image as uint8 on the output canvas (shared by
    both scales — one small host->device transfer per batch); the engine
    normalizes and resizes it to the scale's canvas on device.  The axon
    tunnel ships ~86 MB/s: shipping resized fp32 canvases (the r2 design)
    cost ~600 ms/round of transfer; raw uint8 originals cost ~1/6 of that.
    """
    img: jax.Array          # (B, Co, Co, 3) uint8 original on the out canvas
    # HWC, not CHW: the host stages each raw image as one contiguous row
    # copy plus pad-region-only zeroing (3.3x cheaper than the strided
    # HWC->CHW scatter on this 1-core host — tools/profile_hostprep.py);
    # the device transposes inside prepare_scale1_images where XLA fuses
    # it into the normalize for free.
    pos_emb: jax.Array      # (B, L, D)
    valid: jax.Array        # (B, L)
    gh: jax.Array           # (B,)
    gw: jax.Array           # (B,)
    w_px: jax.Array         # (B,) valid image width in PIXELS at this
    # scale.  The reference flips the resized image *before* patch
    # extraction (test_msc_flip_voc.py:68: inputs.flip(-1)); when the width
    # is not a multiple of the patch size the flipped patch grid samples
    # different pixels than a flipped grid would, so the flip must cover
    # w_px columns, not gw*patch.


class EvalSizes(NamedTuple):
    """Per-image true sizes — the resize operators are built on device from
    these (evalx/operators.py::device_resize_matrix), so the host ships six
    ints per image instead of megabytes of interpolation matrices."""
    oh: jax.Array           # (B,) original height
    ow: jax.Array           # (B,) original width
    h1: jax.Array           # (B,) scale-1 input pixels
    w1: jax.Array           # (B,)
    h2: jax.Array           # (B,) scale-2 input pixels
    w2: jax.Array           # (B,)


def _dev_ops_cam(sizes: EvalSizes, canvas_out: int, grid1: int, patch: int):
    from weclip_tpu.evalx.operators import device_resize_matrix as drm

    def per_image(oh, ow, h1, w1):
        return (drm(h1 // patch, oh, canvas_out, grid1),
                drm(w1 // patch, ow, canvas_out, grid1))

    return jax.vmap(per_image)(sizes.oh, sizes.ow, sizes.h1, sizes.w1)


def _dev_ops_img(sizes: EvalSizes, canvas_out: int, canvas_in1: int):
    from weclip_tpu.evalx.operators import device_resize_matrix as drm

    def per_image(oh, ow, h1, w1):
        return (drm(h1, oh, canvas_out, canvas_in1, align_corners=True),
                drm(w1, ow, canvas_out, canvas_in1, align_corners=True))

    return jax.vmap(per_image)(sizes.oh, sizes.ow, sizes.h1, sizes.w1)


def _dev_ops_s2(sizes: EvalSizes, grid1: int, grid2: int, patch: int):
    from weclip_tpu.evalx.operators import device_resize_matrix as drm

    def per_image(h1, w1, h2, w2):
        return (drm(jnp.maximum(h2 // patch, 1), h1 // patch, grid1, grid2),
                drm(jnp.maximum(w2 // patch, 1), w1 // patch, grid1, grid2))

    return jax.vmap(per_image)(sizes.h1, sizes.w1, sizes.h2, sizes.w2)


def prepare_scale1_images(img_u8: jax.Array, sizes: EvalSizes, cfg: Config,
                          canvas_in1: int) -> jax.Array:
    """uint8 originals -> normalized fp32 scale-1 canvases, on device.

    Matches the reference order exactly: dataset normalization
    (transforms.py:8-15, ImageNet stats on 0..255) THEN bilinear resize to
    the resize-long target (test_msc_flip_voc.py:60-63, F.interpolate
    align_corners=False == the half-pixel mapping of device_resize_matrix).
    """
    from weclip_tpu.evalx.operators import device_resize_matrix as drm
    # img_u8 arrives HWC (cheap host staging; see ScaleBatch.img) — the
    # transpose to NCHW fuses into the convert/normalize on device.
    mean = jnp.asarray(cfg.dataset.mean, jnp.float32)[None, :, None, None]
    std = jnp.asarray(cfg.dataset.std, jnp.float32)[None, :, None, None]
    canvas_out = img_u8.shape[1]
    x = (img_u8.transpose(0, 3, 1, 2).astype(jnp.float32) - mean) / std
    mh = jax.vmap(lambda o, t: drm(o, t, canvas_in1, canvas_out))(
        sizes.oh, sizes.h1)
    mw = jax.vmap(lambda o, t: drm(o, t, canvas_in1, canvas_out))(
        sizes.ow, sizes.w1)
    return _resize_pair(x, mh, mw)


def prepare_scale2_images(imgs1: jax.Array, sizes: EvalSizes, scale: float,
                          canvas_in2: int) -> jax.Array:
    """Scale-1 canvases -> 0.75-scale canvases with torch scale_factor
    coordinate mapping (the reference resizes from the already-resized
    tensor, test_msc_flip_voc.py:81)."""
    from weclip_tpu.evalx.operators import device_scale_matrix as dsm
    canvas_in1 = imgs1.shape[-1]
    mh = jax.vmap(lambda i, o: dsm(i, o, scale, canvas_in2, canvas_in1))(
        sizes.h1, sizes.h2)
    mw = jax.vmap(lambda i, o: dsm(i, o, scale, canvas_in2, canvas_in1))(
        sizes.w1, sizes.w2)
    return _resize_pair(imgs1, mh, mw)


def _flip_valid(x: jax.Array, w_valid: jax.Array, axis: int) -> jax.Array:
    """Horizontal flip *within* the valid region of a padded axis."""
    size = x.shape[axis]
    return jnp.roll(jnp.flip(x, axis), w_valid - size, axis)


def _resize_pair(grid: jax.Array, mh: jax.Array, mw: jax.Array) -> jax.Array:
    """(B, C, Gh, Gw) x (B, Oh, Gh) x (B, Ow, Gw) -> (B, C, Oh, Ow)."""
    y = jnp.einsum("bog,bcgh->bcoh", mh, grid,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("bph,bcoh->bcop", mw, y,
                      precision=jax.lax.Precision.HIGHEST)


def make_eval_scale1(cfg: Config, policy: precision.Policy = precision.DEFAULT,
                     with_cam: bool = True, max_classes: int = None,
                     prep=None, mesh=None):
    """Returns jitted fn: (params, frozen, sb, present, ops, cls_idx,
    cls_active) -> (seg_single (B,K,G,G), seg_flipavg (B,K,G,G),
    cam_labels (B,Hc,Wc)).

    ``max_classes`` compacts the per-class work (CAM pullbacks, walk, PAR
    channels) to a static bucket of *present* classes per image — exactly
    the classes the reference iterates over (clip_tool.py:139) — instead of
    all C_fg.  cls_idx (B, MC) holds the class ids, cls_active their
    validity."""
    canvas_out, grid1 = prep.canvas_out, prep.grid1
    patch = cfg.clip.patch_size

    @jax.jit
    def run(params, frozen, sb: ScaleBatch, present_mask, sizes: EvalSizes,
            cls_idx, cls_active):
        b = sb.img.shape[0]
        g = prep.canvas_in1 // cfg.clip.patch_size
        # uint8 originals -> normalized scale-1 canvases, on device
        imgs1 = prepare_scale1_images(sb.img, sizes, cfg, prep.canvas_in1)
        # flip-concatenated forward (test_msc_flip_voc.py:68) — the flip
        # covers the full valid image width in pixels (see ScaleBatch.w_px)
        img_f = jax.vmap(lambda x, w: _flip_valid(x, w, 1))(
            imgs1.transpose(0, 2, 3, 1), sb.w_px).transpose(0, 3, 1, 2)
        batch2 = weclip.Batch(
            img=jnp.concatenate([imgs1, img_f]),
            pos_emb=jnp.concatenate([sb.pos_emb, sb.pos_emb]),
            valid=jnp.concatenate([sb.valid, sb.valid]),
            gh=jnp.concatenate([sb.gh, sb.gh]),
            gw=jnp.concatenate([sb.gw, sb.gw]),
            present_mask=jnp.concatenate([present_mask, present_mask]),
        )
        feats, head_out, attn_pred, _ = weclip.backbone_and_heads(
            params, frozen, batch2, cfg, None, policy,
            with_attn=with_cam,       # seg-only mode skips the map export
            attn_rows=b,              # flipped half's maps are never used
            decoder_pallas=True)      # gradient-free: fused decoder is safe

        k = cfg.dataset.num_classes
        seg = head_out.seg.reshape(2 * b, g, g, k).transpose(0, 3, 1, 2)
        seg_u, seg_fl = seg[:b], seg[b:]
        seg_fl = jax.vmap(lambda x, w: _flip_valid(x, w, 2))(seg_fl, sb.gw)
        seg_avg = (seg_u + seg_fl) / 2.0                       # (B,K,G,G)

        if not with_cam:
            cam_labels = jnp.zeros((b, canvas_out, canvas_out), jnp.int32)
            return seg_u, seg_avg, cam_labels

        # ---- pseudo-label chain on the unflipped half ---------------------
        # the chain itself is the SHARED weclip.pseudo_label_chain (one
        # parity surface for train + eval); only the fusion gating and the
        # grid -> canvas upsample differ here
        feats_u = vit.VisionFeatures(feats.layer_tokens[:, :b],
                                     feats.layer_attn[:, :b],
                                     feats.valid[:b])
        valid_p = sb.valid[:, 1:].astype(jnp.float32)

        def fuse(attn_last):
            # mode == 'val' always gates by the learned affinity
            # (model_attn_aff_voc.py:146)
            return aff.fuse_attention_gated(
                feats_u.layer_attn, attn_last, attn_pred[:b],
                cfg.cam.seg_trans_layers, valid_p)

        # grid -> original resolution on the output canvas (clamp-replicated);
        # the resize operators are built on device from the per-image sizes
        mh_cam, mw_cam = _dev_ops_cam(sizes, canvas_out, grid1, patch)

        def upsample(grid_cams):
            return _resize_pair(grid_cams, mh_cam, mw_cam)

        mh_img, mw_img = _dev_ops_img(sizes, canvas_out, prep.canvas_in1)
        img_ori = _resize_pair(imgs1, mh_img, mw_img)
        cam_labels, _ = weclip.pseudo_label_chain(
            frozen, feats_u, sb.valid, present_mask, sb.gh, sb.gw, (g, g),
            cfg, policy, cls_idx, cls_active, fuse, upsample, img_ori,
            mesh=mesh)
        return seg_u, seg_avg, cam_labels

    return run


def make_eval_scale2(cfg: Config, policy: precision.Policy = precision.DEFAULT,
                     prep=None):
    """Seg-only flip-averaged forward for an extra TTA scale
    (test_msc_flip_voc.py:79-88)."""
    s2 = cfg.eval.scales[1] if len(cfg.eval.scales) > 1 else 0.75

    @jax.jit
    def run(params, frozen, sb: ScaleBatch, present_mask, sizes: EvalSizes):
        b = sb.img.shape[0]
        g = prep.canvas_in2 // cfg.clip.patch_size
        imgs1 = prepare_scale1_images(sb.img, sizes, cfg, prep.canvas_in1)
        imgs2 = prepare_scale2_images(imgs1, sizes, s2, prep.canvas_in2)
        img_f = jax.vmap(lambda x, w: _flip_valid(x, w, 1))(
            imgs2.transpose(0, 2, 3, 1), sb.w_px).transpose(0, 3, 1, 2)
        batch2 = weclip.Batch(
            img=jnp.concatenate([imgs2, img_f]),
            pos_emb=jnp.concatenate([sb.pos_emb, sb.pos_emb]),
            valid=jnp.concatenate([sb.valid, sb.valid]),
            gh=jnp.concatenate([sb.gh, sb.gh]),
            gw=jnp.concatenate([sb.gw, sb.gw]),
            present_mask=jnp.concatenate([present_mask, present_mask]),
        )
        _, head_out, _, _ = weclip.backbone_and_heads(
            params, frozen, batch2, cfg, None, policy, with_attn=False,
            decoder_pallas=True)
        k = cfg.dataset.num_classes
        seg = head_out.seg.reshape(2 * b, g, g, k).transpose(0, 3, 1, 2)
        seg_fl = jax.vmap(lambda x, w: _flip_valid(x, w, 2))(seg[b:], sb.gw)
        return (seg[:b] + seg_fl) / 2.0

    return run


def make_eval_combine(cfg: Config, msc: bool = True, prep=None):
    """Scale fusion + original-resolution predictions + hist updates
    (test_msc_flip_voc.py:86-107)."""
    from weclip_tpu.evalx.metrics import confusion_update
    k = cfg.dataset.num_classes
    patch = cfg.clip.patch_size

    @jax.jit
    def run(seg_single, seg_avg1, seg_avg2, cam_labels, label,
            sizes: EvalSizes, hists):
        if msc:
            # 0.75 grid -> scale-1 grid, then mean over scales
            mh_s2, mw_s2 = _dev_ops_s2(sizes, prep.grid1, prep.grid2, patch)
            seg2_on1 = _resize_pair(seg_avg2, mh_s2, mw_s2)
            msc_seg = (seg_avg1 + seg2_on1) / 2.0
        else:
            msc_seg = seg_avg1

        mh_cam, mw_cam = _dev_ops_cam(sizes, prep.canvas_out, prep.grid1, patch)
        pred_single = jnp.argmax(_resize_pair(seg_single, mh_cam, mw_cam),
                                 axis=1)
        pred_msc = jnp.argmax(_resize_pair(msc_seg, mh_cam, mw_cam), axis=1)

        h_single, h_msc, h_cam = hists
        h_single = confusion_update(h_single, label, pred_single, num_classes=k)
        h_msc = confusion_update(h_msc, label, pred_msc, num_classes=k)
        h_cam = confusion_update(h_cam, label, cam_labels, num_classes=k)
        return pred_single, pred_msc, (h_single, h_msc, h_cam)

    return run


def make_msc_logits(cfg: Config, msc: bool = True, prep=None):
    """Original-resolution msc logits for CRF post-processing
    (crf_proc loads saved msc_segs and resizes them to the image size,
    test_msc_flip_voc.py:140-154)."""
    patch = cfg.clip.patch_size

    @jax.jit
    def run(seg_avg1, seg_avg2, sizes: EvalSizes):
        if msc:
            mh_s2, mw_s2 = _dev_ops_s2(sizes, prep.grid1, prep.grid2, patch)
            seg2_on1 = _resize_pair(seg_avg2, mh_s2, mw_s2)
            msc_seg = (seg_avg1 + seg2_on1) / 2.0
        else:
            msc_seg = seg_avg1
        mh_cam, mw_cam = _dev_ops_cam(sizes, prep.canvas_out, prep.grid1, patch)
        return _resize_pair(msc_seg, mh_cam, mw_cam)

    return run
