"""The batched, padded msc-flip eval engine must reproduce, image by image,
what an exact-shape (unpadded, unbatched) computation produces — validating
the whole canvas/validity-mask machinery end-to-end."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tests import tiny
from weclip_tpu.cam.gradcam import _minmax_valid, gradcam_batch
from weclip_tpu.core import precision
from weclip_tpu.core.config import ParConfig
from weclip_tpu.evalx import metrics
from weclip_tpu.evalx.runner import Evaluator, make_prep
from weclip_tpu.models import weclip
from weclip_tpu.models.clip import vit
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.refine import affinity as aff
from weclip_tpu.refine.par import par_refine

PATCH = 16


class FakeDataset:
    """Synthetic 'original-size' uint8 images + labels.  ``img`` is the
    dataset-normalized float view (what the reference model consumes);
    ``img_raw`` is what the engine ships to device and normalizes there."""

    def __init__(self, cfg, sizes, seed=0):
        from weclip_tpu.data.transforms import normalize_img
        rng = np.random.default_rng(seed)
        self.examples = []
        nfg = cfg.dataset.num_classes - 1
        for oh, ow in sizes:
            raw = rng.integers(0, 256, (oh, ow, 3)).astype(np.uint8)
            img = normalize_img(raw).transpose(2, 0, 1)
            label = rng.integers(0, cfg.dataset.num_classes, (oh, ow)).astype(np.int32)
            present = np.zeros(nfg, bool)
            present[0] = True
            present[nfg - 1] = True
            self.examples.append({"img": img, "img_raw": raw, "label": label,
                                  "present_mask": present})

    def __len__(self):
        return len(self.examples)

    def __getitem__(self, i):
        return self.examples[i]


def exact_eval_one(params, frozen, cfg, ex, resize_long, scales):
    """Unpadded, per-image msc-flip evaluation using the library primitives
    at exact shapes (masks all-true) — the 'ground truth' for the engine."""
    import cv2
    img = ex["img"]                 # test-local float view (DS in this file)
    oh, ow = img.shape[1:]
    ratio = resize_long / max(oh, ow)
    h1, w1 = int(oh * ratio), int(ow * ratio)

    def forward(img_chw):
        h, w = img_chw.shape[1:]
        gh, gw = h // PATCH, w // PATCH
        # the reference flips the FULL image before patch extraction
        # (test_msc_flip_voc.py:68); when w % 16 != 0 that is NOT the flip
        # of the cropped patch area, so flip first, crop after
        xfull = img_chw[None]
        x2 = jnp.concatenate([xfull, jnp.flip(xfull, -1)]
                             )[:, :, :gh * PATCH, :gw * PATCH]
        pe = vit.build_pos_emb(params_visual, gh, gw)[None]
        valid = jnp.ones((2, gh * gw + 1), bool)
        batch = weclip.Batch(jnp.asarray(x2), jnp.concatenate([pe, pe]), valid,
                             jnp.full((2,), gh, jnp.int32),
                             jnp.full((2,), gw, jnp.int32),
                             jnp.asarray(np.stack([ex["present_mask"]] * 2)))
        feats, head_out, attn_pred, _ = weclip.backbone_and_heads(
            {"head": params["head"]}, frozen, batch, cfg, None, precision.FP32)
        k = cfg.dataset.num_classes
        seg = head_out.seg.reshape(2, gh, gw, k).transpose(0, 3, 1, 2)
        seg_avg = (seg[0] + jnp.flip(seg[1], -1)) / 2.0
        return feats, attn_pred, seg[0], seg_avg, (gh, gw), batch

    params_visual = frozen["visual"]

    feats, attn_pred, seg_single, seg_avg1, (gh1, gw1), batch = forward(
        jnp.asarray(cv2_resize(img, h1, w1)))

    # CAM chain (unflipped only)
    nfg = cfg.dataset.num_classes - 1
    text = jnp.concatenate([frozen["fg_text"], frozen["bg_text"]], 0)
    tmask = jnp.concatenate([jnp.asarray(ex["present_mask"])[None],
                             jnp.ones((1, frozen["bg_text"].shape[0]), bool)], 1)
    cam_out = gradcam_batch(frozen["visual"], frozen["logit_scale"],
                            feats.layer_tokens[-1][:1], text, tmask,
                            feats.valid[:1], nfg, cfg.clip, precision.FP32,
                            num_patches=gh1 * gw1)
    fused = aff.fuse_attention_gated(feats.layer_attn[:, :1],
                                     cam_out.attn_last, attn_pred[:1],
                                     cfg.cam.seg_trans_layers,
                                     jnp.ones((1, gh1 * gw1)))
    trans = aff.sinkhorn_transition(fused[0], jnp.ones((gh1 * gw1,), bool),
                                    cfg.cam.sinkhorn_iters)
    refined = aff.random_walk_cams(cam_out.cams[0], trans,
                                   jnp.ones((gh1, gw1), bool),
                                   jnp.int32(gh1), jnp.int32(gw1),
                                   cfg.cam.bbox_threshold)
    normed = jax.vmap(lambda c: _minmax_valid(c, jnp.ones((gh1 * gw1,), bool)))(refined)
    cam_ori = resize_bilinear(normed.reshape(nfg, gh1, gw1), oh, ow)[None]
    present = jnp.asarray(ex["present_mask"], jnp.float32)[None, :, None, None]
    fg_scores = jnp.where(present > 0, cam_ori, -1.0)
    maxp = jnp.max(jnp.where(present > 0, cam_ori, 0.0), axis=1, keepdims=True)
    stack = jnp.concatenate([(1.0 - maxp) ** cfg.cam.bg_exponent, fg_scores], 1)
    img_ori = resize_bilinear(jnp.asarray(cv2_resize(img, h1, w1))[None],
                              oh, ow, align_corners=True)
    cam_label = jnp.argmax(par_refine(img_ori, stack, cfg.par), axis=1)[0]

    # scale 0.75 — derived from the scale-1-resized image like the reference
    # (test_msc_flip_voc.py:81), with torch's scale_factor coordinate
    # mapping, NOT size-based (see operators.scale_factor_matrix)
    from weclip_tpu.evalx.operators import resize_by_scale
    h2, w2 = int(h1 * scales[1]), int(w1 * scales[1])
    img1 = cv2_resize(img, h1, w1)
    img2 = resize_by_scale(np.asarray(img1, np.float32), (h2, w2), scales[1])
    _, _, _, seg_avg2, (gh2, gw2), _ = forward(jnp.asarray(img2))
    seg2_on1 = resize_bilinear(seg_avg2, gh1, gw1)
    msc = (seg_avg1 + seg2_on1) / 2.0

    pred_single = jnp.argmax(resize_bilinear(seg_single, oh, ow), axis=0)
    pred_msc = jnp.argmax(resize_bilinear(msc, oh, ow), axis=0)
    return (np.asarray(pred_single), np.asarray(pred_msc),
            np.asarray(cam_label))


def cv2_resize(img_chw, h, w):
    """Exact-shape mirror of the engine's on-device half-pixel hat-matrix
    resize (engine.prepare_scale1_images) — numerically the same mapping as
    cv2.resize INTER_LINEAR, computed the same way the engine computes it."""
    if img_chw.shape[1:] == (h, w):
        return np.asarray(img_chw, np.float32)
    from weclip_tpu.evalx.engine import _resize_pair
    from weclip_tpu.evalx.operators import device_resize_matrix as drm
    ih, iw = img_chw.shape[1:]
    mh = drm(ih, h, h, ih)
    mw = drm(iw, w, w, iw)
    x = jnp.asarray(img_chw, jnp.float32)[None]
    return np.asarray(_resize_pair(x, mh[None], mw[None])[0])


def test_batched_engine_matches_exact():
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(cfg, par=ParConfig(dilations=(1, 2), num_iter=3),
                              eval=dataclasses.replace(cfg.eval, batch_images=2))
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)

    sizes = [(40, 64), (64, 56)]
    ds = FakeDataset(cfg, sizes)
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe_table = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe_table, policy=precision.FP32)

    # run batched engine manually to capture predictions (class compaction
    # active: bucket 4 while the exact path computes all classes)
    examples = [ds[0], ds[1]]
    sb1, sb2, dsizes, labels, presents, cls_idx, cls_active = ev.build_batch(examples)
    assert cls_idx.shape[1] == 4          # compacted bucket in play
    seg_single, seg_avg1, cam_labels = ev.scale1_for(cls_idx.shape[1])(
        params, frozen, sb1, presents, dsizes, cls_idx, cls_active)
    seg_avg2 = ev.scale2(params, frozen, sb2, presents, dsizes)
    k = cfg.dataset.num_classes
    hists = (metrics.zero_hist(k),) * 3
    pred_single, pred_msc, hists = ev.combine(seg_single, seg_avg1, seg_avg2,
                                              cam_labels, labels, dsizes, hists)

    for i, (oh, ow) in enumerate(sizes):
        e_single, e_msc, e_cam = exact_eval_one(
            params, frozen, cfg, ds[i], 64, cfg.eval.scales)
        np.testing.assert_array_equal(
            np.asarray(pred_single)[i, :oh, :ow], e_single,
            err_msg=f"single pred, image {i}")
        np.testing.assert_array_equal(
            np.asarray(pred_msc)[i, :oh, :ow], e_msc,
            err_msg=f"msc pred, image {i}")
        np.testing.assert_array_equal(
            np.asarray(cam_labels)[i, :oh, :ow], e_cam,
            err_msg=f"cam label, image {i}")

    # hist totals: every non-ignored gt pixel counted exactly once
    total = sum((np.asarray(l) != 255).sum() for l in (ds[0]["label"], ds[1]["label"]))
    for h in hists:
        assert np.asarray(h).sum() == total


def test_runner_crf_jax_path():
    """Evaluator.run(crf=True, crf_impl='jax'): batched on-device mean-field
    CRF over the output canvas produces a crf_seg score entry."""
    import jax
    from tests import tiny
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from weclip_tpu.models import weclip

    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(1), cfg)

    rng = np.random.default_rng(0)
    nfg = cfg.dataset.num_classes - 1

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            oh, ow = (56, 64) if i == 0 else (64, 48)
            present = np.zeros(nfg, bool)
            present[i % nfg] = True
            raw = rng.integers(0, 255, (oh, ow, 3), dtype=np.uint8)
            return {"name": f"x{i}",
                    "img": rng.standard_normal((3, oh, ow)).astype(np.float32),
                    "img_raw": raw,
                    "label": rng.integers(0, nfg + 1, (oh, ow)).astype(np.int32),
                    "present_mask": present}

    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, with_cam=False, msc=False,
                   class_buckets=(nfg,))
    scores = ev.run(params, frozen, DS(), crf=True, crf_impl="jax")
    assert "crf_seg" in scores
    assert np.isfinite(scores["crf_seg"]["pAcc"])


def test_fused_round_matches_separate_programs():
    """Evaluator.round_for (one fused dispatch) must equal the three
    separate programs bit-for-bit — it is jit-of-jit over the same fns."""
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(cfg, par=ParConfig(dilations=(1, 2), num_iter=3),
                              eval=dataclasses.replace(cfg.eval, batch_images=2))
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)
    ds = FakeDataset(cfg, [(40, 64), (64, 56)])
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=precision.FP32)

    built = ev.build_batch([ds[0], ds[1]])
    sb1, sb2, dsizes, labels, presents, ci, ca = built
    k = cfg.dataset.num_classes
    hists = (metrics.zero_hist(k),) * 3
    seg_single, seg_avg1, cam_labels = ev.scale1_for(ci.shape[1])(
        params, frozen, sb1, presents, dsizes, ci, ca)
    seg_avg2 = ev.scale2(params, frozen, sb2, presents, dsizes)
    ps_a, pm_a, h_a = ev.combine(seg_single, seg_avg1, seg_avg2,
                                 cam_labels, labels, dsizes, hists)
    ps_b, pm_b, h_b = ev.round_for(ci.shape[1])(
        params, frozen, sb1, sb2, dsizes, labels, presents, ci, ca, hists)
    np.testing.assert_array_equal(np.asarray(ps_a), np.asarray(ps_b))
    np.testing.assert_array_equal(np.asarray(pm_a), np.asarray(pm_b))
    for x, y in zip(h_a, h_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
