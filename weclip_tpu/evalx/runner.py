"""Dataset-level evaluation driver.

Covers both reference evaluation modes:
- msc-flip inference (test_msc_flip_voc.py / _coco.py): resize long side to
  ``cfg.eval.resize_long``, scales (1.0, 0.75) x hflip, streaming mIoU for
  single/msc/cam predictions,
- training-time validation (scripts/dist_clip_voc.py:71-102): original-size
  single-scale 'val' forward, seg + cam scores.

Host work per image is O(canvas^2): build clamp-resize operators, pad the
image/label onto fixed canvases, and compute the positional embedding for
its grid.  Ragged tail batches are padded with all-ignore labels so the
histograms are unaffected.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.evalx import metrics
from weclip_tpu.evalx.engine import (EvalOps, ScaleBatch, make_eval_combine,
                                     make_eval_scale1, make_eval_scale2,
                                     make_msc_logits)
from weclip_tpu.evalx.operators import clamp_resize_matrix
from weclip_tpu.models.clip.vit import pos_emb_host


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class EvalPrep:
    """Static shapes for one evaluation configuration."""
    canvas_in1: int       # scale-1 input canvas (pixels)
    canvas_in2: int       # scale-2 input canvas (pixels)
    canvas_out: int       # original-resolution output canvas
    grid1: int
    grid2: int
    resize_long: Optional[int]


def make_prep(cfg: Config, max_ori: int, resize_long: Optional[int]) -> EvalPrep:
    patch = cfg.clip.patch_size
    base = resize_long if resize_long else max_ori
    c1 = _round_up(base, patch)
    s2 = cfg.eval.scales[1] if len(cfg.eval.scales) > 1 else 0.75
    c2 = _round_up(int(base * s2) + patch, patch)
    return EvalPrep(c1, c2, _round_up(max_ori, 8), c1 // patch, c2 // patch,
                    resize_long)


def _scale_example(img_chw: np.ndarray, target_hw: Tuple[int, int],
                   canvas: int, patch: int, pe_table: np.ndarray,
                   pe_cache: dict):
    """Pad one (3,H,W) float image onto a canvas; return pieces of ScaleBatch."""
    h, w = target_hw
    if (h, w) != img_chw.shape[1:]:
        img_chw = cv2.resize(img_chw.transpose(1, 2, 0), (w, h),
                             interpolation=cv2.INTER_LINEAR).transpose(2, 0, 1)
    gh, gw = h // patch, w // patch
    g = canvas // patch
    out = np.zeros((3, canvas, canvas), np.float32)
    out[:, :h, :w] = img_chw
    key = (gh, gw, g)
    cached = pe_cache.get(key)
    if cached is None:
        pe = pos_emb_host(pe_table, gh, gw, g, g)
        valid = np.zeros((g * g + 1,), bool)
        valid[0] = True
        vg = np.zeros((g, g), bool)
        vg[:gh, :gw] = True
        valid[1:] = vg.reshape(-1)
        pe_cache[key] = (pe, valid)
    else:
        pe, valid = cached
    return out, pe, valid, gh, gw, (h, w)


class Evaluator:
    def __init__(self, cfg: Config, prep: EvalPrep, pe_table: np.ndarray,
                 policy: precision.Policy = precision.DEFAULT,
                 with_cam: bool = True, msc: bool = True,
                 class_buckets: Tuple[int, ...] = (4, 8)):
        self.cfg = cfg
        self.prep = prep
        self.pe_table = np.asarray(pe_table, np.float32)
        self.with_cam = with_cam
        self.msc = msc
        self.policy = policy
        num_fg = cfg.dataset.num_classes - 1
        self.class_buckets = tuple(b for b in class_buckets if b < num_fg) + (num_fg,)
        self._scale1_cache: dict = {}
        self.scale2 = make_eval_scale2(cfg, policy) if msc else None
        self.combine = make_eval_combine(cfg, msc=msc)
        self.msc_logits = make_msc_logits(cfg, msc=msc)
        self._pe_cache: dict = {}

    def scale1_for(self, mc: int):
        if mc not in self._scale1_cache:
            self._scale1_cache[mc] = make_eval_scale1(
                self.cfg, self.policy, with_cam=self.with_cam, max_classes=mc)
        return self._scale1_cache[mc]

    def class_compaction(self, presents: np.ndarray):
        """(B, C_fg) present mask -> bucketed (cls_idx (B,MC), active (B,MC))."""
        from weclip_tpu.core.compaction import compact_classes, pick_bucket
        mc = pick_bucket(presents, self.class_buckets)
        return compact_classes(presents, mc)

    # -- host batch assembly -------------------------------------------------
    def build_batch(self, examples) -> Tuple[ScaleBatch, ScaleBatch, EvalOps,
                                             jax.Array, jax.Array]:
        cfg, prep = self.cfg, self.prep
        patch = cfg.clip.patch_size
        rl = prep.resize_long
        s2 = cfg.eval.scales[1] if len(cfg.eval.scales) > 1 else 0.75

        cols1, cols2, ops_rows, labels, presents = [], [], [], [], []
        for ex in examples:
            img = ex["img"]
            oh, ow = img.shape[1:]
            if rl:
                ratio = rl / max(oh, ow)
                h1, w1 = int(oh * ratio), int(ow * ratio)
            else:
                h1, w1 = oh, ow
            cols1.append(_scale_example(img, (h1, w1), prep.canvas_in1,
                                        patch, self.pe_table, self._pe_cache))
            if self.msc:
                h2, w2 = int(h1 * s2), int(w1 * s2)
                cols2.append(_scale_example(img, (h2, w2), prep.canvas_in2,
                                            patch, self.pe_table,
                                            self._pe_cache))
            else:
                h2 = w2 = patch
            gh1, gw1 = h1 // patch, w1 // patch
            gh2, gw2 = max(h2 // patch, 1), max(w2 // patch, 1)
            co, g1, g2 = prep.canvas_out, prep.grid1, prep.grid2
            ops_rows.append((
                clamp_resize_matrix(gh1, oh, co, g1),
                clamp_resize_matrix(gw1, ow, co, g1),
                clamp_resize_matrix(h1, oh, co, prep.canvas_in1, True),
                clamp_resize_matrix(w1, ow, co, prep.canvas_in1, True),
                clamp_resize_matrix(gh2, gh1, g1, g2),
                clamp_resize_matrix(gw2, gw1, g1, g2),
            ))
            lab = np.full((co, co), 255, np.int32)
            lab[:oh, :ow] = ex["label"]
            labels.append(lab)
            presents.append(ex["present_mask"])

        def stack_scale(cols):
            img, pe, valid, gh, gw, _ = zip(*cols)
            return ScaleBatch(jnp.asarray(np.stack(img)),
                              jnp.asarray(np.stack(pe)),
                              jnp.asarray(np.stack(valid)),
                              jnp.asarray(np.asarray(gh, np.int32)),
                              jnp.asarray(np.asarray(gw, np.int32)))

        sb1 = stack_scale(cols1)
        sb2 = stack_scale(cols2) if self.msc else sb1
        ops = EvalOps(*(jnp.asarray(np.stack(c)) for c in zip(*ops_rows)))
        presents = np.stack(presents)
        cls_idx, cls_active = self.class_compaction(presents)
        return (sb1, sb2, ops, jnp.asarray(np.stack(labels)),
                jnp.asarray(presents), jnp.asarray(cls_idx),
                jnp.asarray(cls_active))

    # -- dataset loop ---------------------------------------------------------
    def run(self, params, frozen, dataset,
            max_images: Optional[int] = None,
            progress: bool = False,
            crf: bool = False,
            save_dir: Optional[str] = None) -> Dict[str, Dict]:
        cfg = self.cfg
        k = cfg.dataset.num_classes
        hists = (metrics.zero_hist(k), metrics.zero_hist(k), metrics.zero_hist(k))
        h_crf = np.zeros((k, k), np.float64)
        post = None
        if crf:
            from weclip_tpu.refine.crf import DenseCRF
            post = DenseCRF.from_config(cfg.eval.crf)
        bsz = cfg.eval.batch_images
        n = len(dataset) if max_images is None else min(len(dataset), max_images)

        def prepare(s):
            idxs = list(range(s, min(s + bsz, n)))
            examples = [dataset[i] for i in idxs]
            n_real = len(examples)
            while len(examples) < bsz:                    # ragged tail: pad
                pad = dict(examples[-1])
                pad["label"] = np.full_like(pad["label"], 255)
                examples.append(pad)
            return examples, n_real, self.build_batch(examples)

        # overlap host batch prep with device compute
        import concurrent.futures as cf
        pool = cf.ThreadPoolExecutor(max_workers=1)
        starts = list(range(0, n, bsz))
        it = range(len(starts))
        if progress:
            from tqdm import tqdm
            it = tqdm(it, ncols=100)
        pending = pool.submit(prepare, starts[0]) if starts else None
        for i in it:
            examples, n_real, built = pending.result()
            if i + 1 < len(starts):
                pending = pool.submit(prepare, starts[i + 1])
            sb1, sb2, ops, labels, presents, cls_idx, cls_active = built
            scale1 = self.scale1_for(cls_idx.shape[1])
            seg_single, seg_avg1, cam_labels = scale1(
                params, frozen, sb1, presents, ops, cls_idx, cls_active)
            if self.msc:
                seg_avg2 = self.scale2(params, frozen, sb2, presents)
            else:
                seg_avg2 = seg_avg1
            _, pred_msc, hists = self.combine(seg_single, seg_avg1, seg_avg2,
                                              cam_labels, labels, ops, hists)

            if save_dir is not None:
                import os
                from weclip_tpu.utils.imutils import save_prediction
                os.makedirs(os.path.join(save_dir, "prediction"), exist_ok=True)
                os.makedirs(os.path.join(save_dir, "prediction_cmap"),
                            exist_ok=True)
                pm = np.asarray(pred_msc)
                for j in range(n_real):
                    ex = examples[j]
                    oh, ow = ex["label"].shape
                    save_prediction(os.path.join(save_dir, "prediction",
                                                 str(ex["name"]) + ".png"),
                                    pm[j, :oh, :ow])
                    save_prediction(os.path.join(save_dir, "prediction_cmap",
                                                 str(ex["name"]) + ".png"),
                                    pm[j, :oh, :ow], cmap=True)

            if post is not None:
                # reference crf_proc: msc logits -> softmax -> dense CRF
                # (test_msc_flip_voc.py:140-158)
                logits = np.asarray(self.msc_logits(seg_avg1, seg_avg2, ops))
                for j in range(n_real):
                    ex = examples[j]
                    oh, ow = ex["label"].shape
                    lg = logits[j, :, :oh, :ow].astype(np.float64)
                    lg -= lg.max(axis=0, keepdims=True)
                    prob = np.exp(lg)
                    prob /= prob.sum(axis=0, keepdims=True)
                    raw = ex.get("img_raw")
                    if raw is None:
                        raise ValueError("CRF needs 'img_raw' (HWC uint8) "
                                         "in dataset examples")
                    refined = post(raw, prob.astype(np.float32))
                    pred = refined.argmax(0)
                    gt = ex["label"]
                    m = (gt >= 0) & (gt < k)
                    h_crf += np.bincount(
                        k * gt[m].astype(np.int64) + pred[m],
                        minlength=k * k).reshape(k, k)

        pool.shutdown(wait=False)
        h_single, h_msc, h_cam = (np.asarray(h) for h in hists)
        out = {
            "seg": metrics.scores(h_single),
            "msc_seg": metrics.scores(h_msc),
            "cam": metrics.scores(h_cam),
        }
        if post is not None:
            out["crf_seg"] = metrics.scores(h_crf)
        return out
