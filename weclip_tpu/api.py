"""High-level user API.

Covers BASELINE.json configs[0] ("VOC12 single image: CAM + attn-affinity +
PAR refine, single-scale no-flip") and gives reference users a one-object
entry point: load once, then segment images / produce pseudo-labels / CAMs.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from weclip_tpu.core.config import Config


class WeCLIPPipeline:
    """Load-once, call-many inference pipeline.

    Example:
        pipe = WeCLIPPipeline(cfg, model_path="work_dir/checkpoints/...")
        out = pipe.segment(rgb_uint8)             # (H, W) int32 labels
        out = pipe.pseudo_label(rgb_uint8, class_ids=[11, 14])
    """

    def __init__(self, cfg: Optional[Config] = None,
                 model_path: Optional[str] = None,
                 precision_name: str = "bfloat16"):
        import jax
        from weclip_tpu.core import precision as prec
        from weclip_tpu.core.runtime import enable_compilation_cache
        from weclip_tpu.train.trainer import build_frozen
        from weclip_tpu.train.step import create_train_state

        enable_compilation_cache()
        self.cfg = cfg or Config()
        self.policy = prec.make_policy(precision_name)
        self.frozen, self.clip_params, self.cfg = build_frozen(self.cfg)
        state, _ = create_train_state(jax.random.PRNGKey(0), self.cfg)
        self.params = state.params
        if model_path:
            from weclip_tpu.train import checkpoint
            self.params, _, _ = checkpoint.restore(model_path)
        self._evaluators: Dict = {}
        self._cam_programs: Dict = {}

    def _evaluator(self, max_ori: int, with_cam: bool, msc: bool):
        from weclip_tpu.evalx.runner import Evaluator, make_prep
        # bucket the output canvas: make_prep rounds max_ori up to a
        # multiple of 8 anyway, so keying on the rounded value is
        # numerically identical and avoids one full XLA compile per
        # distinct image dimension (segment()/pseudo_label() slice the
        # canvas back to (oh, ow))
        max_ori = -(-max_ori // 8) * 8
        key = (max_ori, with_cam, msc)
        if key not in self._evaluators:
            prep = make_prep(self.cfg, max_ori=max_ori,
                             resize_long=self.cfg.eval.resize_long)
            pe = np.asarray(self.clip_params["visual"]["positional_embedding"])
            self._evaluators[key] = Evaluator(self.cfg, prep, pe,
                                              policy=self.policy,
                                              with_cam=with_cam, msc=msc)
        return self._evaluators[key]

    def _example(self, image_rgb: np.ndarray,
                 class_ids: Optional[list] = None) -> Dict:
        from weclip_tpu.utils.imutils import promote_rgb
        image_rgb = promote_rgb(image_rgb)  # grayscale/alpha, like datasets
        num_fg = self.cfg.dataset.num_classes - 1
        present = np.zeros(num_fg, bool)
        if class_ids is None:
            present[:] = True
        else:
            for c in class_ids:
                c = int(c)
                if not 0 <= c < num_fg:
                    raise ValueError(
                        f"class id {c} out of range [0, {num_fg}) — ids are "
                        f"0-based foreground classes (background is implicit)")
                present[c] = True
        oh, ow = image_rgb.shape[:2]
        # normalization happens on device from the raw uint8 pixels
        # (Evaluator.build_batch reads only img_raw)
        return {"name": "image",
                "img_raw": image_rgb.astype(np.uint8),
                "label": np.zeros((oh, ow), np.int32),
                "present_mask": present}

    def _run_one(self, image_rgb: np.ndarray, with_cam: bool, msc: bool,
                 class_ids=None):
        ev = self._evaluator(max(image_rgb.shape[:2]), with_cam, msc)
        ex = self._example(image_rgb, class_ids)
        built = ev.build_batch([ex])
        sb1, sb2, sizes, labels, presents, cls_idx, cls_active = built
        scale1 = ev.scale1_for(cls_idx.shape[1])
        seg_single, seg_avg1, cam_labels = scale1(
            self.params, self.frozen, sb1, presents, sizes, cls_idx, cls_active)
        if msc:
            seg_avg2 = ev.scale2(self.params, self.frozen, sb2, presents,
                                 sizes)
        else:
            seg_avg2 = seg_avg1
        return ev, sizes, seg_single, seg_avg1, seg_avg2, cam_labels, ex

    def segment(self, image_rgb: np.ndarray, msc: bool = True,
                crf: bool = False) -> np.ndarray:
        """Predicted (H, W) int32 segmentation at the original resolution."""
        ev, sizes, seg_single, seg_avg1, seg_avg2, _, ex = self._run_one(
            image_rgb, with_cam=False, msc=msc)
        logits = np.asarray(ev.msc_logits(seg_avg1, seg_avg2, sizes))[0]
        oh, ow = image_rgb.shape[:2]
        logits = logits[:, :oh, :ow]
        if crf:
            from weclip_tpu.refine.crf import DenseCRF
            lg = logits - logits.max(axis=0, keepdims=True)
            prob = np.exp(lg)
            prob /= prob.sum(axis=0, keepdims=True)
            post = DenseCRF.from_config(self.cfg.eval.crf)
            logits = post(ex["img_raw"], prob.astype(np.float32))
        return logits.argmax(0).astype(np.int32)

    def pseudo_label(self, image_rgb: np.ndarray,
                     class_ids: Optional[list] = None) -> np.ndarray:
        """CAM + affinity walk + PAR pseudo label (single scale, no flip
        score use) — BASELINE configs[0]."""
        _, _, _, _, _, cam_labels, _ = self._run_one(
            image_rgb, with_cam=True, msc=False, class_ids=class_ids)
        oh, ow = image_rgb.shape[:2]
        return np.asarray(cam_labels)[0, :oh, :ow]

    def cam(self, image_rgb: np.ndarray,
            class_ids: Optional[list] = None,
            method: str = "grad_cam") -> np.ndarray:
        """Refined per-class CAM heatmaps — the raw map surface a
        ``pytorch_grad_cam.GradCAM(model, ...)`` user consumes (min-max
        normalized, affinity-walk refined; clip_tool.py:106-216 semantics,
        same program as ``cli/generate_cams.py``).

        Returns ``(len(class_ids) or num_fg, H, W) float32`` in [0, 1],
        ordered as ``class_ids`` (all foreground classes when None).
        ``method`` selects the CAM engine (cam/variants.py surface).
        """
        ev = self._evaluator(max(image_rgb.shape[:2]), with_cam=True,
                             msc=False)
        key = (ev.prep.canvas_out, method)
        if key not in self._cam_programs:
            from weclip_tpu.cam.highres import make_cam_program
            self._cam_programs[key] = make_cam_program(
                self.cfg, ev.prep, self.policy, method=method)
        ex = self._example(image_rgb, class_ids)
        sb1, _, sizes, _, presents, _, _ = ev.build_batch([ex])
        highres = np.asarray(
            self._cam_programs[key](self.frozen, sb1, presents, sizes))
        oh, ow = image_rgb.shape[:2]
        ids = (list(range(self.cfg.dataset.num_classes - 1))
               if class_ids is None else [int(c) for c in class_ids])
        return highres[0, ids, :oh, :ow].astype(np.float32)
