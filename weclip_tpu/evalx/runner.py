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
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.evalx import metrics
from weclip_tpu.evalx.engine import (EvalSizes, ScaleBatch, make_eval_combine,
                                     make_eval_scale1, make_eval_scale2,
                                     make_msc_logits)
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


def _pe_valid_for(target_hw: Tuple[int, int], canvas: int, patch: int,
                  pe_table: np.ndarray, pe_cache: dict):
    """(pe_dev, valid_dev, gh, gw) for a valid (h, w) region on ``canvas``.

    Positional embeddings and validity masks are cached *on device* per
    grid size, so repeated sizes cost nothing on the host.  Image pixels
    never touch the host here — the engine normalizes/resizes the shipped
    uint8 originals on device (engine.prepare_scale1_images)."""
    import jax.numpy as jnp
    h, w = target_hw
    gh, gw = h // patch, w // patch
    g = canvas // patch
    key = (gh, gw, g)
    cached = pe_cache.get(key)
    if cached is None:
        pe = pos_emb_host(pe_table, gh, gw, g, g)
        valid = np.zeros((g * g + 1,), bool)
        valid[0] = True
        vg = np.zeros((g, g), bool)
        vg[:gh, :gw] = True
        valid[1:] = vg.reshape(-1)
        cached = (jnp.asarray(pe), jnp.asarray(valid))
        pe_cache[key] = cached
    pe, valid = cached
    return pe, valid, gh, gw


class Evaluator:
    def __init__(self, cfg: Config, prep: EvalPrep, pe_table: np.ndarray,
                 policy: precision.Policy = precision.DEFAULT,
                 with_cam: bool = True, msc: bool = True,
                 class_buckets: Tuple[int, ...] = (4, 8),
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh — batches shard over its data
        axis so msc-flip TTA scales across chips (the reference loops images
        on one GPU; here cfg.eval.batch_images should be a multiple of the
        data-parallel size)."""
        self.cfg = cfg
        self.prep = prep
        self.mesh = mesh
        # the Evaluator owns its sharding decision: declare it so
        # pallas_ok() reflects THIS program even if an earlier make_mesh in
        # the same process declared multi-device compute (api.py/bench.py
        # build single-device Evaluators directly, without a CLI mesh)
        from weclip_tpu.core.runtime import declare_sharded_compute
        declare_sharded_compute(mesh is not None and mesh.size > 1)
        self.pe_table = np.asarray(pe_table, np.float32)
        self.with_cam = with_cam
        self.msc = msc
        self.policy = policy
        num_fg = cfg.dataset.num_classes - 1
        self.class_buckets = tuple(b for b in class_buckets if b < num_fg) + (num_fg,)
        self._scale1_cache: dict = {}
        self.scale2 = make_eval_scale2(cfg, policy, prep=prep) if msc else None
        self.combine = make_eval_combine(cfg, msc=msc, prep=prep)
        self.msc_logits = make_msc_logits(cfg, msc=msc, prep=prep)
        self._pe_cache: dict = {}
        # Double-buffered host staging: jnp.asarray/device_put of a numpy
        # array is async, so the prefetch thread must not overwrite batch
        # i's buffers while its transfer may still be in flight.  Two
        # buffer sets alternate per build_batch call (prefetch depth is 1),
        # and before a set is REUSED we block on the device arrays it last
        # fed — that waits only for transfer completion, not compute.
        self._host_bufs = [None, None]
        self._inflight = [None, None]
        self._buf_flip = 0
        self._copy_on_feed = None  # lazily: True on backends that may alias

    def scale1_for(self, mc: int):
        if mc not in self._scale1_cache:
            self._scale1_cache[mc] = make_eval_scale1(
                self.cfg, self.policy, with_cam=self.with_cam, max_classes=mc,
                prep=self.prep, mesh=self.mesh)
        return self._scale1_cache[mc]

    def round_for(self, mc: int):
        """One fused program per class bucket: scale1 + scale2 + combine.

        jit-of-jit inlines the three cached programs into ONE XLA
        computation, so results are identical to the separate calls by
        construction.  One dispatch per round also keeps the axon tunnel's
        per-dispatch latency off the critical path.  (An earlier version of
        this comment blamed a 174-vs-202 ms wall gap on inter-program
        bubbles; an xprof timeline later showed modules execute back-to-back
        with ~10 us gaps — the wall gap was the benchmark's own prediction
        readback, since removed from the timed window.)"""
        key = ("round", mc)
        if key not in self._scale1_cache:
            mesh, msc = self.mesh, self.msc
            # dp-only sharded round: run the WHOLE round as a full-manual
            # shard_map over the data axis, so every Pallas kernel
            # (attention forward, flash GradCAM backward, decoder, CTI,
            # PAR) dispatches per device instead of falling back to XLA —
            # Mosaic custom calls cannot be auto-partitioned by GSPMD, but
            # per-device under shard_map is the jax-documented supported
            # configuration.  Gated to meshes whose non-data axes are all
            # size 1 (the tensor-parallel frozen-MLP sharding needs GSPMD
            # inside; that configuration keeps the prior per-op path below,
            # where PAR alone runs its own shard_map).
            from weclip_tpu.parallel import mesh as meshlib
            if meshlib.dp_only(mesh):
                from jax.sharding import PartitionSpec as P

                from weclip_tpu.evalx.engine import (make_eval_combine,
                                                     make_eval_scale1,
                                                     make_eval_scale2)

                # dedicated per-device program instances: their first trace
                # happens inside per_device_region, so the kernel dispatch
                # (decided at trace time) is per-device-true; the shared
                # self.scale1/... instances stay on the GSPMD path for the
                # piecewise save/logits/crf loop
                scale1 = make_eval_scale1(self.cfg, self.policy,
                                          with_cam=self.with_cam,
                                          max_classes=mc, prep=self.prep,
                                          mesh=None)
                scale2 = (make_eval_scale2(self.cfg, self.policy,
                                           prep=self.prep) if msc else None)
                combine = make_eval_combine(self.cfg, msc=msc, prep=self.prep)
                data_ax = mesh.axis_names[0]

                def round_body(params, frozen, sb1, sb2, sizes, labels,
                               presents, cls_idx, cls_active, hists):
                    seg_single, seg_avg1, cam_labels = scale1(
                        params, frozen, sb1, presents, sizes, cls_idx,
                        cls_active)
                    if msc:
                        sb2 = sb2._replace(img=sb1.img)
                        seg_avg2 = scale2(params, frozen, sb2, presents,
                                          sizes)
                    else:
                        seg_avg2 = seg_avg1
                    zeros = jax.tree_util.tree_map(jnp.zeros_like, hists)
                    ps, pm, upd = combine(seg_single, seg_avg1, seg_avg2,
                                          cam_labels, labels, sizes, zeros)
                    upd = jax.lax.psum(upd, data_ax)
                    hists = jax.tree_util.tree_map(jnp.add, hists, upd)
                    return ps, pm, hists

                d, r = P(data_ax), P()
                self._scale1_cache[key] = jax.jit(meshlib.per_device_map(
                    round_body, mesh,
                    in_specs=(r, r, d, d, d, d, d, d, d, r),
                    out_specs=(d, d, r)))
                return self._scale1_cache[key]

            scale1 = self.scale1_for(mc)
            scale2, combine = self.scale2, self.combine

            @jax.jit
            def round_fn(params, frozen, sb1, sb2, sizes, labels, presents,
                         cls_idx, cls_active, hists):
                seg_single, seg_avg1, cam_labels = scale1(
                    params, frozen, sb1, presents, sizes, cls_idx, cls_active)
                if msc:
                    # build_batch always shares ONE uint8 original tensor
                    # between the scales (sb2.img IS sb1.img), but jit
                    # flattens them into two XLA parameters, which blocks
                    # CSE of the duplicated normalize+resize prologue.
                    # Rebinding onto sb1.img lets HloCSE merge them.
                    sb2 = sb2._replace(img=sb1.img)
                    seg_avg2 = scale2(params, frozen, sb2, presents, sizes)
                else:
                    seg_avg2 = seg_avg1
                return combine(seg_single, seg_avg1, seg_avg2, cam_labels,
                               labels, sizes, hists)

            self._scale1_cache[key] = round_fn
        return self._scale1_cache[key]

    def class_compaction(self, presents: np.ndarray):
        """(B, C_fg) present mask -> bucketed (cls_idx (B,MC), active (B,MC))."""
        from weclip_tpu.core.compaction import compact_classes, pick_bucket
        mc = pick_bucket(presents, self.class_buckets)
        return compact_classes(presents, mc)

    # -- host batch assembly -------------------------------------------------
    def build_batch(self, examples):
        cfg, prep = self.cfg, self.prep
        patch = cfg.clip.patch_size
        rl = prep.resize_long
        s2 = cfg.eval.scales[1] if len(cfg.eval.scales) > 1 else 0.75

        b = len(examples)
        if self._copy_on_feed is None:
            # On TPU, jnp.asarray makes a real device copy, so blocking on
            # the transfer below is a sufficient reuse guard.  CPU backends
            # can zero-copy alias aligned numpy buffers into jax.Arrays —
            # there, feed a fresh copy so buffer reuse can never race a
            # computation still reading batch i (dryrun/test paths).
            self._copy_on_feed = jax.default_backend() != "tpu"
        flip, self._buf_flip = self._buf_flip, 1 - self._buf_flip
        bufs = self._host_bufs[flip]
        if bufs is None or bufs[0].shape[0] != b:
            # HWC staging: each image lands as ONE contiguous row-block
            # copy + pad-region-only zeroing (vs zero-whole-canvas + a
            # strided HWC->CHW scatter) — 3.3x cheaper on this 1-core host
            # (tools/profile_hostprep.py); the device transposes inside
            # prepare_scale1_images.
            bufs = (np.zeros((b, prep.canvas_out, prep.canvas_out, 3),
                             np.uint8),
                    np.zeros((b, prep.canvas_out, prep.canvas_out), np.uint8))
            self._host_bufs[flip] = bufs
        img_buf, lab_buf = bufs
        if self._inflight[flip] is not None:
            for arr in self._inflight[flip]:
                arr.block_until_ready()

        cols1, cols2, size_rows, presents = [], [], [], []
        for j, ex in enumerate(examples):
            raw = ex["img_raw"]                     # (H, W, 3) uint8 RGB
            oh, ow = raw.shape[:2]
            if rl:
                ratio = rl / max(oh, ow)
                h1, w1 = int(oh * ratio), int(ow * ratio)
            else:
                h1, w1 = oh, ow
            cols1.append(_pe_valid_for((h1, w1), prep.canvas_in1, patch,
                                       self.pe_table, self._pe_cache))
            if self.msc:
                # the reference derives the 0.75-scale input from the
                # already-resized scale-1 tensor, not the original
                # (test_msc_flip_voc.py:81: F.interpolate(inputs, 0.75))
                h2, w2 = int(h1 * s2), int(w1 * s2)
                cols2.append(_pe_valid_for((h2, w2), prep.canvas_in2, patch,
                                           self.pe_table, self._pe_cache))
            else:
                h2 = w2 = patch
            size_rows.append((oh, ow, h1, w1, h2, w2))
            img_buf[j, oh:] = 0
            img_buf[j, :oh, ow:] = 0
            img_buf[j, :oh, :ow] = raw
            lab_buf[j, oh:] = 255
            lab_buf[j, :oh, ow:] = 255
            lab_buf[j, :oh, :ow] = np.asarray(ex["label"], np.uint8)
            presents.append(ex["present_mask"])

        # ONE uint8 original-resolution tensor shared by both scales — the
        # engine normalizes + resizes on device.  This is the whole image
        # transfer (~1/6 of shipping resized fp32 canvases; the axon tunnel
        # moves ~86 MB/s, so transfer size dominates end-to-end latency).
        img_dev = jnp.asarray(np.copy(img_buf) if self._copy_on_feed
                              else img_buf)

        def stack_scale(cols, w_px):
            pe, valid, gh, gw = zip(*cols)
            # pe/valid are cached device arrays: stack on device (no host copy)
            return ScaleBatch(img_dev,
                              jnp.stack(pe),
                              jnp.stack(valid),
                              jnp.asarray(np.asarray(gh, np.int32)),
                              jnp.asarray(np.asarray(gw, np.int32)),
                              jnp.asarray(np.asarray(w_px, np.int32)))

        w1s = [r[3] for r in size_rows]
        w2s = [r[5] for r in size_rows]
        sb1 = stack_scale(cols1, w1s)
        sb2 = stack_scale(cols2, w2s) if self.msc else sb1
        size_cols = np.ascontiguousarray(np.asarray(size_rows, np.int32).T)
        sizes = EvalSizes(*(jnp.asarray(c) for c in size_cols))
        presents = np.stack(presents)
        cls_idx, cls_active = self.class_compaction(presents)
        labels_dev = jnp.asarray(np.copy(lab_buf) if self._copy_on_feed
                                 else lab_buf)
        out = (sb1, sb2, sizes, labels_dev,
               jnp.asarray(presents), jnp.asarray(cls_idx),
               jnp.asarray(cls_active))
        if self.mesh is not None:
            from weclip_tpu.parallel import mesh as meshlib

            def shard(x):
                return jax.device_put(
                    x, meshlib.batch_sharding(self.mesh, np.ndim(x)))

            out = jax.tree_util.tree_map(shard, out)
            sb1, sb2, _, labels_dev = out[0], out[1], out[2], out[3]
        self._inflight[flip] = ((sb1.img, sb2.img, labels_dev) if self.msc
                                else (sb1.img, labels_dev))
        return out

    # -- dataset loop ---------------------------------------------------------
    def run(self, params, frozen, dataset,
            max_images: Optional[int] = None,
            progress: bool = False,
            crf: bool = False,
            crf_impl: str = "native",
            crf_stride: int = 4,
            save_dir: Optional[str] = None,
            logits_dir: Optional[str] = None,
            return_hists: bool = False,
            process_index: Optional[int] = None,
            process_count: Optional[int] = None) -> Dict[str, Dict]:
        """``crf_impl``: 'native' runs the exact permutohedral C++ lattice
        per image on the host (reference parity, utils/dcrf.py); 'jax' runs
        the approximate on-device mean field batched over the canvas —
        orders of magnitude faster when host cores are scarce.
        ``crf_stride``: bilateral subsampling stride of the jax impl
        (accuracy/speed dial).  Default 4 retains >=85% of the CRF's mIoU
        effect vs the exact lattice (<=0.15 pt at real-data CRF-gain
        scales, inside the ±0.3 parity budget); 8 is ~3x faster but
        budget-marginal (tests/test_crf.py::
        test_jax_crf_miou_delta_within_parity_budget).

        Multi-host contract (mirrors the r4 trainer fix, trainer.py:119) —
        two topologies, selected by the Evaluator's mesh:

        - **cross-process mesh** (trainer.validate / eval CLIs on a pod):
          the global-mesh SPMD contract — every process enumerates the
          IDENTICAL full example list, build_batch shards each global
          batch over the mesh, and the per-round psum over the data axis
          already makes the histograms global.  Per-process example
          sharding is disabled (and explicitly rejected) here: it would
          drop images, double-count hists, and desynchronize the hosts'
          collective dispatch counts.
        - **per-process Evaluators** (mesh=None or single-process mesh;
          the reference scripts/dist_clip_voc.py:139 DataLoader-sharding
          role): each process evaluates the disjoint strided shard
          ``range(n)[process_index::process_count]`` — strided, so VOC's
          size-sorted val lists spread evenly — and the confusion
          histograms are all-reduced across processes at the end, so
          every host returns the GLOBAL scores.  Defaults come from
          ``jax.process_index()/process_count()``; the automatic
          all-reduce only arms in that default mode (a real multi-process
          runtime, where every process executes this same call —
          process_allgather is collective).  Passing explicit values
          (both, never one) is the caller-managed/simulation mode: run
          returns the LOCAL shard's histograms (use ``return_hists=True``
          and sum them; tests/test_eval_multihost.py).

        Histograms travel as float32 (exact for per-cell counts < 2^24,
        off by <1e-7 relative above — the on-device accumulators are
        float32 already).  save_dir/logits_dir stay correct in shard
        mode: each process writes only its own disjoint shard's files."""
        cfg = self.cfg
        k = cfg.dataset.num_classes
        hists = (metrics.zero_hist(k), metrics.zero_hist(k), metrics.zero_hist(k))
        h_crf = np.zeros((k, k), np.float64)
        post = None
        crf_jax = None
        if crf and crf_impl == "jax":
            import jax as _jax
            import jax.numpy as _jnp
            from weclip_tpu.refine.crf import mean_field_crf_jax

            # strategy by subsampled-grid size: small grids batch the dense
            # untruncated kernel under vmap; mid-size grids (e.g. stride 4 @
            # 512px: 16384 points, a 1 GB kernel matrix) still take the
            # dense path but serialized per image with lax.map so only one
            # kernel matrix is live; larger grids fall back to the windowed
            # sum under vmap (thresholds measured in PARITY.md)
            canvas = self.prep.canvas_out
            n_sub = (canvas // crf_stride) ** 2
            one = lambda p, im: mean_field_crf_jax(
                p, im, cfg.eval.crf, bi_stride=crf_stride,
                dense_max_points=16384)

            @_jax.jit
            def crf_jax(logits, imgs):
                # logits (B,K,H,W) -> softmax -> per-image mean field -> argmax
                probs = _jax.nn.softmax(logits, axis=1)
                if 4096 < n_sub <= 16384:
                    ref = _jax.lax.map(lambda pi: one(*pi), (probs, imgs))
                else:  # small grids: dense kernel; huge grids: windowed sum
                    ref = _jax.vmap(lambda p, im: mean_field_crf_jax(
                        p, im, cfg.eval.crf, bi_stride=crf_stride))(probs, imgs)
                return _jnp.argmax(ref, axis=1)
        elif crf:
            from weclip_tpu.refine.crf import DenseCRF
            post = DenseCRF.from_config(cfg.eval.crf)
        bsz = cfg.eval.batch_images
        n = len(dataset) if max_images is None else min(len(dataset), max_images)
        if (process_index is None) != (process_count is None):
            # half-specified sharding would silently evaluate a partial
            # dataset and report its scores as full-dataset scores
            raise ValueError("pass both process_index and process_count or "
                             "neither")
        # An Evaluator holding a CROSS-PROCESS mesh (trainer.validate, the
        # eval CLIs on a pod) already runs the global-mesh SPMD contract:
        # every process enumerates the IDENTICAL full example list,
        # build_batch device_puts the same host values on every process
        # (mesh.py batch_sharding requires that), and the per-round psum
        # over the data axis makes the histograms global.  Per-process
        # example sharding there would drop images, double-count hists
        # (psum + allgather), and desynchronize collective dispatch counts
        # across hosts.  The per-process shard mode below is for the
        # OTHER topology: one Evaluator per process over process-local
        # devices (mesh=None or a single-process mesh), reference
        # scripts/dist_clip_voc.py:139's DataLoader sharding role.
        mesh_procs = (set() if self.mesh is None else
                      {d.process_index for d in
                       np.asarray(self.mesh.devices).flat})
        cross_process_mesh = len(mesh_procs) > 1
        auto_reduce = process_index is None and not cross_process_mesh
        if cross_process_mesh and process_index is not None:
            raise ValueError(
                "explicit process sharding is incompatible with a "
                "cross-process mesh: the global-mesh contract needs every "
                "process to enumerate the identical example list")
        if cross_process_mesh:
            pc, pi = 1, 0
        else:
            pc = jax.process_count() if process_count is None else process_count
            pi = jax.process_index() if process_index is None else process_index
        if not 0 <= pi < pc:
            raise ValueError(f"process_index {pi} outside [0, {pc})")
        my_idx = list(range(n))[pi::pc]
        auto_reduce = auto_reduce and pc > 1

        def prepare(s):
            idxs = my_idx[s:s + bsz]
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
        starts = list(range(0, len(my_idx), bsz))
        it = range(len(starts))
        if progress:
            from tqdm import tqdm
            it = tqdm(it, ncols=100)
        pending = pool.submit(prepare, starts[0]) if starts else None
        for i in it:
            examples, n_real, built = pending.result()
            if i + 1 < len(starts):
                pending = pool.submit(prepare, starts[i + 1])
            sb1, sb2, sizes, labels, presents, cls_idx, cls_active = built
            if save_dir is None and logits_dir is None and not crf:
                # hot path: ONE fused dispatch per round (see round_for)
                _, pred_msc, hists = self.round_for(cls_idx.shape[1])(
                    params, frozen, sb1, sb2, sizes, labels, presents,
                    cls_idx, cls_active, hists)
            else:
                scale1 = self.scale1_for(cls_idx.shape[1])
                seg_single, seg_avg1, cam_labels = scale1(
                    params, frozen, sb1, presents, sizes, cls_idx, cls_active)
                if self.msc:
                    seg_avg2 = self.scale2(params, frozen, sb2, presents,
                                           sizes)
                else:
                    seg_avg2 = seg_avg1
                _, pred_msc, hists = self.combine(
                    seg_single, seg_avg1, seg_avg2, cam_labels, labels,
                    sizes, hists)

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

            if logits_dir is not None:
                # per-image logit dumps (test_msc_flip_voc.py:111 saves
                # {"segs", "msc_segs"} npys that crf_proc re-reads)
                import os
                os.makedirs(os.path.join(logits_dir, "logit"), exist_ok=True)
                lg = np.asarray(self.msc_logits(seg_avg1, seg_avg2, sizes))
                sg = np.asarray(seg_single)
                # the reference's "segs" is the scale-1 grid at the image's
                # own (h1//16, w1//16) extent (no square canvas upstream) —
                # crop the padded grid so npy consumers that F.interpolate
                # it don't stretch dead padding columns across the image
                patch = self.cfg.clip.patch_size
                h1s, w1s = np.asarray(sizes.h1), np.asarray(sizes.w1)
                for j in range(n_real):
                    ex = examples[j]
                    oh, ow = ex["label"].shape
                    gh1, gw1 = int(h1s[j]) // patch, int(w1s[j]) // patch
                    np.save(os.path.join(logits_dir, "logit",
                                         str(ex["name"]) + ".npy"),
                            {"segs": sg[j, :, :gh1, :gw1][None],
                             "msc_segs": lg[j, :, :oh, :ow][None]})

            if crf_jax is not None:
                # approximate on-device mean field on the output canvas;
                # img_raw is edge-padded so boundary messages see replicated
                # content instead of zeros
                co = self.prep.canvas_out
                img_canvas = np.zeros((bsz, 3, co, co), np.float32)
                for j in range(n_real):
                    raw = examples[j].get("img_raw")
                    if raw is None:
                        raise ValueError("CRF needs 'img_raw' (HWC uint8) "
                                         "in dataset examples")
                    oh, ow = raw.shape[:2]
                    pad = np.pad(raw, [(0, co - oh), (0, co - ow), (0, 0)],
                                 mode="edge")
                    img_canvas[j] = pad.transpose(2, 0, 1)
                logits_dev = self.msc_logits(seg_avg1, seg_avg2, sizes)
                preds = np.asarray(crf_jax(logits_dev,
                                           jnp.asarray(img_canvas)))
                for j in range(n_real):
                    ex = examples[j]
                    oh, ow = ex["label"].shape
                    pred = preds[j, :oh, :ow]
                    gt = ex["label"]
                    m = (gt >= 0) & (gt < k)
                    h_crf += np.bincount(
                        k * gt[m].astype(np.int64) + pred[m],
                        minlength=k * k).reshape(k, k)

            if post is not None:
                # reference crf_proc: msc logits -> softmax -> dense CRF
                # (test_msc_flip_voc.py:140-158)
                logits = np.asarray(self.msc_logits(seg_avg1, seg_avg2, sizes))
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
        if auto_reduce:
            # global scores on every host: stack the four histograms into
            # one (4,K,K) float32 tensor so the collective is a single
            # allgather, then sum the per-process copies in float64
            from jax.experimental import multihost_utils
            stacked = np.stack([h_single, h_msc, h_cam,
                                h_crf.astype(np.float32)])
            gathered = np.asarray(
                multihost_utils.process_allgather(stacked), np.float64)
            h_single, h_msc, h_cam, h_crf = gathered.sum(axis=0)
        out = {
            "seg": metrics.scores(h_single),
            "msc_seg": metrics.scores(h_msc),
        }
        if self.with_cam:
            # with_cam=False runs no CAM chain — its histogram is an
            # all-zero-label pseudo-metric; omit it rather than return a
            # number indistinguishable from a real collapsed-CAM result
            out["cam"] = metrics.scores(h_cam)
        if post is not None or crf_jax is not None:
            out["crf_seg"] = metrics.scores(h_crf)
        if return_hists:
            out["hists"] = {"seg": h_single, "msc_seg": h_msc}
            if self.with_cam:
                out["hists"]["cam"] = h_cam
        return out
