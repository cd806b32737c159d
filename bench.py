"""Headline benchmark: msc-flip VOC inference throughput at 512px.

Measures steady-state images/sec/chip through the batched TTA engine —
scale 1.0 with the full CAM -> walk -> PAR pseudo-label chain + hflip,
scale 0.75 seg-only + hflip, on-device scale fusion and argmax — i.e. the
work test_msc_flip_voc.py does per image, minus the work it provably
discards (CAMs of flipped/0.75 passes).

Prints ONE JSON line:
  {"metric": ..., "value": imgs/sec/chip, "unit": ..., "vs_baseline": ...}

Baseline: the reference publishes no throughput anywhere (BASELINE.md).
A100_EST_IMGS_PER_SEC is derived from a timed run of the actual reference
pipeline (tools/measure_reference_cpu.py: full-size reference WeCLIP, the
exact test_msc_flip_voc.py per-image protocol, measured per-stage on a
146.5 GFLOP/s single-thread CPU; raw numbers in
BASELINE_cpu_measurement.json) transferred stage-by-stage to A100
effective rates, cross-checked against the paper's published 3090
training wall-clock.  Result: 4-13 img/s, central 5.0 — see BASELINE.md
"A100 throughput baseline" for the full table and uncertainty band.
The north-star target is >= 5x that (BASELINE.json): vs_baseline >= 5.0.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_EST_IMGS_PER_SEC = 5.0          # measured derivation, BASELINE.md


def main():
    import jax
    from weclip_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    from weclip_tpu.core import precision
    from weclip_tpu.core.config import Config
    from weclip_tpu.evalx import metrics
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit

    cfg = Config()                                  # ViT-B/16, VOC, 21 classes
    batch = cfg.eval.batch_images
    rng = np.random.default_rng(0)

    key = jax.random.PRNGKey(0)
    clip_params = vit.init_clip_params(key, cfg.clip)
    nfg = cfg.dataset.num_classes - 1
    fg = rng.standard_normal((nfg, cfg.clip.embed_dim)).astype(np.float32)
    bg = rng.standard_normal((25, cfg.clip.embed_dim)).astype(np.float32)
    fg /= np.linalg.norm(fg, axis=-1, keepdims=True)
    bg /= np.linalg.norm(bg, axis=-1, keepdims=True)
    frozen = weclip.build_frozen_state(clip_params, fg, bg)
    params = weclip.init_trainable_params(jax.random.fold_in(key, 1), cfg)

    # synthetic VOC-like val set (typical size 375x500, <= 500 per side)
    sizes = [(375, 500), (500, 375), (333, 500), (500, 500)]
    examples = []
    for i in range(batch):
        oh, ow = sizes[i % len(sizes)]
        present = np.zeros(nfg, bool)
        present[rng.integers(0, nfg)] = True
        present[nfg - 1] = True                       # bg quirk class
        examples.append({
            "img": rng.standard_normal((3, oh, ow)).astype(np.float32),
            "label": rng.integers(0, 21, (oh, ow)).astype(np.int32),
            "present_mask": present,
        })

    prep = make_prep(cfg, max_ori=512, resize_long=cfg.eval.resize_long)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    policy = precision.make_policy("bfloat16")
    ev = Evaluator(cfg, prep, pe, policy=policy, with_cam=True, msc=True)

    (sb1, sb2, sizes, labels, presents,
     cls_idx, cls_active) = ev.build_batch(examples)
    scale1 = ev.scale1_for(cls_idx.shape[1])
    k = cfg.dataset.num_classes
    hists = (metrics.zero_hist(k),) * 3

    def one_round(hists):
        seg_single, seg_avg1, cam_labels = scale1(params, frozen, sb1,
                                                  presents, sizes,
                                                  cls_idx, cls_active)
        seg_avg2 = ev.scale2(params, frozen, sb2, presents)
        ps, pm, hists = ev.combine(seg_single, seg_avg1, seg_avg2,
                                   cam_labels, labels, sizes, hists)
        return ps, pm, hists

    # warmup (compile).  NOTE: jax.block_until_ready is a NO-OP over the
    # axon tunnel — only a host read forces execution, so the timing
    # barrier is an np.asarray of the hist chain (which depends on every
    # round's scale1+scale2+combine).
    ps, pm, hists = one_round(hists)
    np.asarray(hists[0])

    # 3 windows of 6 rounds, best window wins: single-window timings vary
    # +-7% run-to-run from host/tunnel scheduling noise, and the minimum is
    # the standard steady-state estimator for that noise profile.
    rounds = 6
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(rounds):
            ps, pm, hists = one_round(hists)
        np.asarray(hists[0])
        np.asarray(ps)
        dt = min(dt, time.perf_counter() - t0)

    n_dev = max(jax.device_count(), 1)
    imgs_per_sec_per_chip = rounds * batch / dt / n_dev
    print(json.dumps({
        "metric": "mscflip_voc_inference_512px",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / A100_EST_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
