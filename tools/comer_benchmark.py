"""CoMer functional benchmark (VERDICT r4 #6): does the ViT-CoMer branch
*help*, not merely train?

No ground truth exists for WeCLIP+ViT-CoMer (the reference ships only
`ViT_CoMer.pdf`; no code, no numbers — BASELINE.md), so this benchmark
manufactures a task where the paper's claim is falsifiable: a small
fully-supervised synthetic segmentation problem whose classes are defined
by LOCAL TEXTURE (oriented sinusoidal gratings inside geometric shapes).
A frozen *random* ViT embeds patches through one fixed linear projection —
nearly classless for texture — while CoMer's conv stem + MRFP multi-scale
convs see exactly this structure.  Both arms share the identical frozen
backbone, fuse/decoder heads, data stream, seeds, and optimizer; the only
difference is `cfg.comer.enabled`.  If CTI/MRFP add representational
power, the CoMer arm must win held-out mIoU; if it does not, this tool
records the honest negative.

Run (CPU is fine; tiny dims):  python -m tools.comer_benchmark
  [--steps 300] [--eval_n 16] [--batch 4] [--seed 0]

Prints one JSON line: {"comer_miou": ..., "plain_miou": ..., "delta": ...}
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_texture_example(rng: np.random.Generator, px: int, num_classes: int):
    """One image: grey-noise background (class 0) + 1-3 shape regions,
    each filled with its class's oriented grating (class c gets angle
    c*pi/C and a distinct frequency) — segmentable from local texture."""
    img = rng.normal(0.0, 0.15, (px, px, 3)).astype(np.float32)
    label = np.zeros((px, px), np.int32)
    yy, xx = np.mgrid[0:px, 0:px].astype(np.float32)
    for _ in range(int(rng.integers(1, 4))):
        c = int(rng.integers(1, num_classes))
        ang = np.pi * c / num_classes
        freq = 0.25 + 0.15 * c
        cx, cy = rng.uniform(px * 0.2, px * 0.8, 2)
        r = rng.uniform(px * 0.12, px * 0.3)
        if rng.random() < 0.5:
            mask = (np.abs(xx - cx) < r) & (np.abs(yy - cy) < r * 0.8)
        else:
            mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r ** 2
        tex = np.sin(freq * (np.cos(ang) * xx + np.sin(ang) * yy))
        for ch in range(3):
            img[..., ch] = np.where(mask, 0.8 * tex + 0.1 * ch, img[..., ch])
        label = np.where(mask, c, label)
    return img.transpose(2, 0, 1), label


def run_arm(comer: bool, steps: int, batch: int, eval_n: int, seed: int):
    import jax
    import jax.numpy as jnp
    from tests import tiny
    from weclip_tpu.core import precision
    from weclip_tpu.core.config import ComerConfig
    from weclip_tpu.evalx import metrics
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    from weclip_tpu.ops.resize import resize_bilinear
    from weclip_tpu.train import seg_step

    cfg = tiny.tiny_config()
    if comer:
        # the tests' small CoMer dims (tests/test_comer.py::small_comer_cfg)
        cfg = dataclasses.replace(cfg, comer=ComerConfig(
            enabled=True, stem_width=8, pyramid_dims=(16, 16, 16),
            mrfp_dilations=(1, 2), cti_heads=2, interaction_indexes=(2, 5)))
    crop = cfg.dataset.crop_size
    k = cfg.dataset.num_classes
    g = crop // cfg.clip.patch_size
    policy = precision.FP32

    # identical frozen backbone + data stream for both arms
    frozen, clip_params = tiny.tiny_frozen(cfg, seed=seed)
    pos = vit.build_pos_emb(clip_params["visual"], g, g)[None]
    valid = jnp.ones((batch, g * g + 1), bool)
    present = jnp.ones((batch, k - 1), bool)

    state, tx = seg_step.create_seg_train_state(jax.random.PRNGKey(seed), cfg)
    fn = seg_step.make_seg_train_step(cfg, tx, policy=policy)
    key = jax.random.PRNGKey(seed + 1)

    rng = np.random.default_rng(seed + 123)
    losses = []
    for _ in range(steps):
        imgs, labels = zip(*(make_texture_example(rng, crop, k)
                             for _ in range(batch)))
        b = weclip.Batch(img=jnp.asarray(np.stack(imgs)), pos_emb=pos,
                         valid=valid,
                         gh=jnp.full((batch,), g, jnp.int32),
                         gw=jnp.full((batch,), g, jnp.int32),
                         present_mask=present)
        state, met = fn(state, frozen, b, jnp.asarray(np.stack(labels)), key)
        losses.append(float(met.loss))

    # held-out eval: single-scale seg argmax, streamed into one confusion
    # histogram (eval data from a DISJOINT generator seed)
    @jax.jit
    def seg_pred(params, img):
        b2 = weclip.Batch(img=img, pos_emb=pos, valid=valid,
                          gh=jnp.full((batch,), g, jnp.int32),
                          gw=jnp.full((batch,), g, jnp.int32),
                          present_mask=present)
        _, head_out, _, _ = weclip.backbone_and_heads(
            params, frozen, b2, cfg, None, policy, with_attn=False)
        seg_grid = head_out.seg.reshape(batch, g, g, -1).transpose(0, 3, 1, 2)
        return jnp.argmax(resize_bilinear(seg_grid, crop, crop), axis=1)

    erng = np.random.default_rng(seed + 999)
    hist = np.zeros((k, k), np.float64)
    done = 0
    while done < eval_n:
        imgs, labels = zip(*(make_texture_example(erng, crop, k)
                             for _ in range(batch)))
        preds = np.asarray(seg_pred(state.params, jnp.asarray(np.stack(imgs))))
        for p, l in zip(preds, labels):
            hist += np.bincount(k * l.reshape(-1) + p.reshape(-1),
                                minlength=k * k).reshape(k, k)
        done += batch
    return metrics.scores(hist)["miou"], losses


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--eval_n", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of seeds (single-seed deltas sit inside "
                         "seed noise on this task; >=3 for a claim)")
    args = ap.parse_args(argv)

    plain, comer, plain_fl, comer_fl = [], [], [], []
    for s in range(args.seed, args.seed + args.seeds):
        pm, pl = run_arm(False, args.steps, args.batch, args.eval_n, s)
        cm, cl = run_arm(True, args.steps, args.batch, args.eval_n, s)
        plain.append(float(pm)); comer.append(float(cm))
        plain_fl.append(float(np.mean(pl[-10:])))
        comer_fl.append(float(np.mean(cl[-10:])))
        if args.seeds > 1:
            print(json.dumps({"seed": s, "plain_miou": round(pm, 4),
                              "comer_miou": round(cm, 4)}))
    out = {
        "task": "synthetic_texture_seg",
        "steps": args.steps,
        "seeds": args.seeds,
        "plain_miou": round(float(np.mean(plain)), 4),
        "comer_miou": round(float(np.mean(comer)), 4),
        "delta": round(float(np.mean(comer) - np.mean(plain)), 4),
        "plain_std": round(float(np.std(plain)), 4),
        "comer_std": round(float(np.std(comer)), 4),
        "plain_final_loss": round(float(np.mean(plain_fl)), 4),
        "comer_final_loss": round(float(np.mean(comer_fl)), 4),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
