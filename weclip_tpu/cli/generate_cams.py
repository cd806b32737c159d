"""Offline CAM generation — parity with clip/generate_cams_voc12.py /
generate_cams_coco14.py (CLIP-ES-style standalone entry point).

The reference shards the dataset across GPU processes with
torch.multiprocessing and writes {keys, attn_highres} npy files per image
(generate_cams_voc12.py:211-216,244-249).  Here one batched jitted program
computes GradCAMs + the attention-affinity walk for a whole batch of images
and the data-parallel mesh replaces process sharding.

Usage:
    python -m weclip_tpu.cli.generate_cams --config configs/voc.yaml \
        --split train_aug --out cams/
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from weclip_tpu.cli import common

log = logging.getLogger("weclip_tpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, type=str)
    p.add_argument("--split", default="train_aug", type=str)
    p.add_argument("--out", default="cams", type=str)
    p.add_argument("--resize_long", default=512, type=int)
    p.add_argument("--max_images", default=None, type=int)
    p.add_argument("--cam_method", default="grad_cam", type=str,
                   choices=["grad_cam", "grad_cam_pp", "xgrad_cam",
                            "layer_cam", "eigen_cam", "eigen_grad_cam",
                            "score_cam", "ablation_cam"],
                   help="CAM engine (pytorch_grad_cam method surface; the "
                        "reference's live path is grad_cam)")
    common.add_mesh_arg(p)
    args = p.parse_args()
    common.setup_logger()

    from weclip_tpu.core import precision
    from weclip_tpu.core.config import Config, load_config
    from weclip_tpu.cam.highres import make_cam_program
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from weclip_tpu.train.trainer import build_frozen

    cfg = load_config(args.config) if args.config else Config()
    frozen, clip_params, cfg = build_frozen(cfg)
    policy = precision.make_policy(cfg.precision.compute_dtype)

    if cfg.dataset.name == "coco":
        from weclip_tpu.data.coco import CocoSegDataset as DS
    else:
        from weclip_tpu.data.voc import VOCSegDataset as DS
    ds = DS(cfg.dataset, split=args.split, stage="train")

    # data-parallel CAM generation: the mesh replaces the reference's
    # torch.multiprocessing process sharding (generate_cams_voc12.py:244)
    cfg, mesh, _, frozen = common.build_eval_mesh(cfg, args, {}, frozen)
    prep = make_prep(cfg, max_ori=640 if cfg.dataset.name == "coco" else 512,
                     resize_long=args.resize_long)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=policy, with_cam=True, msc=False,
                   mesh=mesh)
    cams_for_batch = make_cam_program(cfg, prep, policy,
                                      method=args.cam_method, mesh=mesh)

    os.makedirs(args.out, exist_ok=True)
    bsz = cfg.eval.batch_images
    n = len(ds) if args.max_images is None else min(len(ds), args.max_images)
    for s in range(0, n, bsz):
        examples = [ds[i] for i in range(s, min(s + bsz, n))]
        n_real = len(examples)
        while len(examples) < bsz:
            examples.append(examples[-1])
        sb1, _, sizes, _, presents, _, _ = ev.build_batch(examples)
        highres = np.asarray(cams_for_batch(frozen, sb1, presents, sizes))
        for j in range(n_real):
            ex = examples[j]
            oh, ow = ex["label"].shape
            keys = np.where(np.asarray(ex["present_mask"]))[0]
            # fp16 maps, like the reference (generate_cams_voc12.py:211-215
            # saves refined CAMs .astype(np.float16))
            np.save(os.path.join(args.out, ex["name"] + ".npy"),
                    {"keys": keys,
                     "attn_highres": highres[j, keys, :oh, :ow]
                     .astype(np.float16)})
        log.info("%d / %d", min(s + bsz, n), n)


if __name__ == "__main__":
    main()
