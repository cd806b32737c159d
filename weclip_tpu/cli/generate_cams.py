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

    import jax
    import jax.numpy as jnp
    from weclip_tpu.core import precision
    from weclip_tpu.core.config import Config, load_config
    from weclip_tpu.cam.gradcam import _minmax_valid, gradcam_batch
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from weclip_tpu.refine import affinity as aff
    from weclip_tpu.train.trainer import build_frozen
    from weclip_tpu.models import weclip as weclip_mod

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
    num_fg = cfg.dataset.num_classes - 1

    from weclip_tpu.evalx.engine import _dev_ops_cam, prepare_scale1_images

    @jax.jit
    def cams_for_batch(fz, sb, presents, sizes):
        # ``fz`` (the frozen CLIP tree) MUST be an argument, not a closure
        # capture — closure-captured arrays become HLO constants and the
        # ~340MB program overflows remote-compile request limits.
        g = prep.canvas_in1 // cfg.clip.patch_size
        # shipped uint8 originals -> normalized resize-long canvases
        imgs1 = prepare_scale1_images(sb.img, sizes, cfg, prep.canvas_in1)
        batch = weclip_mod.Batch(imgs1, sb.pos_emb, sb.valid, sb.gh, sb.gw,
                                 presents)
        vit_mod = __import__("weclip_tpu.models.clip.vit", fromlist=["vit"])
        feats = vit_mod.vision_forward_frozen(
            fz["visual"], batch.img, batch.pos_emb, batch.valid, cfg.clip,
            policy=policy)
        # slice the stream-padded features (vit.VisionFeatures) back to the
        # grid length: the CAM engines accept stream-padded inputs via
        # num_patches= (cam/variants.py, cam/gradcam.py), but the walk
        # consumers below (fuse_attention_plain, sinkhorn) want the
        # unpadded attention stack anyway, so one up-front slice is
        # simplest (offline generator — the copy is not on the headline
        # path)
        l0 = sb.valid.shape[1]
        feats = vit_mod.VisionFeatures(feats.layer_tokens[:, :, :l0],
                                       feats.layer_attn[:, :, :l0, :l0],
                                       feats.valid[:, :l0])
        text = jnp.concatenate([fz["fg_text"], fz["bg_text"]], 0)
        tmask = jnp.concatenate(
            [presents.astype(bool),
             jnp.ones((sb.img.shape[0], fz["bg_text"].shape[0]), bool)], 1)
        cam_out = gradcam_batch(fz["visual"], fz["logit_scale"],
                                feats.layer_tokens[-1], text, tmask,
                                sb.valid, num_fg, cfg.clip, policy)
        if args.cam_method == "grad_cam":
            cams = cam_out.cams
        else:
            from weclip_tpu.cam import variants
            ci = jnp.arange(num_fg, dtype=jnp.int32)
            cams = jax.vmap(lambda x, tm, v: variants.cam_single(
                args.cam_method, fz["visual"], fz["logit_scale"],
                x, text, tm, v, ci, cfg.clip, policy))(
                    feats.layer_tokens[-1], tmask, sb.valid)
        fused = aff.fuse_attention_plain(feats.layer_attn, cam_out.attn_last,
                                         cfg.cam.attn_fuse_layers)

        def walk_one(cams_i, fused_i, valid_i, gh_i, gw_i):
            trans = aff.sinkhorn_transition(fused_i, valid_i,
                                            cfg.cam.sinkhorn_iters)
            return aff.random_walk_cams(cams_i, trans, valid_i.reshape(g, g),
                                        gh_i, gw_i, cfg.cam.bbox_threshold)

        refined = jax.vmap(walk_one)(cams, fused, sb.valid[:, 1:],
                                     sb.gh, sb.gw)
        normed = jax.vmap(jax.vmap(
            lambda c, v: _minmax_valid(c, v.astype(bool)),
            in_axes=(0, None)))(refined, sb.valid[:, 1:])
        # grid -> original resolution
        mh_cam, mw_cam = _dev_ops_cam(sizes, prep.canvas_out, prep.grid1,
                                      cfg.clip.patch_size)
        grid = normed.reshape(normed.shape[0], num_fg, g, g)
        y = jnp.einsum("bog,bcgh->bcoh", mh_cam, grid)
        return jnp.einsum("bph,bcoh->bcop", mw_cam, y)

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
            np.save(os.path.join(args.out, ex["name"] + ".npy"),
                    {"keys": keys,
                     "attn_highres": highres[j, keys, :oh, :ow]})
        log.info("%d / %d", min(s + bsz, n), n)


if __name__ == "__main__":
    main()
