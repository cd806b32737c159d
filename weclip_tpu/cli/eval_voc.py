"""VOC msc-flip inference driver — parity with test_msc_flip_voc.py.

Usage:
    python -m weclip_tpu.cli.eval_voc --model_path <ckpt dir> \
        --config configs/voc.yaml [--crf]
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from weclip_tpu.cli import common

log = logging.getLogger("weclip_tpu")


def run_eval(cfg, args, dataset_name: str):
    from weclip_tpu.core import precision
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from weclip_tpu.train import checkpoint
    from weclip_tpu.train.trainer import build_frozen
    from weclip_tpu.train.step import create_train_state
    import jax

    policy = precision.make_policy(cfg.precision.compute_dtype)
    frozen, clip_params, cfg = build_frozen(cfg)
    state, _ = create_train_state(jax.random.PRNGKey(0), cfg)
    params = state.params
    if args.model_path:
        params, _, step = checkpoint.restore(args.model_path,
                                             template={"params": params,
                                                       "step": np.asarray(0)})
        log.info("restored step %d from %s", step, args.model_path)
    else:
        log.warning("no --model_path: evaluating randomly initialized heads")

    if dataset_name == "coco":
        from weclip_tpu.data.coco import CocoSegDataset
        ds = CocoSegDataset(cfg.dataset, split=args.eval_set)
        max_ori = 640
    else:
        from weclip_tpu.data.voc import VOCSegDataset
        ds = VOCSegDataset(cfg.dataset, split=args.eval_set,
                           stage="test" if "test" in args.eval_set else "val")
        max_ori = 512

    # msc-flip TTA batched across TPU cores (BASELINE.md north star):
    # shard the eval batch over a data mesh, replicate the weights
    cfg, mesh, params, frozen = common.build_eval_mesh(cfg, args, params,
                                                       frozen)
    prep = make_prep(cfg, max_ori=max_ori, resize_long=args.resize_long)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=policy,
                   with_cam=(dataset_name == "voc"), msc=True, mesh=mesh)
    scores = ev.run(params, frozen, ds, max_images=args.max_images,
                    progress=True, crf=args.crf, crf_impl=args.crf_impl,
                    crf_stride=args.crf_stride,
                    save_dir=args.work_dir if args.save_preds else None,
                    logits_dir=args.work_dir if args.save_logits else None)
    if "cam" in scores:                       # COCO val runs seg-only
        log.info("cams score:\n%s", scores["cam"])
    log.info("segs score:\n%s", scores["seg"])
    log.info("msc segs score:\n%s", scores["msc_seg"])
    if "crf_seg" in scores:
        log.info("crf segs score:\n%s", scores["crf_seg"])
    return scores


def main():
    args = common.eval_parser().parse_args()
    common.setup_logger()
    from weclip_tpu.core.config import Config, load_config
    cfg = load_config(args.config) if args.config else Config()
    if args.precision:
        cfg = dataclasses.replace(
            cfg, precision=dataclasses.replace(cfg.precision,
                                               compute_dtype=args.precision))
    run_eval(cfg, args, "voc")


if __name__ == "__main__":
    main()
