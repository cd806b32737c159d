"""COCO msc-flip inference driver — parity with test_msc_flip_coco.py.

The reference's COCO val mode short-circuits before the CAM chain
(model_attn_aff_coco.py:131-132), so the evaluator runs seg-only."""

from __future__ import annotations

import dataclasses

from weclip_tpu.cli import common
from weclip_tpu.cli.eval_voc import run_eval


def main():
    args = common.eval_parser().parse_args()
    common.setup_logger()
    from weclip_tpu.core.config import coco_config, load_config
    cfg = load_config(args.config) if args.config else coco_config()
    if args.precision:
        cfg = dataclasses.replace(
            cfg, precision=dataclasses.replace(cfg.precision,
                                               compute_dtype=args.precision))
    run_eval(cfg, args, "coco")


if __name__ == "__main__":
    main()
