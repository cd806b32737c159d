"""COCO training driver — parity with scripts/dist_clip_coco.py
(80k iters, checkpoints after 40k, no mid-training validation)."""

from __future__ import annotations

from weclip_tpu.cli import common


def main():
    args = common.train_parser().parse_args()
    cfg = common.load_train_config(args, "coco")
    from weclip_tpu.train.trainer import train
    train(cfg, resume=args.resume, val_dataset=None)


if __name__ == "__main__":
    main()
