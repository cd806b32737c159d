"""VOC training driver — parity with scripts/dist_clip_voc.py.

Usage:
    python -m weclip_tpu.cli.train_voc --config configs/voc.yaml [--resume]
"""

from __future__ import annotations

from weclip_tpu.cli import common


def main():
    args = common.train_parser().parse_args()
    cfg = common.load_train_config(args, "voc")

    from weclip_tpu.data.voc import VOCSegDataset
    from weclip_tpu.train.trainer import train
    val = None
    try:
        val = VOCSegDataset(cfg.dataset, split="train", stage="train")
    except (FileNotFoundError, OSError):
        pass
    profile_steps = (tuple(int(x) for x in args.profile.split(":"))
                     if args.profile else None)
    train(cfg, resume=args.resume, val_dataset=val,
          profile_steps=profile_steps)


if __name__ == "__main__":
    main()
