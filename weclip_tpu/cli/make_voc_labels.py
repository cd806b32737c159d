"""Regenerate VOC image-level one-hot labels + name lists.

The reference ships ``datasets/voc/cls_labels_onehot.npy`` and the split txt
files as repo data; this tool rebuilds them from a VOCdevkit checkout so the
framework has no binary-blob dependency.

Usage:
    python -m weclip_tpu.cli.make_voc_labels \
        --root /data/VOCdevkit/VOC2012 --name_list_dir /data/weclip/datasets/voc
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--name_list_dir", required=True)
    p.add_argument("--num_classes", default=21, type=int)
    p.add_argument("--splits", default="train_aug,train,val,trainval",
                   help="comma-separated split txt files to scan")
    args = p.parse_args()

    os.makedirs(args.name_list_dir, exist_ok=True)
    names = set()
    for split in args.splits.split(","):
        lst = os.path.join(args.name_list_dir, split + ".txt")
        if not os.path.exists(lst):
            # derive train/val lists from the VOC ImageSets if absent
            src = os.path.join(args.root, "ImageSets", "Segmentation",
                               split + ".txt")
            if os.path.exists(src):
                with open(src) as f:
                    content = f.read()
                with open(lst, "w") as f:
                    f.write(content)
            else:
                continue
        with open(lst) as f:
            names.update(x.strip() for x in f if x.strip())

    out = {}
    for name in sorted(names):
        path = os.path.join(args.root, "SegmentationClassAug", name + ".png")
        if not os.path.exists(path):
            path = os.path.join(args.root, "SegmentationClass", name + ".png")
        lab = np.asarray(Image.open(path))
        # reference blob format (datasets/voc/cls_labels_onehot.npy):
        # (num_fg,) float32, foreground index = class_id - 1
        onehot = np.zeros(args.num_classes - 1, np.float32)
        ids = np.unique(lab)
        ids = ids[(ids != 0) & (ids != 255)]
        onehot[ids - 1] = 1
        out[name] = onehot
    dst = os.path.join(args.name_list_dir, "cls_labels_onehot.npy")
    np.save(dst, out)
    print(f"wrote {dst} ({len(out)} images)")


if __name__ == "__main__":
    main()
