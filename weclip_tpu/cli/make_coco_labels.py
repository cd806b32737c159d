"""Regenerate COCO image-level one-hot labels from segmentation PNGs.

The reference snapshot ships VOC's cls_labels_onehot.npy but the COCO one
was stripped (SURVEY appendix: .MISSING_LARGE_BLOBS); this tool rebuilds it
by scanning the SegmentationClass masks (ids 1..80; 0 = background,
255 = ignore), matching datasets/voc.py's VOC convention.

Usage:
    python -m weclip_tpu.cli.make_coco_labels \
        --root /data/coco2014 --name_list_dir /data/weclip/datasets/coco
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
    p.add_argument("--num_classes", default=81, type=int)
    args = p.parse_args()

    out = {}
    for split in ("train", "val"):
        lst = os.path.join(args.name_list_dir, split + ".txt")
        if not os.path.exists(lst):
            continue
        with open(lst) as f:
            names = [x.strip() for x in f if x.strip()]
        from weclip_tpu.data.coco import _strip
        for name in names:
            stripped = _strip(name, split)
            path = os.path.join(args.root, "SegmentationClass", split,
                                stripped + ".png")
            lab = np.asarray(Image.open(path))
            # same blob format as VOC (make_voc_labels.py): (num_fg,)
            # float32, foreground index = class_id - 1
            onehot = np.zeros(args.num_classes - 1, np.float32)
            ids = np.unique(lab)
            ids = ids[(ids != 0) & (ids != 255)]
            onehot[ids - 1] = 1
            out[name] = onehot
        print(f"{split}: {len(names)} images")

    dst = os.path.join(args.name_list_dir, "cls_labels_onehot.npy")
    np.save(dst, out)
    print("wrote", dst)


if __name__ == "__main__":
    main()
