"""Host data-pipeline throughput: JPEG decode + augment vs the device rate.

The reference hides decode cost behind DataLoader(num_workers=10,
prefetch_factor=4) worker *processes* (scripts/dist_clip_voc.py:168-174).
This host is few-core and PrefetchLoader uses GIL-bound threads, so the
question VERDICT r1 #7 asks is: can the Python pipeline feed the ~108 img/s
device train step?  This script measures it on synthetic JPEGs at VOC-like
sizes, with and without the pre-decoded .npy cache
(DatasetConfig.decoded_cache_dir).

Usage: python tools/measure_host_pipeline.py [--n 64] [--batches 24]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_voc_tree(root: str, n: int, seed: int = 0):
    """Synthetic VOC tree with realistic JPEG decode cost (smooth content +
    noise at 500x375, quality 95 like camera images)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "JPEGImages")
    lab_dir = os.path.join(root, "SegmentationClassAug")
    lst_dir = os.path.join(root, "lists")
    for d in (img_dir, lab_dir, lst_dir):
        os.makedirs(d, exist_ok=True)
    names = [f"synth_{i:04d}" for i in range(n)]
    yy, xx = np.mgrid[0:375, 0:500].astype(np.float32)
    cls = {}
    for i, name in enumerate(names):
        base = (np.stack([np.sin(xx / (20 + i % 7)) * 127 + 128,
                          np.cos(yy / (25 + i % 5)) * 127 + 128,
                          ((xx + yy) % 255)], axis=-1)
                + rng.normal(0, 12, (375, 500, 3))).clip(0, 255)
        Image.fromarray(base.astype(np.uint8)).save(
            os.path.join(img_dir, name + ".jpg"), quality=95)
        lab = np.zeros((375, 500), np.uint8)
        lab[100:300, 100:400] = (i % 20) + 1
        Image.fromarray(lab).save(os.path.join(lab_dir, name + ".png"))
        onehot = np.zeros(20, np.uint8)
        onehot[i % 20] = 1
        cls[name] = onehot
    with open(os.path.join(lst_dir, "train_aug.txt"), "w") as f:
        f.write("\n".join(names))
    np.save(os.path.join(lst_dir, "cls_labels_onehot.npy"), cls,
            allow_pickle=True)
    return lst_dir


def time_loader(ds, batch_size: int, n_batches: int, threads: int = 2):
    from weclip_tpu.data.loader import PrefetchLoader
    loader = PrefetchLoader(ds, batch_size=batch_size, shuffle=True, seed=0,
                            num_threads=threads)
    it = iter(loader)
    next(it)                                     # warm the queue
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    loader.close() if hasattr(loader, "close") else None
    return batch_size * n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    from weclip_tpu.core.config import DatasetConfig
    from weclip_tpu.data.voc import VOCClsDataset

    tmp = tempfile.mkdtemp(prefix="hostpipe_")
    lst = build_voc_tree(tmp, args.n)
    cfg = DatasetConfig(root_dir=tmp, name_list_dir=lst)

    ds = VOCClsDataset(cfg, "train_aug", seed=0)
    t0 = time.perf_counter()
    for i in range(min(32, args.n)):
        ds[i]
    single = min(32, args.n) / (time.perf_counter() - t0)

    jpeg_rate = time_loader(VOCClsDataset(cfg, "train_aug", seed=0),
                            args.batch_size, args.batches)

    cache_cfg = dataclasses.replace(
        cfg, decoded_cache_dir=os.path.join(tmp, "decoded"))
    warm = VOCClsDataset(cache_cfg, "train_aug", seed=0)
    for i in range(args.n):
        warm[i]                                   # populate the cache
    cached_rate = time_loader(VOCClsDataset(cache_cfg, "train_aug", seed=0),
                              args.batch_size, args.batches)

    print(json.dumps({
        "single_thread_jpeg_imgs_per_s": round(single, 1),
        "prefetch2_jpeg_imgs_per_s": round(jpeg_rate, 1),
        "prefetch2_cached_imgs_per_s": round(cached_rate, 1),
        "device_train_rate_imgs_per_s_ref": 108,
    }, indent=1))


if __name__ == "__main__":
    main()
