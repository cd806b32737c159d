"""COCO dataset layout: name-prefix stripping, grayscale promotion,
class-set quirk with 81 classes."""

import os

import numpy as np
import pytest
from PIL import Image

from weclip_tpu.core.config import DatasetConfig
from weclip_tpu.data.coco import CocoClsDataset, CocoSegDataset, _strip


def make_fake_coco(root, n=3):
    os.makedirs(f"{root}/JPEGImages/train", exist_ok=True)
    os.makedirs(f"{root}/JPEGImages/val", exist_ok=True)
    os.makedirs(f"{root}/SegmentationClass/train", exist_ok=True)
    os.makedirs(f"{root}/SegmentationClass/val", exist_ok=True)
    os.makedirs(f"{root}/lists", exist_ok=True)
    rng = np.random.default_rng(0)
    names = {"train": [], "val": []}
    for split, prefix in (("train", "COCO_train2014_"), ("val", "COCO_val2014_")):
        for i in range(n):
            stem = f"{i:012d}"
            name = prefix + stem
            names[split].append(name)
            h, w = 70 + i * 8, 90
            img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            if i == 1:                      # grayscale image (coco.py:20-25)
                Image.fromarray(img[..., 0]).save(
                    f"{root}/JPEGImages/{split}/{name}.jpg")
            else:
                Image.fromarray(img).save(
                    f"{root}/JPEGImages/{split}/{name}.jpg")
            lab = np.zeros((h, w), np.uint8)
            lab[:8, :8] = 7 + i
            Image.fromarray(lab).save(
                f"{root}/SegmentationClass/{split}/{stem}.png")
        with open(f"{root}/lists/{split}.txt", "w") as f:
            f.write("\n".join(names[split]))
    return names


def test_strip_matches_reference_slicing():
    # datasets/coco.py:62,68: name[15:] for train, name[13:] for val
    assert _strip("COCO_train2014_000000000139", "train") == "000000000139"
    assert _strip("COCO_val2014_000000000139", "val") == "000000000139"


def test_coco_datasets(tmp_path):
    root = str(tmp_path)
    make_fake_coco(root)
    cfg = DatasetConfig(name="coco", root_dir=root,
                        name_list_dir=f"{root}/lists", num_classes=81,
                        crop_size=64)

    ds = CocoClsDataset(cfg, split="train", seed=0)
    assert len(ds) == 3
    ex = ds[1]                              # the grayscale one
    assert ex["img"].shape == (3, 64, 64)
    assert ex["present_mask"].shape == (80,)
    assert ex["present_mask"][7]            # class id 8 -> fg index 7 (ids-1)
    # background drops out (uint8 0-1 -> 255, removed; clip_tool.py:229-233)
    assert not ex["present_mask"][79]
    assert ex["present_mask"].sum() == 1

    dsv = CocoSegDataset(cfg, split="val")
    exv = dsv[0]
    assert exv["img_raw"].shape[-1] == 3
    assert exv["label"].shape == exv["img_raw"].shape[:2]
    assert exv["img_raw"].dtype == np.uint8


def test_coco_label_free_split_all_ignore(tmp_path):
    """A name with no label PNG (e.g. a test split) yields an all-255
    ignore label of the image's extent (coco.py read_label fallback,
    mirroring voc.py's label-free behavior)."""
    root = str(tmp_path)
    make_fake_coco(root)
    # remove one val label so read_label takes the label-free branch
    os.remove(f"{root}/SegmentationClass/val/000000000000.png")
    cfg = DatasetConfig(name="coco", root_dir=root,
                        name_list_dir=f"{root}/lists", num_classes=81,
                        crop_size=64)
    ds = CocoSegDataset(cfg, split="val")
    ex = ds[0]
    assert (ex["label"] == 255).all()
    assert ex["label"].shape == ex["img_raw"].shape[:2]
