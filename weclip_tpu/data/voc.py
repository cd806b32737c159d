"""PASCAL VOC 2012 (aug) datasets — host-side numpy pipeline.

Mirrors datasets/voc.py: name lists from ``<name_list_dir>/<split>.txt``,
images under ``JPEGImages``, labels under ``SegmentationClassAug``,
image-level one-hot labels from ``cls_labels_onehot.npy``.

One deliberate redesign (SURVEY §7 build plan, data/): the reference re-reads
each label PNG *inside the model forward* on every step to derive the
image-level class set (clip_tool.py:111-124).  Here the dataset computes the
class set once per example and ships it as a ``present_mask`` tensor with
the reference's exact uint8 semantics (background and ignore both drop out;
see ``class_set_from_label``).
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional

import numpy as np
from PIL import Image

from weclip_tpu.core.config import DatasetConfig
from weclip_tpu.data import transforms


def load_name_list(path: str):
    with open(path) as f:
        return [x.strip() for x in f.read().split("\n") if x.strip()]


def load_cls_labels(name_list_dir: str) -> Dict[str, np.ndarray]:
    p = os.path.join(name_list_dir, "cls_labels_onehot.npy")
    return np.load(p, allow_pickle=True).item()


def class_set_from_label(label: np.ndarray, num_fg: int) -> np.ndarray:
    """Image-level class set, reference-exact (clip_tool.py:106-124).

    The reference computes ``np.unique(PIL_image) - 1`` in **uint8**, so
    background 0 wraps to 255 and ignore 255 to 254 — both are then
    removed.  Background therefore NEVER joins the class set (executed and
    pinned against those exact lines in tests/test_data.py; the composite
    goldens' value-vocabulary assertion confirms the reference's pseudo
    labels carry no background-derived class either).  An earlier reading
    of the same lines as signed ``-1`` (wrapping background to the LAST fg
    class) was wrong and added a spurious class to nearly every image."""
    ids = np.unique(np.asarray(label).astype(np.uint8)) - np.uint8(1)
    ids = ids[(ids != 254) & (ids != 255)].astype(np.int64)
    # stray ids in (num_fg, 254) would IndexError upstream
    # (new_class_names[lid]); drop them instead of killing a loader worker
    # on a corrupt label
    mask = np.zeros(num_fg, bool)
    mask[ids[ids < num_fg]] = True
    return mask


class VOCBase:
    def __init__(self, cfg: DatasetConfig, split: str,
                 cache_dir: Optional[str] = None):
        self.cfg = cfg
        self.split = split
        self.img_dir = os.path.join(cfg.root_dir, "JPEGImages")
        self.label_dir = os.path.join(cfg.root_dir, "SegmentationClassAug")
        self.names = load_name_list(os.path.join(cfg.name_list_dir, split + ".txt"))
        self.cls_labels = load_cls_labels(cfg.name_list_dir)
        # Pre-decoded cache (TPU hosts are few-core: Python JPEG decode in
        # GIL-bound prefetch threads can bottleneck the 1-core axon host —
        # see tools/measure_host_pipeline.py).  First touch decodes and
        # writes {name}.npy / {name}_lab.npy; later epochs mmap them.
        self.cache_dir = cache_dir or getattr(cfg, "decoded_cache_dir", None)
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)

    def __len__(self):
        return len(self.names)

    def read_image(self, name: str) -> np.ndarray:
        if self.cache_dir:
            p = os.path.join(self.cache_dir, name + ".npy")
            if os.path.exists(p):
                return np.load(p, mmap_mode="r")
        img = np.asarray(Image.open(os.path.join(self.img_dir, name + ".jpg")).convert("RGB"))
        if self.cache_dir:
            np.save(os.path.join(self.cache_dir, name + ".npy"), img)
        return img

    def read_label(self, name: str) -> np.ndarray:
        if self.cache_dir:
            pc = os.path.join(self.cache_dir, name + "_lab.npy")
            if os.path.exists(pc):
                return np.load(pc, mmap_mode="r")
        p = os.path.join(self.label_dir, name + ".png")
        if os.path.exists(p):
            lab = np.asarray(Image.open(p))
            if self.cache_dir:
                np.save(os.path.join(self.cache_dir, name + "_lab.npy"), lab)
            return lab
        # label-free split (VOC test: images only, datasets/voc/test.txt):
        # an all-ignore label keeps the histograms empty while prediction
        # saving still works at the original resolution
        with Image.open(os.path.join(self.img_dir, name + ".jpg")) as im:
            w, h = im.size
        return np.full((h, w), 255, np.uint8)


class VOCClsDataset(VOCBase):
    """Training dataset (datasets/voc.py:75-180): random rescale -> flip ->
    crop with img_box; ImageNet normalization; CHW output."""

    def __init__(self, cfg: DatasetConfig, split: str = "train_aug",
                 seed: Optional[int] = None):
        super().__init__(cfg, split)
        self.rng = random.Random(seed)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.get_example(idx, self.rng)

    def get_example(self, idx: int, rng) -> Dict[str, np.ndarray]:
        """``rng``-explicit variant: PrefetchLoader passes a per-item RNG so
        augmentations are a pure function of (seed, stream position),
        independent of worker-thread scheduling."""
        name = self.names[idx]
        # stay uint8 through scale/flip/crop; normalize_img casts after the
        # crop so the float work happens on crop_size^2, not full-res pixels
        image = np.asarray(self.read_image(name))
        image = transforms.random_scaling(image, self.cfg.rescale_range, rng=rng)
        image = transforms.random_fliplr(image, rng=rng)
        image, img_box = transforms.random_crop(
            image, self.cfg.crop_size, ignore_index=self.cfg.ignore_index,
            rng=rng)
        image = transforms.normalize_img(
            image, np.asarray(self.cfg.mean, np.float32),
            np.asarray(self.cfg.std, np.float32))
        image = np.transpose(image, (2, 0, 1))

        label_full = self.read_label(name)
        present = class_set_from_label(label_full, self.cfg.num_classes - 1)
        return {
            "name": name,
            "img": image.astype(np.float32),
            "cls_label": np.asarray(self.cls_labels[name], np.uint8),
            "img_box": img_box,
            "present_mask": present,
        }


class VOCSegDataset(VOCBase):
    """Eval dataset (datasets/voc.py:183-271, aug=False): full-size image +
    label, no augmentation."""

    def __init__(self, cfg: DatasetConfig, split: str = "val",
                 stage: str = "val"):
        super().__init__(cfg, split)
        self.stage = stage

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        name = self.names[idx]
        image = self.read_image(name).astype(np.float32)
        if self.stage == "test":
            # the reference returns image[:,:,0] as a dummy test label
            # (datasets/voc.py:64-65) but never derives class sets or
            # scores from it; an all-ignore label keeps our always-on
            # hist/class-set machinery inert while predictions still save
            label = np.full(image.shape[:2], 255, np.int32)
            present = np.zeros(self.cfg.num_classes - 1, bool)
        else:
            label = self.read_label(name).astype(np.int32)
            present = class_set_from_label(label, self.cfg.num_classes - 1)
        # no normalized float copy here: the eval engine ships the raw uint8
        # original and normalizes on device (Evaluator.build_batch reads
        # only img_raw) — computing full-res fp32 pixels per example was
        # pure host waste on the exact path the uint8 pipeline optimizes
        return {
            "name": name,
            "img_raw": image.astype(np.uint8),
            "label": label,
            "cls_label": np.asarray(self.cls_labels.get(name, 0), np.uint8),
            "present_mask": present,
        }


def parse_xml_to_dict(node) -> dict:
    """Recursive VOC annotation XML -> dict (clip/utils.py:89-111; the
    tensorflow recursive_parse_xml_to_dict shape: repeated ``object`` tags
    collect into a list, leaves map tag -> text)."""
    if len(node) == 0:
        return {node.tag: node.text}
    result: dict = {}
    for child in node:
        sub = parse_xml_to_dict(child)
        if child.tag != "object":
            result[child.tag] = sub[child.tag]
        else:
            result.setdefault(child.tag, []).append(sub[child.tag])
    return {node.tag: result}


def classes_from_xml(xml_path: str, num_fg: int = 20) -> np.ndarray:
    """Image-level one-hot labels from a VOC ``Annotations/*.xml`` file —
    the label source of the offline CAM generator
    (clip/generate_cams_voc12.py:104-121)."""
    import xml.etree.ElementTree as ET
    from weclip_tpu.models.clip.prompts import CLASS_NAMES_VOC
    d = parse_xml_to_dict(ET.parse(xml_path).getroot())["annotation"]
    onehot = np.zeros(num_fg, np.uint8)
    for obj in d.get("object", []):
        name = obj.get("name")
        if name in CLASS_NAMES_VOC:
            onehot[CLASS_NAMES_VOC.index(name)] = 1
    return onehot
