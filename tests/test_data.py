"""Data pipeline: the class-set quirk, crop geometry, normalization."""

import numpy as np

from weclip_tpu.data import transforms
from weclip_tpu.data.voc import class_set_from_label


def _reference_class_ids(label: np.ndarray) -> list:
    """The reference's EXACT derivation (clip_tool.py:113-118), executed:
    np.unique of the uint8 PNG minus 1 runs in uint8 — background 0 wraps
    to 255 and ignore 255 to 254, and both are then removed.  (An earlier
    reading as signed -1 'background wraps to the last fg class' was wrong
    and is pinned against these lines here.)"""
    label_id_list = np.unique(np.asarray(label, np.uint8))
    label_id_list = (label_id_list - 1).tolist()
    if 255 in label_id_list:
        label_id_list.remove(255)
    if 254 in label_id_list:
        label_id_list.remove(254)
    return [int(lid) for lid in label_id_list]


def test_class_set_matches_reference_lines():
    """class_set_from_label vs the reference's executed uint8 derivation,
    across edge labels: background present, ignore present, no background,
    all-background, and a full 1..20 sweep."""
    rng = np.random.default_rng(3)
    cases = []
    lab = np.zeros((8, 8), np.uint8)
    lab[0, 0] = 3
    lab[1, 1] = 255
    cases.append(lab)                               # bg + fg + ignore
    cases.append(np.full((4, 4), 5, np.uint8))      # fg only, no bg
    cases.append(np.zeros((4, 4), np.uint8))        # all background
    cases.append(np.full((4, 4), 255, np.uint8))    # all ignore
    full = np.arange(21, dtype=np.uint8).reshape(3, 7)
    cases.append(full)                              # every id incl. 0
    for _ in range(8):                              # random id mixtures
        cases.append(rng.choice(
            np.asarray([0, 1, 4, 7, 13, 20, 255], np.uint8), (6, 6)))
    for lab in cases:
        mask = class_set_from_label(lab, num_fg=20)
        want = np.zeros(20, bool)
        for i in _reference_class_ids(lab):
            want[i] = True
        np.testing.assert_array_equal(mask, want,
                                      err_msg=str(np.unique(lab)))
    # corrupt label with a stray id in (num_fg, 254): the reference would
    # IndexError (new_class_names[lid]); we drop it instead of killing a
    # loader worker
    bad = np.zeros((4, 4), np.uint8)
    bad[0, 0], bad[1, 1] = 3, 40
    mask = class_set_from_label(bad, num_fg=20)
    assert mask[2] and mask.sum() == 1


def test_normalize_img_imagenet_stats():
    img = np.full((4, 4, 3), 123.675, np.float32)
    out = transforms.normalize_img(img)
    np.testing.assert_allclose(out[..., 0], 0.0, atol=1e-5)
    img2 = np.zeros((2, 2, 3), np.float32)
    out2 = transforms.normalize_img(img2)
    np.testing.assert_allclose(out2[..., 1], -116.28 / 57.12, rtol=1e-5)


def test_random_crop_geometry(rng):
    img = rng.standard_normal((100, 150, 3)).astype(np.float32)
    out, box = transforms.random_crop(img, 320)
    assert out.shape == (320, 320, 3)
    h0, h1, w0, w1 = box
    assert 0 <= h0 < h1 <= 320 and 0 <= w0 < w1 <= 320
    assert (h1 - h0) == 100 and (w1 - w0) == 150   # valid region size kept
    # outside the valid box the crop is zero padding
    assert np.all(out[:h0] == 0) and np.all(out[h1:] == 0)

    lab = rng.integers(0, 5, (100, 150)).astype(np.float32)
    out, lab_c, box = transforms.random_crop(img, 320, lab)
    assert lab_c.shape == (320, 320)
    h0, h1, w0, w1 = box
    assert np.all(lab_c[:h0] == 255) and np.all(lab_c[h1:] == 255)


def test_rescale_label_nearest(rng):
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.float32)
    lab = rng.integers(0, 21, (40, 60)).astype(np.uint8)
    img2, lab2 = transforms.rescale(img, 0.5, lab)
    assert img2.shape == (20, 30, 3)
    assert lab2.shape == (20, 30)
    assert set(np.unique(lab2)) <= set(np.unique(lab))   # nearest: no new ids


def _write_voc_tree(root, names, with_labels=True):
    import os
    from PIL import Image
    os.makedirs(f"{root}/JPEGImages", exist_ok=True)
    os.makedirs(f"{root}/SegmentationClassAug", exist_ok=True)
    os.makedirs(f"{root}/lists", exist_ok=True)
    r = np.random.default_rng(0)
    for n in names:
        Image.fromarray(r.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(
            f"{root}/JPEGImages/{n}.jpg")
        if with_labels:
            lab = np.zeros((40, 60), np.uint8)
            lab[5:20, 5:30] = 3
            Image.fromarray(lab, mode="P").save(
                f"{root}/SegmentationClassAug/{n}.png")
    np.save(f"{root}/lists/cls_labels_onehot.npy",
            {n: np.zeros(20, np.uint8) for n in names})


def test_seg_dataset_label_free_test_stage(tmp_path):
    """stage='test' (label-free VOC test split): all-ignore label + empty
    class set so metrics stay empty and prediction saving still works
    (reference datasets/voc.py:64-65 returns a dummy image-channel label
    but never scores it)."""
    from weclip_tpu.core.config import DatasetConfig
    from weclip_tpu.data.voc import VOCSegDataset
    root = str(tmp_path / "voc")
    _write_voc_tree(root, ["a", "b"], with_labels=False)
    (tmp_path / "voc" / "lists" / "test.txt").write_text("a\nb\n")
    cfg = DatasetConfig(root_dir=root, name_list_dir=f"{root}/lists")
    ds = VOCSegDataset(cfg, split="test", stage="test")
    ex = ds[0]
    assert set(np.unique(ex["label"])) == {255}
    assert not ex["present_mask"].any()


def test_seg_dataset_missing_label_fallback(tmp_path):
    """read_label falls back to an all-ignore map when the PNG is absent."""
    from weclip_tpu.core.config import DatasetConfig
    from weclip_tpu.data.voc import VOCSegDataset
    root = str(tmp_path / "voc")
    _write_voc_tree(root, ["a"], with_labels=False)
    (tmp_path / "voc" / "lists" / "val.txt").write_text("a\n")
    cfg = DatasetConfig(root_dir=root, name_list_dir=f"{root}/lists")
    ds = VOCSegDataset(cfg, split="val", stage="val")
    ex = ds[0]
    assert set(np.unique(ex["label"])) == {255}
    assert ex["label"].shape == (40, 60)


def test_photometric_distortion_matches_reference():
    """Seeded-RNG lockstep vs the reference's mmseg-derived
    PhotoMetricDistortion (datasets/transforms.py:178-264): identical
    global np.random/random streams must yield byte-identical pixels —
    pinning both the random-branch ORDER and the RGB-through-bgr2hsv
    quirk."""
    import random

    ref_t = _load_ref_transforms()

    r = np.random.default_rng(0)
    img = r.integers(0, 256, (24, 32, 3), np.uint8)
    hit = np.zeros(2, int)
    for seed in range(12):
        np.random.seed(seed)
        random.seed(seed)
        ref_out = ref_t.PhotoMetricDistortion()(img.copy())
        np.random.seed(seed)
        random.seed(seed)
        ours = transforms.PhotoMetricDistortion()(img.copy())
        np.testing.assert_array_equal(ours, ref_out)
        hit[int(np.array_equal(ours, img))] += 1
    assert hit[0] > 0        # at least one seed actually distorted


def _load_ref_transforms():
    """Load the reference datasets/transforms.py by file path ('import
    datasets' would hit the installed HuggingFace package whenever an
    earlier test already imported it), stubbing the two mmcv color helpers
    with cv2 (mmcv's own colorspace backend).  The helpers are attached to
    whatever mmcv module exists (the composite goldens install a cnn-only
    stub first in full-suite order) and deliberately persist — they are
    pure cv2 wrappers, safe for any later consumer."""
    import importlib.util
    import sys
    import types

    import cv2

    from tests.test_reference_golden import REF, _install_reference
    _install_reference()
    m = sys.modules.get("mmcv") or types.ModuleType("mmcv")
    if not hasattr(m, "bgr2hsv"):
        m.bgr2hsv = lambda im: cv2.cvtColor(im, cv2.COLOR_BGR2HSV)
        m.hsv2bgr = lambda im: cv2.cvtColor(im, cv2.COLOR_HSV2BGR)
    if not hasattr(m, "cnn"):
        # keep the stub COMPLETE for later consumers regardless of test
        # order: the composite goldens' _stub_mmcv only installs when no
        # mmcv module exists yet, and their segformer import needs
        # mmcv.cnn.ConvModule
        mc = types.ModuleType("mmcv.cnn")
        mc.ConvModule = object
        m.cnn = mc
        sys.modules["mmcv.cnn"] = mc
    sys.modules["mmcv"] = m
    spec = importlib.util.spec_from_file_location(
        "_ref_transforms", REF + "/datasets/transforms.py")
    ref_t = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_t)
    return ref_t


def test_rescale_matches_reference_img_rescaling():
    """rescale vs the reference's executed _img_rescaling
    (transforms.py:35-51): PIL BILINEAR on the uint8 cast, (int(s*w),
    int(s*h)) size order, NEAREST labels — byte-identical values (the
    reference emits float32; ours keeps uint8 until normalize)."""
    ref_t = _load_ref_transforms()
    r = np.random.default_rng(1)
    img = r.integers(0, 256, (37, 53, 3), np.uint8)
    lab = r.integers(0, 21, (37, 53)).astype(np.uint8)
    for scale in (0.5, 0.8137, 1.0, 1.31, 2.0):
        ref_img, ref_lab = ref_t._img_rescaling(
            img.astype(np.float32), lab, scale=scale)
        ours_img, ours_lab = transforms.rescale(img, scale, lab)
        assert ours_img.dtype == np.uint8
        np.testing.assert_array_equal(ours_img.astype(np.float32), ref_img,
                                      err_msg=f"scale {scale}")
        np.testing.assert_array_equal(ours_lab, ref_lab)


def test_random_crop_matches_reference_given_same_draws():
    """random_crop vs the reference's executed random_crop
    (transforms.py:119-176) with the RNG draws scripted to identical
    values on both sides: crop contents, label crop, and the img_box
    valid-region math must agree exactly (incl. the pad-larger-than-image
    case where the box is a strict sub-rectangle)."""
    import random as _random

    ref_t = _load_ref_transforms()
    r = np.random.default_rng(2)

    class ScriptedRng:
        """Yields predetermined randrange values in our call order:
        h_pad, w_pad, then (h0, w0) per crop try."""
        def __init__(self, vals):
            self.vals = list(vals)
        def randrange(self, lo, hi, step=1):
            v = self.vals.pop(0)
            assert lo <= v < hi, (lo, v, hi)
            return v

    for h, w, crop in ((40, 56, 32), (24, 28, 48)):   # crop < and > image
        img = r.integers(0, 256, (h, w, 3), np.uint8)
        lab = r.integers(0, 3, (h, w)).astype(np.uint8)  # mixed ids: the
        # cat_max_ratio check passes on the first try for these densities
        big_h, big_w = max(crop, h), max(crop, w)
        h_pad = int(r.integers(0, big_h - h + 1))
        w_pad = int(r.integers(0, big_w - w + 1))
        h0 = int(r.integers(0, big_h - crop + 1))
        w0 = int(r.integers(0, big_w - crop + 1))

        # reference side: np.random.randint supplies pads, random.randrange
        # the crop box (transforms.py:132-133, 141-143)
        pad_draws = [h_pad, w_pad]
        box_draws = [h0, w0] * 10
        orig_randint = np.random.randint
        orig_randrange = _random.randrange
        np.random.randint = lambda *a, **k: pad_draws.pop(0)
        _random.randrange = lambda *a, **k: box_draws.pop(0)
        try:
            ref_img, ref_lab, ref_box = ref_t.random_crop(
                img.astype(np.float32), lab, crop_size=crop)
        finally:
            np.random.randint = orig_randint
            _random.randrange = orig_randrange

        ours_img, ours_lab, ours_box = transforms.random_crop(
            img, crop, lab, rng=ScriptedRng([h_pad, w_pad] + [h0, w0] * 10))
        np.testing.assert_array_equal(
            ours_img.astype(np.float32), ref_img, err_msg=f"{h}x{w}")
        np.testing.assert_array_equal(np.asarray(ours_lab, np.float32),
                                      np.asarray(ref_lab, np.float32))
        # the reference's img_box mixes frames: starts are crop-relative
        # (max(pad-start, 0)) but ends are ABSOLUTE (min(end, pad+h),
        # transforms.py:160-164) — harmless upstream because the live train
        # loop unpacks img_box and never uses it (dist_clip_voc.py:241-267).
        # Ours ships the sanitized crop-relative box; they must agree after
        # subtracting the crop origin from the reference's ends.
        want = np.asarray([ref_box[0], ref_box[1] - h0,
                           ref_box[2], ref_box[3] - w0])
        np.testing.assert_array_equal(np.asarray(ours_box), want)
