"""End-to-end CLI drives on a synthetic VOC tree (tiny dims, CPU mesh).

The CLIs are the framework's user surface; each test executes a driver's
``main()`` exactly as a user would (argv), covering the wiring the unit
suite never touches: config YAML overlay + arg parsing, the trainer loop
(logging, TB/JSONL scalars, checkpointing, mid-training validation), the
eval driver with artifact saving (reference npy/PNG layouts,
test_msc_flip_voc.py:111), the fully-supervised seg trainer
(train/seg_step.py), offline CAM generation, and the label makers.
"""

import glob
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

NAMES = [f"img{i:02d}" for i in range(32)]


def _argv(monkey_list):
    """Context helper: swap sys.argv for a CLI main() call."""
    class _Argv:
        def __enter__(self):
            self.old = sys.argv
            sys.argv = monkey_list
        def __exit__(self, *exc):
            sys.argv = self.old
    return _Argv()


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_e2e")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClassAug").mkdir()
    (root / "lists").mkdir()
    r = np.random.default_rng(0)
    cls_labels = {}
    for n in NAMES:
        Image.fromarray(r.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(
            root / "JPEGImages" / f"{n}.jpg")
        lab = np.zeros((40, 60), np.uint8)
        lab[5:20, 5:30] = 3
        # mode "L": PIL compacts "P" palettes on save (3 -> palette index 1),
        # which silently remaps class ids; real VOC PNGs carry the full
        # VOC palette so pixel value == class id
        Image.fromarray(lab, mode="L").save(
            root / "SegmentationClassAug" / f"{n}.png")
        onehot = np.zeros(20, np.float32)      # reference blob format
        onehot[2] = 1                          # class id 3 -> fg index 2
        cls_labels[n] = onehot
    np.save(root / "lists" / "cls_labels_onehot.npy", cls_labels)
    for split in ("train_aug", "train", "val"):
        names = NAMES if split == "train_aug" else NAMES[:4]
        (root / "lists" / f"{split}.txt").write_text("\n".join(names))
    return root


@pytest.fixture(scope="module")
def tiny_cfg(voc_tree):
    path = voc_tree / "tiny.yaml"
    path.write_text(f"""
dataset:
  root_dir: {voc_tree}
  name_list_dir: {voc_tree}/lists
  crop_size: 64
  num_classes: 21
clip:
  patch_size: 16
  vision_width: 64
  vision_layers: 12
  vision_heads: 2
  embedding_dim: 32
  embed_dim: 32
  context_length: 16
  vocab_size: 128
  transformer_width: 32
  transformer_heads: 2
  transformer_layers: 2
train:
  samples_per_gpu: 2
  max_iters: 2
  log_iters: 1
  eval_iters: 2
  ckpt_start_iter: 1
par:
  dilations: [1, 2]
  num_iter: 3
eval:
  batch_images: 2
work_dir:
  dir: {voc_tree}/work
""")
    return str(path)


@pytest.fixture(scope="module")
def trained(voc_tree, tiny_cfg):
    """Run the VOC training CLI once (2 iters + one validation + ckpt)."""
    from weclip_tpu.cli import train_voc
    with _argv(["train_voc", "--config", tiny_cfg]):
        train_voc.main()
    run_dirs = sorted(glob.glob(str(voc_tree / "work" / "checkpoints" / "*")))
    assert run_dirs, "training saved no checkpoint run dir"
    return run_dirs[-1]


def test_train_cli_artifacts(voc_tree, trained):
    # a checkpoint for the final step exists inside the timestamped run dir
    steps = sorted(os.listdir(trained))
    assert any(s.endswith("00000002") for s in steps), steps
    # log file + JSONL scalars written (one record per log_iters=1 step)
    assert glob.glob(str(voc_tree / "work" / "*.log"))
    jsonl = voc_tree / "work" / "tb_logger" / "scalars.jsonl"
    recs = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert [r["step"] for r in recs if r["tag"] == "train"] == [1, 2]
    for r in recs:
        if r["tag"] == "train":
            assert np.isfinite(r["seg_loss"]) and np.isfinite(r["attn_loss"])


def test_eval_cli_restores_and_saves_artifacts(voc_tree, tiny_cfg, trained):
    """eval_voc: restore the CLI-trained checkpoint, run sharded msc-flip
    TTA, save predictions + logits in the reference layouts."""
    from weclip_tpu.cli import eval_voc
    results = str(voc_tree / "results")
    with _argv(["eval_voc", "--config", tiny_cfg, "--model_path", trained,
                "--resize_long", "64", "--max_images", "2", "--mesh", "2",
                "--save_preds", "--save_logits", "--work_dir", results]):
        eval_voc.main()

    # reference logit npy layout: {"segs", "msc_segs"}
    # (test_msc_flip_voc.py:111); preds at the original resolution
    logit = np.load(os.path.join(results, "logit", "img00.npy"),
                    allow_pickle=True).item()
    assert set(logit) == {"segs", "msc_segs"}
    assert logit["msc_segs"].shape[-3:] == (21, 40, 60)
    # "segs" is cropped to the image's own (h1//patch, w1//patch) grid like
    # the reference (whose tensors never see a square canvas) — a landscape
    # image must yield a landscape grid, not the padded square
    gh, gw = logit["segs"].shape[-2:]
    assert gh < gw
    pred = Image.open(os.path.join(results, "prediction", "img00.png"))
    assert pred.size == (60, 40)                  # PIL (w, h)
    assert os.path.exists(os.path.join(results, "prediction_cmap",
                                       "img00.png"))


@pytest.fixture(scope="module")
def seg_trained(voc_tree, tiny_cfg):
    """Run the fully-supervised seg-variant trainer (train/seg_step.py)."""
    from weclip_tpu.cli import train_voc_seg
    work = str(voc_tree / "work_seg")
    with _argv(["train_voc_seg", "--config", tiny_cfg, "--work_dir", work]):
        train_voc_seg.main()
    # checkpoints land in a timestamped run dir (apply_train_args)
    runs = glob.glob(os.path.join(work, "checkpoints", "*"))
    assert runs
    return runs[-1]


def test_train_voc_seg_cli(seg_trained):
    from weclip_tpu.train.checkpoint import latest_step
    assert latest_step(seg_trained) == 2


def test_eval_seg_cli(voc_tree, tiny_cfg, seg_trained):
    """Seg-variant msc-flip eval driver (test_msc_flip_seg.py parity) on
    the CLI-trained seg checkpoint."""
    from weclip_tpu.cli import eval_seg
    with _argv(["eval_seg", "--config", tiny_cfg, "--model_path", seg_trained,
                "--resize_long", "64", "--max_images", "2", "--mesh", "1"]):
        eval_seg.main()


def test_generate_cams_cli(voc_tree, tiny_cfg):
    """Offline CAM generator: reference npy layout {keys, attn_highres}
    (generate_cams_voc12.py:211-216), min-max normalized, original size."""
    from weclip_tpu.cli import generate_cams
    out = str(voc_tree / "cams")
    with _argv(["generate_cams", "--config", tiny_cfg, "--split", "train",
                "--out", out, "--resize_long", "64", "--max_images", "2"]):
        generate_cams.main()
    d = np.load(os.path.join(out, "img00.npy"), allow_pickle=True).item()
    assert set(d) == {"keys", "attn_highres"}
    assert d["attn_highres"].shape == (len(d["keys"]), 40, 60)
    # fp16 maps like the reference blob (generate_cams_voc12.py:211-215)
    assert d["attn_highres"].dtype == np.float16
    assert 2 in d["keys"]                       # class 3 -> fg index 2
    assert 0.0 <= d["attn_highres"].min() and d["attn_highres"].max() <= 1.0


def test_make_voc_labels_cli(voc_tree, tmp_path):
    """Label maker rebuilds cls_labels_onehot.npy in the exact reference
    blob format: (num_fg,) float32, foreground index = class_id - 1."""
    from weclip_tpu.cli import make_voc_labels
    out_dir = tmp_path / "lists"
    out_dir.mkdir()
    (out_dir / "train.txt").write_text("\n".join(NAMES[:4]))
    with _argv(["make_voc_labels", "--root", str(voc_tree),
                "--name_list_dir", str(out_dir), "--splits", "train"]):
        make_voc_labels.main()
    d = np.load(out_dir / "cls_labels_onehot.npy", allow_pickle=True).item()
    ref = np.load(voc_tree / "lists" / "cls_labels_onehot.npy",
                  allow_pickle=True).item()
    assert set(d) == set(NAMES[:4])
    for n in d:
        assert d[n].shape == (20,) and d[n].dtype == np.float32
        np.testing.assert_array_equal(d[n], ref[n])


def test_make_voc_labels_derives_lists_and_falls_back(voc_tree, tmp_path):
    """With no pre-existing list txt the maker derives it from the VOC
    ImageSets/Segmentation split, and label PNGs fall back from the
    SegmentationClassAug dir to SegmentationClass (plain-VOC layouts)."""
    import shutil
    from weclip_tpu.cli import make_voc_labels
    root = tmp_path / "voc_plain"
    shutil.copytree(voc_tree, root)
    # plain layout: labels live in SegmentationClass, lists in ImageSets
    (root / "SegmentationClassAug").rename(root / "SegmentationClass")
    iset = root / "ImageSets" / "Segmentation"
    iset.mkdir(parents=True)
    (iset / "val.txt").write_text("\n".join(NAMES[:3]))
    out_dir = tmp_path / "derived_lists"
    out_dir.mkdir()
    with _argv(["make_voc_labels", "--root", str(root),
                "--name_list_dir", str(out_dir), "--splits", "val,missing"]):
        make_voc_labels.main()
    # list derived from ImageSets; the absent 'missing' split is skipped
    assert (out_dir / "val.txt").read_text().split() == NAMES[:3]
    assert not (out_dir / "missing.txt").exists()
    d = np.load(out_dir / "cls_labels_onehot.npy", allow_pickle=True).item()
    assert set(d) == set(NAMES[:3])
    for n in d:
        assert d[n][2] == 1.0 and d[n].sum() == 1.0


COCO_TRAIN = [f"COCO_train2014_{i:012d}" for i in range(16)]
COCO_VAL = [f"COCO_val2014_{i:012d}" for i in range(4)]


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """COCO-2014 VOC-style layout (data/coco.py): prefix-stripped label
    names, train/val subdirs."""
    root = tmp_path_factory.mktemp("coco_e2e")
    r = np.random.default_rng(1)
    for split, names in (("train", COCO_TRAIN), ("val", COCO_VAL)):
        (root / "JPEGImages" / split).mkdir(parents=True)
        (root / "SegmentationClass" / split).mkdir(parents=True)
        for n in names:
            Image.fromarray(
                r.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(
                    root / "JPEGImages" / split / f"{n}.jpg")
            lab = np.zeros((40, 60), np.uint8)
            lab[5:20, 5:30] = 7
            stripped = n[15:] if split == "train" else n[13:]
            Image.fromarray(lab, mode="L").save(
                root / "SegmentationClass" / split / f"{stripped}.png")
    (root / "lists").mkdir()
    (root / "lists" / "train.txt").write_text("\n".join(COCO_TRAIN))
    (root / "lists" / "val.txt").write_text("\n".join(COCO_VAL))
    path = root / "tiny_coco.yaml"
    path.write_text(f"""
dataset:
  name: coco
  root_dir: {root}
  name_list_dir: {root}/lists
  crop_size: 64
  num_classes: 81
clip:
  patch_size: 16
  vision_width: 64
  vision_layers: 12
  vision_heads: 2
  embedding_dim: 32
  embed_dim: 32
  context_length: 16
  vocab_size: 128
  transformer_width: 32
  transformer_heads: 2
  transformer_layers: 2
train:
  split: train
  samples_per_gpu: 2
  max_iters: 2
  log_iters: 1
  eval_iters: 2
  ckpt_start_iter: 1
par:
  dilations: [1, 2]
  num_iter: 3
eval:
  batch_images: 2
work_dir:
  dir: {root}/work
""")
    return root, str(path)


def test_train_then_eval_coco_cli(coco_tree):
    """COCO pair: train (81 classes, no mid-training validation,
    dist_clip_coco.py parity) then seg-only val eval
    (model_attn_aff_coco.py:131-132 short-circuit)."""
    root, cfg_path = coco_tree
    from weclip_tpu.cli import eval_coco, train_coco
    with _argv(["train_coco", "--config", cfg_path]):
        train_coco.main()
    runs = sorted(glob.glob(str(root / "work" / "checkpoints" / "*")))
    assert runs
    with _argv(["eval_coco", "--config", cfg_path, "--model_path", runs[-1],
                "--resize_long", "64", "--max_images", "2", "--mesh", "1"]):
        eval_coco.main()


def test_make_coco_labels_cli(coco_tree, tmp_path):
    root, _ = coco_tree
    from weclip_tpu.cli import make_coco_labels
    out_dir = tmp_path / "lists"
    out_dir.mkdir()
    (out_dir / "train.txt").write_text("\n".join(COCO_TRAIN[:3]))
    (out_dir / "val.txt").write_text("\n".join(COCO_VAL[:2]))
    with _argv(["make_coco_labels", "--root", str(root),
                "--name_list_dir", str(out_dir)]):
        make_coco_labels.main()
    d = np.load(out_dir / "cls_labels_onehot.npy", allow_pickle=True).item()
    assert set(d) == set(COCO_TRAIN[:3]) | set(COCO_VAL[:2])
    for v in d.values():
        assert v.shape == (80,) and v.dtype == np.float32
        assert v[6] == 1 and v.sum() == 1      # class id 7 -> fg index 6


def test_eval_cli_with_jax_crf(voc_tree, tiny_cfg, trained):
    """--crf --crf_impl jax: on-device mean-field post-processing through
    the driver (the reference's CRF call is commented out upstream;
    test_msc_flip_voc.py:213)."""
    from weclip_tpu.cli import eval_voc
    with _argv(["eval_voc", "--config", tiny_cfg, "--model_path", trained,
                "--resize_long", "64", "--max_images", "2", "--mesh", "1",
                "--crf", "--crf_impl", "jax", "--crf_stride", "16"]):
        eval_voc.main()


def test_train_cli_resume_continues_run(voc_tree, tiny_cfg, trained):
    """--resume must reuse the newest checkpointed run dir (not mint a new
    timestamp) and continue from the restored step."""
    from weclip_tpu.cli import train_voc
    from weclip_tpu.train.checkpoint import latest_step
    assert latest_step(trained) == 2
    with _argv(["train_voc", "--config", tiny_cfg, "--resume",
                "--max_iters", "4"]):
        train_voc.main()
    # same run dir, extended to step 4
    assert latest_step(trained) == 4
