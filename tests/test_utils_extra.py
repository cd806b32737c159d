"""Tests for the auxiliary utility surface: TB grid renderers
(utils/imutils.py:26-133), box IoU (clip/utils.py:40-87), VOC XML labels
(clip/utils.py:89-111 + generate_cams_voc12.py:104-121), poly-warmup SGD
(utils/optimizer.py:35-65)."""

import numpy as np

from weclip_tpu.utils import imutils


def test_make_grid_shape():
    imgs = np.arange(4 * 3 * 8 * 6, dtype=np.uint8).reshape(4, 3, 8, 6)
    grid = imutils.make_grid(imgs, nrow=2, padding=2)
    assert grid.shape == (3, 2 * (8 + 2) + 2, 2 * (6 + 2) + 2)
    # first tile lands at (2, 2)
    np.testing.assert_array_equal(grid[:, 2:10, 2:8], imgs[0])


def test_tensorboard_image_renders():
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    cam = rng.random((2, 5, 8, 8)).astype(np.float32)
    g_img, g_cam = imutils.tensorboard_image(imgs, cam)
    assert g_img.dtype == np.uint8 and g_cam.dtype == np.uint8
    assert g_img.shape == g_cam.shape and g_img.shape[0] == 3


def test_tensorboard_attn_and_label():
    rng = np.random.default_rng(1)
    attns = [rng.random((2, 64, 64)).astype(np.float32) for _ in range(3)]
    grid = imutils.tensorboard_attn(attns, size=(16, 16), n_pix=0.3, n_row=2)
    assert grid.dtype == np.uint8 and grid.shape[0] == 3
    grids = imutils.tensorboard_attn2(
        [rng.random((2, 64, 64)).astype(np.float32) for _ in range(5)],
        size=(16, 16), with_attn_pred=True)
    assert len(grids) == 8
    lab = rng.integers(0, 21, (2, 10, 12))
    g = imutils.tensorboard_label(lab)
    assert g.shape[0] == 3 and g.dtype == np.uint8


def test_box_iou_reference_values():
    from weclip_tpu.refine.bbox import box_iou
    a = np.array([[0, 0, 9, 9]])
    b = np.array([[0, 0, 9, 9], [5, 5, 14, 14], [20, 20, 21, 21]])
    got = box_iou(a, b)[0]
    # inclusive-area convention: inter 5x5=25, union 100+100-25
    np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0])


def test_classes_from_xml(tmp_path):
    from weclip_tpu.data.voc import classes_from_xml, parse_xml_to_dict
    import xml.etree.ElementTree as ET
    xml = ("<annotation><filename>x.jpg</filename>"
           "<object><name>dog</name></object>"
           "<object><name>cat</name></object>"
           "<object><name>notaclass</name></object></annotation>")
    p = tmp_path / "x.xml"
    p.write_text(xml)
    d = parse_xml_to_dict(ET.parse(str(p)).getroot())["annotation"]
    assert len(d["object"]) == 3 and d["filename"] == "x.jpg"
    onehot = classes_from_xml(str(p))
    assert set(np.where(onehot)[0]) == {7, 11}       # cat, dog in VOC order


def test_sgd_optimizer_steps():
    import jax.numpy as jnp
    from weclip_tpu.core.config import OptimizerConfig
    from weclip_tpu.train.optimizer import make_sgd_optimizer
    tx = make_sgd_optimizer(OptimizerConfig(), max_iters=100)
    params = {"w": jnp.ones((3,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.full((3,), 2.0)}
    updates, _ = tx.update(grads, opt_state, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0.0


def test_sgd_lockstep_matches_reference_polywarmupsgd(tmp_path):
    """Lockstep oracle vs the reference ``PolyWarmupSGD``
    (utils/optimizer.py:35-65): same init, same per-step grads, 12 steps
    crossing the warmup boundary — pins the class's OWN (quirky) schedule,
    torch's grad-coupled weight decay, and the momentum buffer wiring."""
    import importlib.util
    import os

    import jax.numpy as jnp
    import optax
    import torch

    ref = "/root/reference/utils/optimizer.py"
    if not os.path.exists(ref):
        import pytest
        pytest.skip("reference checkout not present")
    spec = importlib.util.spec_from_file_location("ref_optimizer", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from weclip_tpu.core.config import OptimizerConfig
    from weclip_tpu.train.optimizer import make_sgd_optimizer

    cfg = OptimizerConfig(learning_rate=2e-3, weight_decay=0.01,
                          warmup_iter=5, head_lr_mult=1.0, power=0.9)
    max_iters = 20
    rng = np.random.default_rng(0)
    w0 = rng.standard_normal(6).astype(np.float32)
    grads_seq = [rng.standard_normal(6).astype(np.float32)
                 for _ in range(12)]

    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = mod.PolyWarmupSGD([p_t], lr=cfg.learning_rate,
                            weight_decay=cfg.weight_decay, betas=(0.9, 0.999),
                            warmup_iter=cfg.warmup_iter, max_iter=max_iters,
                            warmup_ratio=cfg.warmup_ratio, power=cfg.power)
    for g in grads_seq:
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = make_sgd_optimizer(cfg, max_iters=max_iters)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_download_checkpoint_sha256(tmp_path):
    """sha256-verified fetch (reference clip/clip.py:44-73) on a local
    file:// source: verified download, cached reuse, corruption rejection."""
    import hashlib
    from weclip_tpu.models.clip.loader import download_checkpoint

    src = tmp_path / "src" / "tiny.pt"
    src.parent.mkdir()
    src.write_bytes(b"weclip tiny checkpoint payload")
    digest = hashlib.sha256(src.read_bytes()).hexdigest()
    url = "file://" + str(src)
    root = tmp_path / "cache"

    out = download_checkpoint(url, root=str(root), expected_sha256=digest)
    assert out == str(root / "tiny.pt")
    assert (root / "tiny.pt").read_bytes() == src.read_bytes()

    # cache hit: source may vanish, fetch still succeeds from disk
    src.unlink()
    assert download_checkpoint(url, root=str(root),
                               expected_sha256=digest) == out

    # digest mismatch on the cached file forces a refetch -> fails (gone)
    (root / "tiny.pt").write_bytes(b"corrupted")
    import pytest as _pytest
    with _pytest.raises(Exception):
        download_checkpoint(url, root=str(root), expected_sha256=digest)


def test_available_models_lists_vit_b16():
    from weclip_tpu.models.clip.loader import MODEL_URLS, available_models
    assert "ViT-B/16" in available_models()
    # OpenAI convention: digest is the second-to-last URL path segment
    for url in MODEL_URLS.values():
        assert len(url.split("/")[-2]) == 64


def test_download_checkpoint_non_openai_url_without_digest(tmp_path):
    """A URL outside the OpenAI catalog with no expected_sha256 must NOT be
    verified against a bogus path segment (it used to raise 'expected
    <dirname>'); it downloads with a warning instead, and a provided digest
    is still enforced."""
    import hashlib
    from weclip_tpu.models.clip.loader import download_checkpoint, is_fetchable

    src = tmp_path / "ckpts" / "mirror.pt"       # dirname is NOT the digest
    src.parent.mkdir()
    src.write_bytes(b"mirrored checkpoint")
    url = "file://" + str(src)
    root = tmp_path / "cache"

    out = download_checkpoint(url, root=str(root))      # no digest: warns
    assert (root / "mirror.pt").read_bytes() == src.read_bytes()

    bad = hashlib.sha256(b"other").hexdigest()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="sha256"):
        download_checkpoint(url, root=str(tmp_path / "c2"),
                            expected_sha256=bad)

    assert is_fetchable("ViT-B/16")
    assert is_fetchable("https://host/x.pt")
    assert not is_fetchable("/local/path.pt")
    assert not is_fetchable("")


def test_average_meter_parity():
    """AverageMeter add/get/pop running means (utils/AverageMeter.py API)."""
    from weclip_tpu.utils.meters import AverageMeter
    m = AverageMeter("loss")
    m.add({"loss": 2.0, "acc": 0.5})
    m.add({"loss": 4.0})
    assert m.get("loss") == 3.0
    assert m.get("acc") == 0.5
    assert m.pop("loss") == 3.0
    m.add({"loss": 10.0})
    assert m.get("loss") == 10.0          # pop resets the window


def test_metrics_match_reference_evaluate():
    """confusion_update + scores and pseudo_scores vs the reference's
    utils/evaluate.py (same hists, same score dicts, incl. the
    pred==255 -> gt-masking quirk in pseudo scoring)."""
    import sys
    import types

    from tests.test_reference_golden import REF, _install_reference
    _install_reference()
    if "sklearn" not in sys.modules:          # evaluate.py header import
        sk = types.ModuleType("sklearn")
        skm = types.ModuleType("sklearn.metrics")
        sk.metrics = skm
        sys.modules["sklearn"] = sk
        sys.modules["sklearn.metrics"] = skm
    from utils import evaluate as ref_eval

    import jax.numpy as jnp

    from weclip_tpu.evalx import metrics

    r = np.random.default_rng(3)
    k = 6
    gts = [r.integers(0, k, (10, 12)).astype(np.int64) for _ in range(3)]
    gts[0][0, :4] = 255                       # ignore pixels
    preds = [r.integers(0, k, (10, 12)).astype(np.int64) for _ in range(3)]

    hist = np.asarray(metrics.zero_hist(k))
    for gt, pr in zip(gts, preds):
        hist = np.asarray(metrics.confusion_update(
            jnp.asarray(hist), jnp.asarray(gt), jnp.asarray(pr), k))
    ref_hist, ref_scores = ref_eval.scores(gts, preds, np.zeros((k, k)), k)
    np.testing.assert_array_equal(hist, ref_hist)
    ours = metrics.scores(hist)
    for key in ("pAcc", "mAcc", "miou"):
        np.testing.assert_allclose(ours[key], ref_scores[key], rtol=1e-12)

    # pseudo scoring: predicted 255 masks the gt pixel
    preds255 = [np.where(r.random(p.shape) < 0.2, 255, p) for p in preds]
    ref_ps = ref_eval.pseudo_scores(
        [g.copy() for g in gts], [p.copy() for p in preds255], k)
    our_ps = metrics.pseudo_scores(
        [g.copy() for g in gts], [p.copy() for p in preds255], k)
    for key in ("pAcc", "mAcc", "miou"):
        np.testing.assert_allclose(our_ps[key], ref_ps[key], rtol=1e-12)


def test_imutils_match_reference():
    """VOC palette + encode_cmap + denormalize against the reference's
    utils/imutils.py; smoke the TB grid renderers."""
    from tests.test_reference_golden import _install_reference
    _install_reference()
    from utils import imutils as ref_im

    from weclip_tpu.utils import imutils

    np.testing.assert_array_equal(imutils.colormap(), ref_im.colormap())
    r = np.random.default_rng(5)
    lab = r.integers(0, 21, (9, 11))
    lab[0, 0] = 255
    np.testing.assert_array_equal(imutils.encode_cmap(lab),
                                  ref_im.encode_cmap(lab))

    import torch
    # in-range values: identical.  (Out-of-range: the reference's uint8
    # cast WRAPS (265 -> 9, imutils.py:16); ours clips — viz-only fix.)
    img = (r.standard_normal((2, 3, 8, 8)) * 0.5).astype(np.float32)
    ours = imutils.denormalize_img(img)
    ref = ref_im.denormalize_img(torch.from_numpy(img.copy())).numpy()
    np.testing.assert_array_equal(ours, ref)
    hot = np.full((1, 3, 2, 2), 3.0, np.float32)          # denorm > 255
    assert imutils.denormalize_img(hot).max() == 255      # clipped, not wrapped

    # grid renderers: shape/type smoke (reference needs torchvision; the
    # semantics here are visualization-only)
    imgs = r.integers(0, 255, (4, 3, 16, 16)).astype(np.uint8)
    grid = imutils.make_grid(imgs, nrow=2)
    assert grid.shape == (3, 2 * 18 + 2, 2 * 18 + 2) and grid.dtype == np.uint8
    np.testing.assert_array_equal(grid[:, 2:18, 2:18], imgs[0])
    cams = r.random((4, 1, 16, 16)).astype(np.float32)
    gi, gc = imutils.tensorboard_image(
        (imgs.astype(np.float32) - 120.0) / 60.0, cams)
    assert gi.shape == grid.shape and gc.shape == grid.shape
