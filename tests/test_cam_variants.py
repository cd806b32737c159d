"""CAM variant library: shape/normalization sanity + grad_cam consistency
with the main vjp path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import tiny
from weclip_tpu.cam import variants
from weclip_tpu.cam.gradcam import gradcam_single
from weclip_tpu.core import precision

METHODS = ["grad_cam", "grad_cam_pp", "xgrad_cam", "layer_cam",
           "eigen_cam", "eigen_grad_cam", "score_cam", "ablation_cam"]


@pytest.fixture(scope="module")
def setup():
    cfg = tiny.tiny_config()
    frozen, _ = tiny.tiny_frozen(cfg)
    rng = np.random.default_rng(5)
    l = 17
    x11 = jnp.asarray(rng.standard_normal((l, cfg.clip.vision_width)),
                      jnp.float32)
    text = jnp.concatenate([frozen["fg_text"], frozen["bg_text"]], 0)
    tmask = jnp.ones((text.shape[0],), bool)
    valid = jnp.ones((l,), bool)
    cls = jnp.arange(3, dtype=jnp.int32)
    return cfg, frozen, x11, text, tmask, valid, cls


@pytest.mark.parametrize("method", METHODS)
def test_variant_shapes_and_range(setup, method):
    cfg, frozen, x11, text, tmask, valid, cls = setup
    cams = variants.cam_single(method, frozen["visual"], frozen["logit_scale"],
                               x11, text, tmask, valid, cls, cfg.clip,
                               precision.FP32)
    cams = np.asarray(cams)
    assert cams.shape == (3, 16)
    assert np.isfinite(cams).all()
    assert cams.min() >= 0.0 and cams.max() <= 1.0 + 1e-6


def test_grad_cam_variant_matches_main_path(setup):
    cfg, frozen, x11, text, tmask, valid, cls = setup
    via_variants = variants.cam_single(
        "grad_cam", frozen["visual"], frozen["logit_scale"], x11, text,
        tmask, valid, cls, cfg.clip, precision.FP32)
    main, _, _ = gradcam_single(frozen["visual"], frozen["logit_scale"], x11,
                                text, tmask, valid, cls, cfg.clip,
                                policy=precision.FP32)
    np.testing.assert_allclose(np.asarray(via_variants), np.asarray(main),
                               rtol=1e-5, atol=1e-6)


def test_targets_api():
    """cam/targets.py seed-vector builders (model_targets.py parity)."""
    import jax.numpy as jnp
    from weclip_tpu.cam.targets import (ClassifierOutputSoftmaxTarget,
                                        ClassifierOutputTarget,
                                        SemanticSegmentationTarget)
    logits = jnp.asarray([1.0, 3.0, 2.0])
    t = ClassifierOutputTarget(1)
    assert float(t(logits)) == 3.0
    np.testing.assert_array_equal(np.asarray(t.seed(3)), [0.0, 1.0, 0.0])
    ts = ClassifierOutputSoftmaxTarget(1)
    assert 0.0 < float(ts(logits)) < 1.0
    # the softmax seed is the Jacobian row: must equal grad of p[1] wrt z
    import jax
    seed_sm = ts.seed(3, logits=logits)
    oracle = jax.grad(lambda z: jax.nn.softmax(z)[1])(logits)
    np.testing.assert_allclose(np.asarray(seed_sm), np.asarray(oracle),
                               rtol=1e-6, atol=1e-7)
    import pytest
    with pytest.raises(ValueError):
        ts.seed(3)
    mask = np.zeros((4, 4), np.float32)
    mask[1:3, 1:3] = 1.0
    seg = SemanticSegmentationTarget(2, mask)
    out = jnp.arange(3 * 4 * 4, dtype=jnp.float32).reshape(3, 4, 4)
    expect = float((np.asarray(out)[2] * mask).sum())
    assert float(seg(out)) == expect
    seed = np.asarray(seg.seed_fn((3, 4, 4)))
    assert seed[2].sum() == 4.0 and seed[[0, 1]].sum() == 0.0
    # batched (B, C) logits take the per-row column like the upstream
    # targets (model_targets.py ClassifierOutputTarget on batched output)
    blogits = jnp.asarray([[1.0, 3.0, 2.0], [5.0, 0.0, 4.0]])
    np.testing.assert_array_equal(np.asarray(t(blogits)), [3.0, 0.0])
    bs = np.asarray(ts(blogits))
    assert bs.shape == (2,) and (0.0 < bs).all() and (bs < 1.0).all()


@pytest.mark.parametrize("method", ["grad_cam", "grad_cam_pp", "layer_cam",
                                    "score_cam"])
def test_variants_stream_padded_num_patches(setup, method):
    """The num_patches contract (shared with gradcam.py): a stream-padded
    x11 (Ls > 1 + P, zero-valued invalid tail like vit.VisionFeatures)
    yields the same (C, P) maps as the exact-length input."""
    cfg, frozen, x11, text, tmask, valid, cls = setup
    exact = variants.cam_single(method, frozen["visual"],
                                frozen["logit_scale"], x11, text, tmask,
                                valid, cls, cfg.clip, precision.FP32)
    pad = 7
    x11p = jnp.pad(x11, [(0, pad), (0, 0)])
    validp = jnp.pad(valid, (0, pad))
    padded = variants.cam_single(method, frozen["visual"],
                                 frozen["logit_scale"], x11p, text, tmask,
                                 validp, cls, cfg.clip, precision.FP32,
                                 num_patches=x11.shape[0] - 1)
    assert padded.shape == exact.shape
    # score_cam runs 768 perturbed forwards whose reductions re-associate
    # at the padded length — fp noise (~1e-5 on the [0,1] maps), not a
    # slicing bug; the weighted variants are deterministic slices
    tol = 1e-4 if method == "score_cam" else 1e-5
    np.testing.assert_allclose(np.asarray(padded), np.asarray(exact),
                               rtol=tol, atol=tol)


def test_eigen_methods_match_numpy_svd_oracle(setup):
    """Independent numpy oracle for the eigen methods (upstream
    svd_on_activations.get_2d_projection: center over positions, project
    onto the first right-singular vector).  SVD sign is implementation-
    defined, so agreement is up to a global sign per map — upstream has
    the same indeterminacy (it relies on centering + the ReLU epilogue)."""
    cfg, frozen, x11, text, tmask, valid, cls = setup
    rng2 = np.random.default_rng(9)
    acts = jnp.asarray(rng2.standard_normal((17, cfg.clip.vision_width)),
                       jnp.float32)
    grads = jnp.asarray(rng2.standard_normal((3, 17, cfg.clip.vision_width)),
                        jnp.float32)

    def np_projection(x):
        x = x - x.mean(axis=0)
        _, _, vt = np.linalg.svd(x, full_matrices=False)
        return x @ vt[0]

    a_np = np.asarray(acts)[1:]
    expect_eigen = np_projection(a_np)
    got_eigen = np.asarray(variants.eigen_cam(acts, grads, valid))
    for c in range(3):
        err = min(np.abs(got_eigen[c] - expect_eigen).max(),
                  np.abs(got_eigen[c] + expect_eigen).max())
        assert err < 1e-4, err

    got_eg = np.asarray(variants.eigen_grad_cam(acts, grads, valid))
    for c in range(3):
        expect_c = np_projection(a_np * np.asarray(grads)[c, 1:])
        err = min(np.abs(got_eg[c] - expect_c).max(),
                  np.abs(got_eg[c] + expect_c).max())
        assert err < 1e-4, err
