"""Dense CRF: the native permutohedral filter vs brute-force Gaussian
filtering, and mean-field behavior checks."""

import numpy as np
import pytest

from weclip_tpu.refine.crf import DenseCRF, permutohedral_filter


def brute_force_gauss(features, values):
    """O(n^2) exact Gaussian filter: out_i = sum_j exp(-|f_i-f_j|^2/2) v_j."""
    d2 = ((features[:, None, :] - features[None, :, :]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2)
    return k @ values


def test_permutohedral_matches_bruteforce_2d(rng):
    n = 300
    feats = rng.uniform(0, 6, (n, 2)).astype(np.float32)
    vals = rng.standard_normal((n, 4)).astype(np.float32)
    ours = permutohedral_filter(feats, vals)
    ref = brute_force_gauss(feats, vals)
    # the lattice is the same approximation pydensecrf uses: high correlation
    # with the true Gaussian, slightly different effective bandwidth
    cc = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert cc > 0.99, cc
    rel = np.abs(ours - ref) / (np.abs(ref) + 1e-3)
    assert np.median(rel) < 0.4, np.median(rel)


def test_permutohedral_5d(rng):
    n = 200
    feats = rng.uniform(0, 4, (n, 5)).astype(np.float32)
    vals = rng.standard_normal((n, 2)).astype(np.float32)
    ours = permutohedral_filter(feats, vals)
    ref = brute_force_gauss(feats, vals)
    cc = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert cc > 0.95, cc          # lattice quality degrades with dimension


def _synthetic_case(rng, h=40, w=40, c=3):
    """Two-region image with noisy unaries."""
    img = np.zeros((h, w, 3), np.uint8)
    img[:, : w // 2] = (200, 30, 30)
    img[:, w // 2:] = (30, 30, 200)
    gt = np.zeros((h, w), np.int64)
    gt[:, w // 2:] = 1
    probs = np.full((c, h, w), 0.05, np.float32)
    for l in range(2):
        probs[l][gt == l] = 0.8
    # inject label noise
    noise = rng.random((h, w)) < 0.15
    flip = probs[0].copy()
    probs[0][noise] = probs[1][noise]
    probs[1][noise] = flip[noise]
    probs /= probs.sum(0, keepdims=True)
    return img, probs, gt


def test_dense_crf_denoises(rng):
    img, probs, gt = _synthetic_case(rng)
    crf = DenseCRF(iter_max=10, pos_xy_std=3, pos_w=3,
                   bi_xy_std=16, bi_rgb_std=5, bi_w=4)
    out = crf(img, probs)
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)
    acc_before = (probs.argmax(0) == gt).mean()
    acc_after = (out.argmax(0) == gt).mean()
    assert acc_after > acc_before
    assert acc_after > 0.98, (acc_before, acc_after)


def test_jax_mean_field_denoises(rng):
    import jax.numpy as jnp
    from weclip_tpu.core.config import CrfConfig
    from weclip_tpu.refine.crf import mean_field_crf_jax
    img, probs, gt = _synthetic_case(rng)
    cfg = CrfConfig(iter_max=5, pos_xy_std=3, pos_w=3,
                    bi_xy_std=16, bi_rgb_std=5, bi_w=4)
    out = np.asarray(mean_field_crf_jax(
        jnp.asarray(probs), jnp.asarray(img.transpose(2, 0, 1), jnp.float32),
        cfg, bi_stride=4))
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-3)
    acc_before = (probs.argmax(0) == gt).mean()
    acc_after = (out.argmax(0) == gt).mean()
    assert acc_after > acc_before, (acc_before, acc_after)


def test_jax_mean_field_agrees_with_native_lattice():
    """Quantified fidelity of the --crf_impl jax approximation: argmax
    agreement with the EXACT native permutohedral lattice at the reference
    kernel params (test_msc_flip_voc.py:126-133) on a structured image
    where the CRF meaningfully changes the unary argmax."""
    import jax.numpy as jnp
    from weclip_tpu.core.config import CrfConfig
    from weclip_tpu.refine.crf import mean_field_crf_jax

    rng2 = np.random.default_rng(3)
    h = w = 160
    img = np.zeros((h, w, 3), np.float32)
    img[...] = [90, 120, 80]
    yy, xx = np.mgrid[0:h, 0:w]
    img[(yy - 50) ** 2 + (xx - 45) ** 2 < 35 ** 2] = [200, 60, 50]
    img[(np.abs(yy - 110) < 28) & (np.abs(xx - 110) < 34)] = [40, 80, 190]
    img = np.clip(img + rng2.normal(0, 12, img.shape), 0, 255).astype(np.uint8)

    gt = np.zeros((h, w), np.int64)
    gt[(yy - 50) ** 2 + (xx - 45) ** 2 < 35 ** 2] = 1
    gt[(np.abs(yy - 110) < 28) & (np.abs(xx - 110) < 34)] = 2
    noisy = np.where(rng2.random((h, w)) < 0.12,
                     rng2.integers(0, 3, (h, w)), gt)
    probs = np.full((3, h, w), 0.15 / 2, np.float32)
    for c in range(3):
        probs[c][noisy == c] = 0.85

    cfg = CrfConfig()           # the reference msc-driver params (64/5/4)
    native = DenseCRF.from_config(cfg)(img, probs).argmax(0)
    # the case is non-trivial: CRF must actually move the unary argmax
    assert (native != probs.argmax(0)).mean() > 0.05

    img_dev = jnp.asarray(img.transpose(2, 0, 1), jnp.float32)
    agree = {}
    # strides 4/8 take the DENSE untruncated-kernel path (N <= 4096 here);
    # stride 2 (N = 6400) covers the windowed fori_loop path
    for stride in (2, 4, 8):
        pred = np.asarray(mean_field_crf_jax(jnp.asarray(probs), img_dev,
                                             cfg, bi_stride=stride)).argmax(0)
        agree[stride] = (pred == native).mean()
    # measured: 0.9984 @ 2 (windowed), 0.9977 @ 4, 0.9921 @ 8 (dense)
    assert agree[2] >= 0.99, agree
    assert agree[4] >= 0.99, agree
    assert agree[8] >= 0.98, agree


def test_permutohedral_normalized_ratio_tight(rng):
    """The mean field consumes the NORMALIZED filter (filt(v)/filt(1),
    symmetric normalization like pydensecrf): lattice quantization errors
    largely cancel in the ratio, so this pins it elementwise — a
    systematic bandwidth/scale error in the blur stage (which the
    correlation test is invariant to) fails here."""
    n = 300
    feats = rng.uniform(0, 6, (n, 2)).astype(np.float32)
    vals = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
    aug = np.concatenate([vals, np.ones((n, 1), np.float32)], 1)
    ours = permutohedral_filter(feats, aug)
    ref = brute_force_gauss(feats, aug)
    ours_ratio = ours[:, :3] / ours[:, 3:4]
    ref_ratio = ref[:, :3] / ref[:, 3:4]
    err = np.abs(ours_ratio - ref_ratio)
    assert np.median(err) < 0.02, np.median(err)
    assert err.max() < 0.25, err.max()
    # and a constant field is preserved exactly under normalization
    const = permutohedral_filter(feats, np.full((n, 2), 0.7, np.float32))
    ones = permutohedral_filter(feats, np.ones((n, 1), np.float32))
    np.testing.assert_allclose(const / ones, 0.7, rtol=1e-4)


def test_jax_crf_miou_delta_within_parity_budget():
    """Ties the jax-CRF approximation to the ±0.3-mIoU north-star budget
    (VERDICT r3 #5): on a structured multi-image eval where the native
    lattice CRF meaningfully moves the confusion histograms — label noise
    CONCENTRATED at segment boundaries, exactly where dense-CRF earns its
    mIoU — the stride-4 and stride-8 jax paths' mIoU may deviate from the
    exact native-lattice mIoU by at most a stated fraction of the budget.

    Measured here (a fixture where the CRF's own contribution is ~22.5
    mIoU pts, far beyond its ≲1 pt real-data effect): native lifts 77.0 ->
    99.5; jax RETAINS 89% of that lift at stride 4 (97.1) and 74% at
    stride 8 (93.7).  Deviation scales with the CRF's contribution, so at
    a real-data CRF gain of ~1 pt the expected deviation is ~0.11 pt
    (stride 4 — inside the 0.3 budget with margin) vs ~0.26 pt (stride 8
    — marginal).  The assertions pin the retained fractions; the defaults
    decision they justify (PARITY.md): --crf_impl native (EXACT, zero
    approximation) stays the parity default, and the jax speed path
    defaults to stride 4, with stride 8 the explicit fast mode.
    """
    import jax.numpy as jnp
    from weclip_tpu.core.config import CrfConfig
    from weclip_tpu.evalx.metrics import scores
    from weclip_tpu.refine.crf import mean_field_crf_jax

    rng2 = np.random.default_rng(11)
    K, h, w = 4, 128, 128
    cfg = CrfConfig()
    hists = {k: np.zeros((K, K), np.float64)
             for k in ("unary", "native", "jax4", "jax8")}

    for case in range(6):
        yy, xx = np.mgrid[0:h, 0:w]
        gt = np.zeros((h, w), np.int64)
        cy, cx, r = 40 + 6 * case, 38 + 5 * case, 26 + 2 * case
        gt[(yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2] = 1
        gt[(np.abs(yy - 96) < 20) & (np.abs(xx - (90 - 4 * case)) < 24)] = 2
        gt[:, : 12 + case] = 3
        colors = np.array([[90, 120, 80], [200, 60, 50],
                           [40, 80, 190], [220, 200, 60]], np.float32)
        img = colors[gt] + rng2.normal(0, 10, (h, w, 3))
        img = np.clip(img, 0, 255).astype(np.uint8)

        # boundary-band noise: within 3 px of a label edge flip to a
        # random class with p=0.45; sparse 4% interior noise
        edge = np.zeros((h, w), bool)
        edge[:-1] |= gt[:-1] != gt[1:]
        edge[:, :-1] |= gt[:, :-1] != gt[:, 1:]
        band = edge.copy()
        for _ in range(3):
            band[1:] |= band[:-1]; band[:-1] |= band[1:]
            band[:, 1:] |= band[:, :-1]; band[:, :-1] |= band[:, 1:]
        flip = (band & (rng2.random((h, w)) < 0.45)) | \
               (~band & (rng2.random((h, w)) < 0.04))
        noisy = np.where(flip, rng2.integers(0, K, (h, w)), gt)
        probs = np.full((K, h, w), 0.15 / (K - 1), np.float32)
        for c in range(K):
            probs[c][noisy == c] = 0.85

        preds = {"unary": probs.argmax(0),
                 "native": DenseCRF.from_config(cfg)(img, probs).argmax(0)}
        img_dev = jnp.asarray(img.transpose(2, 0, 1), jnp.float32)
        for stride in (4, 8):
            preds[f"jax{stride}"] = np.asarray(mean_field_crf_jax(
                jnp.asarray(probs), img_dev, cfg,
                bi_stride=stride)).argmax(0)
        for k, p in preds.items():
            hists[k] += np.bincount(K * gt.ravel() + p.ravel(),
                                    minlength=K * K).reshape(K, K)

    miou = {k: scores(hists[k])["miou"] * 100.0 for k in hists}
    # the fixture is meaningful: native CRF moves mIoU substantially
    gain = miou["native"] - miou["unary"]
    assert gain > 20.0, miou
    retained4 = (miou["jax4"] - miou["unary"]) / gain
    retained8 = (miou["jax8"] - miou["unary"]) / gain
    # stride 4 must retain >= 85% of the CRF's effect => at the reference's
    # real-data CRF-gain scale (~1 pt) a deviation <= 0.15 = half the 0.3
    # budget; stride 8 >= 70% (~0.3 pt at that scale — budget-marginal,
    # hence NOT the accuracy default)
    assert retained4 >= 0.85, (miou, retained4)
    assert retained8 >= 0.70, (miou, retained8)
