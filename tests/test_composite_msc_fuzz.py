"""Size-FUZZED msc-flip composite: randomized original geometries through
the batched ``evalx`` engine vs the reference validate loop.

test_composite_msc pins three odd sizes; eval is the geometry-heavy
surface (resize-long, 0.75 scale derivation, padded canvases, per-image
clamp operators, full-resolution argmax) so this sweep randomizes the
original shapes harder: square (resize-long binds both dims), extreme
landscape/portrait aspect ratios, near-tiny originals, and sizes whose
scaled grids land on odd patch counts.  Same oracle as the fixed test:
the reference msc-flip loop (test_msc_flip_voc.py:32-113) executed
against the actual reference module.
"""

import os

import numpy as np
import pytest

from tests.test_composite_golden import (build_tiny_pair, cpu_cuda,  # noqa: F401
                                         present_from_label)
from tests.test_composite_msc import RESIZE_LONG, _ref_validate
from tests.test_reference_golden import REF

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

NUM_FG = 20

CASES = [
    # (seed, [(oh, ow), ...])
    (5, [(80, 80), (33, 91), (95, 38)]),    # square + extreme aspects
    (17, [(21, 34), (69, 69), (90, 47)]),   # near-tiny + odd portrait
]


def _fuzz_examples(rng, sizes):
    labels = []
    for i, (oh, ow) in enumerate(sizes):
        lab = np.zeros((oh, ow), np.uint8)
        k = int(rng.integers(1, 3))
        ids = rng.choice(np.arange(1, NUM_FG + 1), size=k, replace=False)
        for cid in ids:
            y0 = int(rng.integers(0, max(1, oh - 6)))
            x0 = int(rng.integers(0, max(1, ow - 6)))
            lab[y0: int(rng.integers(y0 + 4, oh + 1)),
                x0: int(rng.integers(x0 + 4, ow + 1))] = cid
        if rng.random() < 0.5:
            lab[:2, :] = 255
        if not ((lab >= 1) & (lab <= NUM_FG)).any():
            lab[oh // 2, ow // 2] = ids[0]
        labels.append((f"m{i}", lab))
    return labels


@pytest.mark.parametrize("seed,sizes", CASES,
                         ids=[f"s{c[0]}" for c in CASES])
def test_mscflip_fuzzed_sizes(cpu_cuda, tmp_path, seed, sizes):
    torch = cpu_cuda
    rng = np.random.default_rng(seed)
    labels = _fuzz_examples(rng, sizes)
    (model, names, params, frozen, cfg, imgs,
     present) = build_tiny_pair(torch, tmp_path, labels=labels)

    from weclip_tpu.data.transforms import normalize_img
    examples = []
    for n, lab in labels:
        raw = rng.integers(0, 256, lab.shape + (3,)).astype(np.uint8)
        examples.append({"name": n,
                         "img": normalize_img(raw).transpose(2, 0, 1),
                         "img_raw": raw,
                         "label": lab.astype(np.int32),
                         "present_mask": present_from_label(lab)})

    h_seg, h_msc, h_cam = _ref_validate(torch, model, examples)

    from weclip_tpu.core import precision
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    prep = make_prep(cfg, max_ori=max(max(s) for s in sizes),
                     resize_long=RESIZE_LONG)
    pe = np.asarray(frozen["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=precision.FP32, with_cam=True,
                   msc=True)
    out = ev.run(params, frozen, examples, return_hists=True)

    total = sum((lab != 255).sum() for _, lab in labels)
    for key, ref_h in (("seg", h_seg), ("msc_seg", h_msc), ("cam", h_cam)):
        ours_h = out["hists"][key]
        assert ours_h.sum() == ref_h.sum() == total, (
            key, ours_h.sum(), ref_h.sum(), total)
        mismatch = np.abs(ours_h - ref_h).sum() / 2 / total
        assert mismatch <= 0.02, f"{key}: {mismatch:.4f} of pixels disagree"
