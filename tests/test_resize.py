"""Resize ops vs torch F.interpolate / cv2 semantics (parity-critical:
clip/model.py:11-27, PAR.py:67, camutils.py:230, clip_tool.py:149)."""

import numpy as np
import torch
import torch.nn.functional as F

from weclip_tpu.ops.resize import (resize_bilinear, resize_nearest,
                                   upsample_pos_emb)


def test_bilinear_align_false_matches_torch(rng):
    x = rng.standard_normal((2, 3, 13, 17)).astype(np.float32)
    for oh, ow in [(20, 20), (7, 9), (13, 17), (64, 48)]:
        ours = np.asarray(resize_bilinear(x, oh, ow, align_corners=False))
        ref = F.interpolate(torch.from_numpy(x), size=(oh, ow),
                            mode="bilinear", align_corners=False).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_align_true_matches_torch(rng):
    x = rng.standard_normal((1, 4, 10, 10)).astype(np.float32)
    for oh, ow in [(33, 21), (5, 5)]:
        ours = np.asarray(resize_bilinear(x, oh, ow, align_corners=True))
        ref = F.interpolate(torch.from_numpy(x), size=(oh, ow),
                            mode="bilinear", align_corners=True).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_nearest_matches_torch(rng):
    x = rng.standard_normal((2, 1, 32, 48)).astype(np.float32)
    for oh, ow in [(2, 3), (32, 48), (7, 7)]:
        ours = np.asarray(resize_nearest(x, oh, ow))
        ref = F.interpolate(torch.from_numpy(x), size=(oh, ow),
                            mode="nearest").numpy()
        np.testing.assert_array_equal(ours, ref)


def test_nearest_downsample_is_strided_slice(rng):
    # camutils.py:230 downsamples labels x16 with 'nearest'
    x = rng.integers(0, 21, (1, 1, 64, 64)).astype(np.float32)
    ours = np.asarray(resize_nearest(x, 4, 4))
    np.testing.assert_array_equal(ours, x[:, :, ::16, ::16])


def test_upsample_pos_emb_matches_torch(rng):
    # clip/model.py:11-27: CLS kept, grid bilinearly resized (ac=False)
    d, g = 8, 14
    emb = rng.standard_normal((g * g + 1, d)).astype(np.float32)
    ours = np.asarray(upsample_pos_emb(emb, 20, 25))

    t = torch.from_numpy(emb)
    first, grid = t[:1], t[1:]
    grid = grid.permute(1, 0).view(1, d, g, g)
    grid = F.interpolate(grid, size=(20, 25), mode="bilinear")
    grid = grid.view(d, -1).permute(1, 0)
    ref = torch.cat([first, grid], 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
