"""Device-built closed-form resize operators vs the host (numpy) builder."""

import numpy as np
import jax.numpy as jnp

from weclip_tpu.evalx.operators import clamp_resize_matrix, device_resize_matrix


def test_device_matrix_matches_host():
    cases = [
        (20, 375, 512, 32, False),
        (32, 500, 512, 32, False),
        (320, 375, 512, 512, True),
        (500, 500, 512, 512, True),
        (24, 32, 32, 24, False),
        (1, 7, 16, 4, True),            # out_size==1 guard (ac=True)
        (5, 5, 16, 8, False),           # identity-ish
    ]
    for in_s, out_s, canvas, src_pad, ac in cases:
        host = clamp_resize_matrix(in_s, out_s, canvas, src_pad, ac)
        dev = np.asarray(device_resize_matrix(jnp.int32(in_s), jnp.int32(out_s),
                                              canvas, src_pad, ac))
        # device builds in fp32 (TPU has no f64), host in f64: tiny rounding
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5,
                                   err_msg=str((in_s, out_s, canvas, src_pad, ac)))


def test_resize_matrices_match_torch_interpolate():
    """Independent oracle: the closed-form matrices must reproduce
    torch.nn.functional.interpolate (the reference's resize,
    test_msc_flip_voc.py:63/81) — not just each other.  Covers both
    coordinate mappings (align_corners True/False), non-square sizes, and
    up/down-scaling."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    cases = [
        (40, 93, False), (93, 40, False), (375, 512, False),
        (512, 375, False), (40, 93, True), (512, 375, True),
        (7, 7, False), (1, 5, True),
    ]
    for in_s, out_s, ac in cases:
        img = rng.standard_normal((1, 1, in_s, in_s)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(img), size=(out_s, out_s),
                            mode="bilinear", align_corners=ac).numpy()[0, 0]
        m = clamp_resize_matrix(in_s, out_s, out_s, in_s, ac)
        ours = m @ img[0, 0] @ m.T
        # fp32 weight rounding differs from torch's interp arithmetic at
        # ~1e-4 abs; a wrong coordinate mapping errs at O(0.1+) on unit-
        # variance images, so the bound separates the failure cleanly
        np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-4,
                                   err_msg=str((in_s, out_s, ac)))


def test_scale_matrix_matches_torch_scale_factor():
    """scale_factor_matrix vs torch's scale_factor coordinate mapping
    (test_msc_flip_voc.py:81: F.interpolate(scale_factor=0.75))."""
    import torch
    import torch.nn.functional as F

    from weclip_tpu.evalx.operators import scale_factor_matrix

    rng = np.random.default_rng(4)
    for in_s, scale in [(96, 0.75), (144, 0.75), (67, 0.75), (40, 0.5)]:
        out_s = int(in_s * scale)
        img = rng.standard_normal((1, 1, in_s, in_s)).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(img), scale_factor=scale,
                            mode="bilinear", align_corners=False,
                            recompute_scale_factor=False).numpy()[0, 0]
        assert ref.shape == (out_s, out_s)
        m = scale_factor_matrix(in_s, out_s, scale)
        ours = m @ img[0, 0] @ m.T
        np.testing.assert_allclose(ours, ref, rtol=0, atol=5e-4,
                                   err_msg=str((in_s, scale)))
