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
