"""Pallas fused attention (interpret mode on CPU) vs the XLA reference op."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision
from weclip_tpu.ops.attention import MhaParams, mha_with_weights
from weclip_tpu.ops.pallas_attention import mha_with_weights_pallas


def _params(rng, d):
    return MhaParams(
        jnp.asarray(rng.standard_normal((3 * d, d)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((3 * d,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1))


@pytest.mark.parametrize("l,lv", [(128, 128), (160, 130)])
def test_pallas_attention_matches_xla(rng, l, lv):
    b, d, h = 2, 32, 4
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    x[:, lv:] = 0.0
    valid = np.zeros((b, l), bool)
    valid[:, :lv] = True
    p = _params(rng, d)

    ref_out, ref_attn = mha_with_weights(jnp.asarray(x), p, h,
                                         valid=jnp.asarray(valid),
                                         policy=precision.FP32)
    pal_out, pal_attn = mha_with_weights_pallas(jnp.asarray(x), p, h,
                                                valid=jnp.asarray(valid),
                                                policy=precision.FP32,
                                                interpret=True)
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pal_attn), np.asarray(ref_attn),
                               rtol=2e-5, atol=2e-5)
