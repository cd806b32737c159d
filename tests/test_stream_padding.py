"""Stream-padding invariance: the frozen backbone pads its token stream to
the attention kernel's preferred length (ops/pallas_attention.py::
stream_pad_len); the pad amount must be unobservable in every valid output.

These tests run the SAME inputs under two different pad amounts (the
default fixed point vs. a deliberately larger one) and require bit-identical
results on the valid region / in the downstream model outputs — pinning the
masking contract of vit.VisionFeatures against regressions.
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from tests import tiny
from weclip_tpu.core import precision
from weclip_tpu.models import weclip
from weclip_tpu.models.clip import vit


@contextlib.contextmanager
def _extra_stream_pad(extra: int):
    """Temporarily grow the stream pad by ``extra`` (multiple of 64 keeps it
    a fixed point of the q-tile pick at tiny lengths)."""
    from weclip_tpu.ops import pallas_attention as pa
    orig = pa.stream_pad_len
    pa.stream_pad_len = lambda l: orig(l) + extra
    try:
        yield orig
    finally:
        pa.stream_pad_len = orig


def test_vision_forward_invariant_to_stream_pad():
    rng = np.random.default_rng(11)
    cfg = tiny.tiny_config()
    params = vit.init_vision_params(jax.random.PRNGKey(3), cfg.clip)

    b, hw = 2, 64
    img = jnp.asarray(rng.standard_normal((b, 3, hw, hw)), jnp.float32)
    g = hw // 16
    l = g * g + 1
    pe = vit.build_pos_emb(params, g, g)[None]
    valid = jnp.ones((b, l), bool)

    default = vit.vision_forward_frozen(params, img, pe, valid, cfg.clip,
                                        policy=precision.FP32)
    with _extra_stream_pad(64) as orig:
        padded = vit.vision_forward_frozen(params, img, pe, valid, cfg.clip,
                                           policy=precision.FP32)

    assert default.layer_tokens.shape[2] == orig(l)
    assert padded.layer_tokens.shape[2] == orig(l) + 64
    np.testing.assert_array_equal(
        np.asarray(padded.layer_tokens[:, :, :l]),
        np.asarray(default.layer_tokens[:, :, :l]))
    np.testing.assert_array_equal(
        np.asarray(padded.layer_attn[:, :, :l, :l]),
        np.asarray(default.layer_attn[:, :, :l, :l]))
    # padded tokens are marked invalid
    assert not bool(np.asarray(padded.valid[:, l:]).any())


def test_forward_train_invariant_to_stream_pad():
    """End-to-end: seg logits, pseudo-labels, affinity, and refined CAMs are
    bit-identical under a different stream pad (consumers slice [1:1+P])."""
    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    batch = tiny.tiny_batch(cfg, clip_params)
    params = weclip.init_trainable_params(jax.random.PRNGKey(2), cfg)

    out_default = weclip.forward_train(params, frozen, batch, cfg,
                                       jnp.bool_(True), None, precision.FP32)
    with _extra_stream_pad(64):
        out_padded = weclip.forward_train(params, frozen, batch, cfg,
                                          jnp.bool_(True), None,
                                          precision.FP32)

    for a, b, name in zip(out_padded, out_default, out_padded._fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {name}")
