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


@pytest.mark.parametrize("want_weights", [True, False])
@pytest.mark.parametrize("l,lv", [(128, 128), (160, 130)])
def test_pallas_attention_matches_xla(rng, l, lv, want_weights):
    # want_weights=False drives the no-export grid (grid=(b, h, q_tiles),
    # head axis in the grid, swapped index maps) — a DIFFERENT kernel
    # layout from the export path, so both need a regression net here.
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
                                                interpret=True,
                                                want_weights=want_weights)
    np.testing.assert_allclose(np.asarray(pal_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    if want_weights:
        np.testing.assert_allclose(np.asarray(pal_attn), np.asarray(ref_attn),
                                   rtol=2e-5, atol=2e-5)
    else:
        assert pal_attn is None


def test_cross_attention_core_matches_xla():
    """Rectangular fused cross-attention (CoMer CTI) vs the XLA core, with
    padded/masked kv rows and an all-masked kv edge case."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from weclip_tpu.models.comer import _xla_cross_core
    from weclip_tpu.ops.pallas_attention import cross_attention_core_pallas

    rng = np.random.default_rng(0)
    b, h, lq, lk, dh = 2, 4, 70, 33, 16
    q = jnp.asarray(rng.standard_normal((b, lq, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    kvmask = np.ones((b, lk), np.float32)
    kvmask[0, 25:] = 0.0
    kvmask[1, :] = 0.0                       # all-masked: rows must be 0
    kvmask = jnp.asarray(kvmask)

    ref = np.asarray(_xla_cross_core(q, k, v, kvmask, jnp.float32))
    out = np.asarray(cross_attention_core_pallas(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), kvmask, interpret=True,
        score_dtype=jnp.float32).transpose(0, 2, 1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    assert np.all(out[1] == 0.0)


def test_attention_bwd_pallas_matches_xla_vjp():
    """Flash-style Pallas backward vs the vjp of the XLA cross core, on
    rectangular shapes with masked kv rows (the CoMer CTI case)."""
    from weclip_tpu.models.comer import _xla_cross_core
    from weclip_tpu.ops.pallas_attention import attention_bwd_pallas

    rng = np.random.default_rng(2)
    b, h, lq, lk, dh = 2, 3, 40, 27, 16
    q = jnp.asarray(rng.standard_normal((b, lq, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, lq, h, dh)), jnp.float32)
    kvmask = jnp.ones((b, lk), jnp.float32).at[0, 20:].set(0.0)

    _, vjp_fn = jax.vjp(
        lambda a, bb, c: _xla_cross_core(a, bb, c, kvmask, jnp.float32),
        q, k, v)
    rq, rk, rv = vjp_fn(g)

    t = lambda a: a.transpose(0, 2, 1, 3)
    dq, dk, dv = attention_bwd_pallas(t(q), t(k), t(v), t(g), kvmask,
                                      interpret=True,
                                      score_dtype=jnp.float32)
    for got, ref in ((t(dq), rq), (t(dk), rk), (t(dv), rv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_mha_fused_gradients_match_xla():
    """mha_with_weights_fused (Pallas fwd + Pallas flash bwd) gradients vs
    the plain XLA mha, in the GradCAM consumption pattern: the attention map
    leaves via has_aux, one vjp, pullback vmapped over several seeds."""
    from weclip_tpu.ops.pallas_attention import mha_with_weights_fused

    rng = np.random.default_rng(3)
    b, l, lv, d, h = 1, 160, 130, 32, 4
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    x[:, lv:] = 0.0
    valid = np.zeros((b, l), bool)
    valid[:, :lv] = True
    x, valid = jnp.asarray(x), jnp.asarray(valid)
    p = _params(np.random.default_rng(4), d)
    w = jnp.asarray(rng.standard_normal((d,)), jnp.float32)

    def head(fn, kw):
        def f(a):
            out, attn = fn(a, p, h, valid=valid, policy=precision.FP32, **kw)
            return out @ w, attn
        return f

    ref_out, ref_pull, ref_attn = jax.vjp(head(mha_with_weights, {}), x,
                                          has_aux=True)
    fus_out, fus_pull, fus_attn = jax.vjp(
        head(mha_with_weights_fused, {"interpret": True}), x, has_aux=True)
    np.testing.assert_allclose(np.asarray(fus_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fus_attn), np.asarray(ref_attn),
                               rtol=2e-5, atol=2e-5)

    seeds = jnp.asarray(rng.standard_normal((3, b, l)), jnp.float32)
    g_ref = jax.vmap(lambda s: ref_pull(s)[0])(seeds)
    g_fus = jax.vmap(lambda s: fus_pull(s)[0])(seeds)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_cross_core_fused_gradients_match_xla():
    """custom_vjp backward (XLA recompute) == grads of the XLA core."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from weclip_tpu.models import comer

    rng = np.random.default_rng(1)
    b, h, lq, lk, dh = 1, 2, 12, 9, 8
    q = jnp.asarray(rng.standard_normal((b, lq, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, h, dh)), jnp.float32)
    kvmask = jnp.ones((b, lk), jnp.float32).at[0, 6:].set(0.0)

    def loss_xla(q, k, v):
        return jnp.sum(comer._xla_cross_core(q, k, v, kvmask, jnp.float32) ** 2)

    # route the fused fwd through interpret mode so this runs on CPU
    orig = comer._cross_core_fwd

    def fwd_interpret(qp, kp, vp, m, cd):
        from weclip_tpu.ops.pallas_attention import cross_attention_core_pallas
        out = cross_attention_core_pallas(
            qp.transpose(0, 2, 1, 3), kp.transpose(0, 2, 1, 3),
            vp.transpose(0, 2, 1, 3), m, interpret=True, score_dtype=cd)
        return out.transpose(0, 2, 1, 3), (qp, kp, vp, m)

    comer._cross_core_fused.defvjp(fwd_interpret, comer._cross_core_bwd)
    try:
        def loss_fused(q, k, v):
            return jnp.sum(comer._cross_core_fused(q, k, v, kvmask,
                                                   jnp.float32) ** 2)
        g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)
    finally:
        comer._cross_core_fused.defvjp(orig, comer._cross_core_bwd)
