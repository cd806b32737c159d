"""Pallas PAR kernel (interpret mode) vs the XLA reference implementation."""

import numpy as np

import jax.numpy as jnp

from weclip_tpu.core.config import ParConfig
from weclip_tpu.refine.par import par_refine
from weclip_tpu.refine.pallas_par import par_refine_pallas


def test_pallas_par_matches_xla(rng):
    cfg = ParConfig(dilations=(1, 2, 4), num_iter=4)
    imgs = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    masks = rng.uniform(0, 1, (2, 5, 32, 32)).astype(np.float32)

    ref = np.asarray(par_refine(jnp.asarray(imgs), jnp.asarray(masks), cfg))
    ours = np.asarray(par_refine_pallas(jnp.asarray(imgs), jnp.asarray(masks),
                                        cfg, c_tile=2, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_pallas_par_full_dilations(rng):
    cfg = ParConfig(dilations=(1, 2, 4, 8, 12, 24), num_iter=2)
    imgs = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    masks = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    ref = np.asarray(par_refine(jnp.asarray(imgs), jnp.asarray(masks), cfg))
    ours = np.asarray(par_refine_pallas(jnp.asarray(imgs), jnp.asarray(masks),
                                        cfg, c_tile=4, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_pick_c_tile():
    """Tile choice: minimize (#tiles, padded channels), prefer larger tiles."""
    from weclip_tpu.refine.pallas_par import _pick_c_tile
    assert _pick_c_tile(5) == 5        # one exact tile
    assert _pick_c_tile(9) == 9
    assert _pick_c_tile(21) == 7       # 3 exact tiles beats 3 padded ones
    assert _pick_c_tile(17) == 9       # 2 tiles, cp=18
    assert _pick_c_tile(81) == 9       # 9 exact tiles


def test_bf16_speed_mode_close():
    """Opt-in bf16 PAR: fp32 accumulator, half-width streams; stays close to
    the fp32 oracle (it is NOT the parity default)."""
    import jax.numpy as jnp
    from weclip_tpu.refine.par import par_refine
    from weclip_tpu.refine.pallas_par import par_refine_pallas
    cfg = ParConfig(dilations=(1, 2), num_iter=6)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.standard_normal((1, 3, 64, 64)), jnp.float32)
    masks = jnp.asarray(r.random((1, 5, 64, 64)), jnp.float32)
    ref = np.asarray(par_refine(imgs, masks, cfg))
    b16 = np.asarray(par_refine_pallas(imgs, masks, cfg, interpret=True,
                                       compute_dtype=jnp.bfloat16))
    assert np.abs(b16 - ref).max() < 0.05
    assert (b16.argmax(1) == ref.argmax(1)).mean() > 0.97


def test_pallas_affinity_builder_matches_xla(rng):
    """The fused affinity-builder kernel vs refine.par.par_affinity: same
    shift order, moments, softmax, and positional add (sequential softmax
    sum vs XLA's reduction tree is the only divergence — fp32 noise)."""
    from weclip_tpu.refine.par import _OFFSETS, par_affinity
    from weclip_tpu.refine.pallas_par import _round_up, par_affinity_pallas

    for (b, h, w, dil) in [(2, 64, 64, (1, 2)),
                           (1, 64, 96, (1, 2, 4, 8, 12, 24)),
                           (2, 32, 40, (1, 3))]:
        cfg = ParConfig(dilations=dil)
        imgs = jnp.asarray(rng.standard_normal((b, 3, h, w)), jnp.float32)
        base = [(dy * dd, dx * dd) for dd in dil for (dy, dx) in _OFFSETS]
        perm = tuple(sorted(range(len(base)), key=lambda i: base[i]))
        ref = np.asarray(par_affinity(imgs, cfg, order=perm))
        got = np.asarray(par_affinity_pallas(
            imgs, cfg, order=perm, w_out=_round_up(w, 128),
            interpret=True))
        # lane-pad columns (>= w) are finite garbage by contract
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got[..., :w], ref, rtol=2e-5, atol=2e-5)
