"""Class-bucket compaction must not change pseudo-labels."""

import jax
import jax.numpy as jnp
import numpy as np

from tests import tiny
from weclip_tpu.core import precision
from weclip_tpu.core.compaction import compact_classes, pick_bucket
from weclip_tpu.models import weclip


def test_compacted_pseudo_labels_match_full():
    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    batch = tiny.tiny_batch(cfg, clip_params)
    params = weclip.init_trainable_params(jax.random.PRNGKey(2), cfg)

    full = weclip.forward_train(params, frozen, batch, cfg,
                                jnp.bool_(True), None, precision.FP32)

    presents = np.asarray(batch.present_mask)
    mc = pick_bucket(presents, (2, 3, 5))
    assert mc < cfg.dataset.num_classes - 1      # actually compacted
    ci, ca = compact_classes(presents, mc)
    comp = weclip.forward_train(params, frozen, batch, cfg,
                                jnp.bool_(True), None, precision.FP32,
                                cls_idx=jnp.asarray(ci),
                                cls_active=jnp.asarray(ca))

    np.testing.assert_array_equal(np.asarray(full.cam_labels),
                                  np.asarray(comp.cam_labels))
    np.testing.assert_allclose(np.asarray(full.seg), np.asarray(comp.seg),
                               rtol=1e-6)


def test_pick_bucket_and_compact():
    presents = np.zeros((3, 10), bool)
    presents[0, [1, 5]] = True
    presents[1, [0]] = True
    presents[2, [2, 3, 9]] = True
    assert pick_bucket(presents, (2, 4, 10)) == 4
    ci, ca = compact_classes(presents, 4)
    assert ci.shape == (3, 4)
    np.testing.assert_array_equal(ci[2, :3], [2, 3, 9])
    assert ca[2].sum() == 3 and ca[1].sum() == 1


def test_lut_select_matches_gather():
    """weclip._lut_select (the select-sum replacement for the ~12 ms XLA
    canvas gather) must equal the straightforward per-image lut[idx]."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from weclip_tpu.models.weclip import _lut_select

    rng = np.random.default_rng(0)
    b, mc, hw = 3, 4, 17
    lut = jnp.asarray(rng.integers(0, 21, (b, mc + 1)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, mc + 1, (b, hw, hw)), jnp.int32)
    want = jax.vmap(lambda l, ix: l[ix])(lut, idx)
    got = _lut_select(lut, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
