"""msc-flip evaluation sharded over the 8-device CPU mesh must produce
exactly the same scores as the unsharded run."""

import dataclasses

import jax
import numpy as np

from tests import tiny
from tests.test_eval_engine import FakeDataset
from weclip_tpu.core import precision
from weclip_tpu.core.config import ParConfig
from weclip_tpu.evalx.runner import Evaluator, make_prep
from weclip_tpu.models import weclip
from weclip_tpu.parallel import mesh as meshlib


def test_sharded_eval_matches_single(monkeypatch):
    assert jax.device_count() >= 8
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(cfg, par=ParConfig(dilations=(1, 2), num_iter=2),
                              eval=dataclasses.replace(cfg.eval, batch_images=8))
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)

    sizes = [(40, 64), (64, 56), (48, 48), (64, 64)] * 2
    ds = FakeDataset(cfg, sizes)
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])

    ev_single = Evaluator(cfg, prep, pe, policy=precision.FP32)
    scores_single = ev_single.run(params, frozen, ds)

    mesh = meshlib.make_mesh(data_parallel=8)
    frozen_r = meshlib.replicate(mesh, frozen)
    params_r = meshlib.replicate(mesh, params)
    ev_sharded = Evaluator(cfg, prep, pe, policy=precision.FP32, mesh=mesh)

    # the dp-only mesh must take the full-manual shard_map round (the path
    # whose per-device tracing enables every Pallas kernel on real pods) —
    # spy on per_device_region so a silent fall-through to the GSPMD round
    # cannot pass as equality
    from weclip_tpu.core import runtime
    entered = []
    orig_region = runtime.per_device_region

    def spy_region():
        entered.append(1)
        return orig_region()

    monkeypatch.setattr(runtime, "per_device_region", spy_region)
    scores_sharded = ev_sharded.run(params_r, frozen_r, ds)
    assert entered, "dp-only eval did not trace the shard_map round"

    # rtol 1e-5: the sharded and single layouts compile to different
    # fusion/accumulation orders, so pixel counts near argmax ties can
    # differ by a few; the mIoU ratios agree to ~1e-6..1e-5.
    for k in ("seg", "msc_seg", "cam"):
        np.testing.assert_allclose(scores_sharded[k]["miou"],
                                   scores_single[k]["miou"], rtol=1e-5,
                                   err_msg=k)
        np.testing.assert_allclose(scores_sharded[k]["pAcc"],
                                   scores_single[k]["pAcc"], rtol=1e-5)


def test_sharded_eval_matches_single_comer():
    """WeCLIP+ViT-CoMer eval through the dp-only shard_map round: the CTI
    branch runs inside the per-device body (evalx/runner.round_for) and
    must match the unsharded run.  The zero-init output gate is opened so
    the branch contributes nonzero features — otherwise CTI breakage would
    be invisible to the equality."""
    assert jax.device_count() >= 8
    from tests.test_comer import small_comer_cfg
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(cfg, par=ParConfig(dilations=(1, 2), num_iter=2),
                              eval=dataclasses.replace(cfg.eval,
                                                       batch_images=8),
                              comer=small_comer_cfg())
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)
    params["comer"]["out_w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(6), params["comer"]["out_w"].shape)

    sizes = [(40, 64), (64, 56), (48, 48), (64, 64)] * 2
    ds = FakeDataset(cfg, sizes)
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])

    ev_single = Evaluator(cfg, prep, pe, policy=precision.FP32)
    scores_single = ev_single.run(params, frozen, ds)

    mesh = meshlib.make_mesh(data_parallel=8)
    ev_sharded = Evaluator(cfg, prep, pe, policy=precision.FP32, mesh=mesh)
    scores_sharded = ev_sharded.run(meshlib.replicate(mesh, params),
                                    meshlib.replicate(mesh, frozen), ds)
    for k in ("seg", "msc_seg", "cam"):
        np.testing.assert_allclose(scores_sharded[k]["miou"],
                                   scores_single[k]["miou"], rtol=1e-5,
                                   err_msg=k)
