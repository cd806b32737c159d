"""The --mesh plumbing: CLI arg -> data mesh -> sharded eval through the
same helpers the drivers use (cli/common.build_eval_mesh, trainer.validate).
"""

import argparse
import dataclasses

import jax
import numpy as np

from tests import tiny
from tests.test_eval_engine import FakeDataset
from weclip_tpu.cli import common
from weclip_tpu.core import precision
from weclip_tpu.core.config import ParConfig
from weclip_tpu.models import weclip
from weclip_tpu.parallel import mesh as meshlib


def _args(mesh):
    return argparse.Namespace(mesh=mesh)


def test_build_eval_mesh_resolves_and_replicates():
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, batch_images=6))
    frozen, _ = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(0), cfg)

    cfg2, mesh, params2, frozen2 = common.build_eval_mesh(
        cfg, _args(-1), params, frozen)
    n = jax.device_count()
    assert mesh is not None and mesh.shape["data"] == n
    assert cfg2.eval.batch_images % n == 0
    # replicated leaves carry the mesh sharding
    leaf = jax.tree_util.tree_leaves(params2)[0]
    assert leaf.sharding.mesh.shape == mesh.shape

    # single-chip request leaves everything untouched
    cfg1, mesh1, p1, f1 = common.build_eval_mesh(cfg, _args(1), params, frozen)
    assert mesh1 is None and p1 is params and f1 is frozen
    assert cfg1.eval.batch_images == 6


def test_trainer_validate_sharded_matches_single():
    from weclip_tpu.train.trainer import validate
    assert jax.device_count() >= 8
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(
        cfg, par=ParConfig(dilations=(1, 2), num_iter=2),
        eval=dataclasses.replace(cfg.eval, batch_images=8))
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)
    ds = FakeDataset(cfg, [(48, 64), (64, 48), (64, 64), (40, 56)])

    single = validate(cfg, params, frozen, clip_params, ds, precision.FP32)

    mesh = meshlib.make_mesh(data_parallel=8)
    sharded = validate(cfg, meshlib.replicate(mesh, params),
                       meshlib.replicate(mesh, frozen), clip_params, ds,
                       precision.FP32, mesh=mesh)
    for k in ("seg", "cam"):
        np.testing.assert_allclose(sharded[k]["miou"], single[k]["miou"],
                                   rtol=1e-6, err_msg=k)


def test_pallas_dispatch_follows_declared_sharding(monkeypatch):
    """pallas_ok keys on whether compute is partitioned, not on how many
    devices the host happens to expose: a single-device eval on a
    multi-device host keeps the Mosaic kernels (10x PAR cliff otherwise)."""
    import pytest
    from weclip_tpu.core import runtime

    monkeypatch.setattr(runtime, "_sharded_compute", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert jax.device_count() >= 8
    # undeclared: conservative fallback keys on global device count
    assert not runtime.pallas_ok()

    # a multi-device mesh declares partitioned compute
    meshlib.make_mesh(data_parallel=8)
    assert not runtime.pallas_ok()

    # a 1x1 mesh declares whole-device compute: kernels stay on
    meshlib.make_mesh(data_parallel=1, model_parallel=1)
    assert runtime.pallas_ok()

    # the CLI single-device fast path declares too
    monkeypatch.setattr(runtime, "_sharded_compute", None)
    cfg = tiny.tiny_config()
    frozen, _ = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(0), cfg)
    _, mesh1, _, _ = common.build_eval_mesh(cfg, _args(1), params, frozen)
    assert mesh1 is None
    assert runtime.pallas_ok()

    # --mesh not divisible by the tensor-parallel width: clear error
    cfg_tp = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, model_parallel=2))
    with pytest.raises(SystemExit, match="model_parallel"):
        common.build_eval_mesh(cfg_tp, _args(5), params, frozen)

    # but '--mesh 1 = single chip' (the help-text promise) always works,
    # even under a tensor-parallel config — single-device fast path
    _, mesh_tp1, _, _ = common.build_eval_mesh(cfg_tp, _args(1), params,
                                               frozen)
    assert mesh_tp1 is None

    # an Evaluator declares its own sharding: constructing a single-device
    # one after a multi-device mesh re-enables the kernels (latest wins)
    meshlib.make_mesh(data_parallel=8)
    assert not runtime.pallas_ok()
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.zeros((17, cfg.clip.vision_width), np.float32)
    Evaluator(cfg, prep, pe, mesh=None)
    assert runtime.pallas_ok()


def test_per_device_region_overrides_partitioned_compute(monkeypatch):
    """While a shard_map-manual body is being traced (runtime.
    per_device_region — the dp-only eval round, evalx/runner.round_for)
    every kernel dispatch must fire even though the process declared
    multi-device compute: inside the body each operand is a whole
    per-device array."""
    from weclip_tpu.core import runtime

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(runtime, "_sharded_compute", None)
    meshlib.make_mesh(data_parallel=8)
    assert not runtime.pallas_ok()
    with runtime.per_device_region():
        assert runtime.pallas_ok()
        with runtime.per_device_region():          # re-entrant
            assert runtime.pallas_ok()
        assert runtime.pallas_ok()
    assert not runtime.pallas_ok()

    # the backend gate still comes first: CPU-mesh tests that trace the
    # sharded round must keep the XLA formulations inside the region
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    with runtime.per_device_region():
        assert not runtime.pallas_ok()
