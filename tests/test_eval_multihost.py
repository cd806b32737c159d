"""Multi-host eval contract (VERDICT r4 #4): two disjoint process shards
must together reproduce the single-process scores exactly.

Simulation mode: explicit ``process_index/process_count`` makes
``Evaluator.run`` evaluate only its strided shard and return LOCAL
histograms (no collective — process_allgather would deadlock in a
single-process simulation); summing the shard histograms must equal the
single-process histograms bit-for-bit, because ragged-tail padding uses
all-ignore labels and per-example results do not depend on batch
composition.  (Real multi-host runs leave the defaults in place and get
the automatic cross-process all-reduce; the collective itself is
jax-library code exercised by the trainer's multihost tests.)
"""

import dataclasses

import numpy as np
import pytest

from tests import tiny
from tests.test_eval_engine import FakeDataset
from weclip_tpu.core import precision
from weclip_tpu.core.config import ParConfig
from weclip_tpu.evalx.runner import Evaluator, make_prep
from weclip_tpu.models import weclip


def _build(bsz=4):
    import jax
    cfg = tiny.tiny_config()
    cfg = dataclasses.replace(
        cfg, par=ParConfig(dilations=(1, 2), num_iter=2),
        eval=dataclasses.replace(cfg.eval, batch_images=bsz))
    frozen, clip_params = tiny.tiny_frozen(cfg)
    params = weclip.init_trainable_params(jax.random.PRNGKey(5), cfg)
    sizes = [(40, 64), (64, 56), (48, 48), (64, 64), (56, 40), (64, 64)]
    ds = FakeDataset(cfg, sizes)
    prep = make_prep(cfg, max_ori=64, resize_long=64)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=precision.FP32)
    return cfg, params, frozen, ds, ev


def test_two_process_shards_reproduce_single_process_scores():
    cfg, params, frozen, ds, ev = _build()
    single = ev.run(params, frozen, ds, return_hists=True)

    shard_hists = []
    for pi in range(2):
        out = ev.run(params, frozen, ds, process_index=pi, process_count=2,
                     return_hists=True)
        shard_hists.append(out["hists"])
    for key in ("seg", "msc_seg", "cam"):
        summed = shard_hists[0][key] + shard_hists[1][key]
        np.testing.assert_array_equal(
            summed, single["hists"][key],
            err_msg=f"hist {key}: 2-process shards != single process")


def test_shards_are_disjoint_and_cover(monkeypatch):
    """Every dataset index is evaluated by exactly one process."""
    cfg, params, frozen, ds, ev = _build()
    seen = []
    orig = ds.__class__.__getitem__

    def spy(self, i):
        seen.append(i)
        return orig(self, i)

    monkeypatch.setattr(ds.__class__, "__getitem__", spy)
    for pi in range(3):
        ev.run(params, frozen, ds, process_index=pi, process_count=3)
    assert sorted(seen) == sorted(list(range(len(ds)))), (
        "strided shards must partition the dataset exactly once")


def test_empty_shard_returns_zero_hists():
    """More processes than batches: the starved process must return empty
    histograms, not crash — on a real pod it still reaches the collective."""
    cfg, params, frozen, ds, ev = _build()
    out = ev.run(params, frozen, ds, process_index=7, process_count=8,
                 return_hists=True)
    for key in ("seg", "msc_seg", "cam"):
        assert out["hists"][key].sum() == 0


def test_bad_process_index_rejected():
    cfg, params, frozen, ds, ev = _build()
    with pytest.raises(ValueError):
        ev.run(params, frozen, ds, process_index=2, process_count=2)


def test_half_specified_sharding_rejected():
    """Only one of process_index/process_count would silently evaluate a
    partial dataset and report its scores as full-dataset scores."""
    cfg, params, frozen, ds, ev = _build()
    with pytest.raises(ValueError):
        ev.run(params, frozen, ds, process_count=4)
    with pytest.raises(ValueError):
        ev.run(params, frozen, ds, process_index=0)


def test_cross_process_mesh_rejects_explicit_sharding():
    """An Evaluator on a CROSS-PROCESS mesh runs the global-mesh SPMD
    contract (identical full example list on every process; per-round
    psum globalizes hists) — explicit per-process example sharding there
    would drop images and double-count, so run() must refuse it."""
    import numpy as np
    cfg, params, frozen, ds, ev = _build()

    class FakeDev:
        def __init__(self, p):
            self.process_index = p

    class FakeMesh:
        devices = np.array([FakeDev(0), FakeDev(1)])

    ev.mesh = FakeMesh()
    with pytest.raises(ValueError, match="cross-process mesh"):
        ev.run(params, frozen, ds, process_index=0, process_count=2)
