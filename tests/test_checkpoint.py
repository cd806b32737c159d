"""Checkpoint/resume: a run interrupted and restored must continue exactly
like an uninterrupted one (the reference cannot resume at all — SURVEY §5.3:
'a crash loses the run')."""

import jax
import jax.numpy as jnp
import numpy as np

from tests import tiny
from weclip_tpu.core import precision
from weclip_tpu.train import checkpoint
from weclip_tpu.train import step as step_mod


def _step(step_fn, state, frozen, batch, rng):
    return step_fn(state, frozen, batch, rng, None, None)


def test_resume_is_exact(tmp_path):
    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    batch = tiny.tiny_batch(cfg, clip_params)
    rng = jax.random.PRNGKey(3)

    state, tx = step_mod.create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = step_mod.make_train_step(cfg, tx, policy=precision.FP32)

    # uninterrupted: 4 steps
    s = state
    for _ in range(4):
        s, _ = _step(step_fn, s, frozen, batch, rng)
    final_params = jax.tree_util.tree_map(np.asarray, s.params)

    # interrupted: 2 steps, save, restore, 2 more steps
    s2, _ = step_mod.create_train_state(jax.random.PRNGKey(0), cfg)
    for _ in range(2):
        s2, _ = _step(step_fn, s2, frozen, batch, rng)
    ckpt_dir = str(tmp_path / "ckpt")
    checkpoint.save(ckpt_dir, int(s2.step), s2.params, s2.opt_state)

    s3_tmpl, _ = step_mod.create_train_state(jax.random.PRNGKey(0), cfg)
    params, opt_state, step0 = checkpoint.restore(
        ckpt_dir, template={"params": s3_tmpl.params,
                            "opt_state": s3_tmpl.opt_state,
                            "step": np.asarray(0)})
    assert step0 == 2
    s3 = step_mod.TrainState(params, opt_state, jnp.asarray(step0, jnp.int32))
    for _ in range(2):
        s3, _ = _step(step_fn, s3, frozen, batch, rng)

    resumed = jax.tree_util.tree_map(np.asarray, s3.params)
    for a, b in zip(jax.tree_util.tree_leaves(final_params),
                    jax.tree_util.tree_leaves(resumed)):
        np.testing.assert_array_equal(a, b)


def test_latest_step(tmp_path):
    d = str(tmp_path / "c")
    assert checkpoint.latest_step(d) is None
    checkpoint.save(d, 100, {"w": np.ones(3)})
    checkpoint.save(d, 200, {"w": np.zeros(3)})
    assert checkpoint.latest_step(d) == 200
    params, opt, step = checkpoint.restore(d)
    assert step == 200
    np.testing.assert_array_equal(np.asarray(params["w"]), np.zeros(3))


def test_restore_direct_step_path(tmp_path):
    """A step_N directory passed as base_dir restores that exact step
    (the eval CLIs receive such paths via --model_path)."""
    d = str(tmp_path / "ck")
    checkpoint.save(d, 100, {"w": np.ones(3)})
    path = checkpoint.save(d, 250, {"w": np.full(3, 5.0)})
    params, opt, step = checkpoint.restore(path)
    assert step == 250 and opt is None
    np.testing.assert_array_equal(np.asarray(params["w"]), np.full(3, 5.0))


def test_resume_picks_latest_checkpointed_run_dir(tmp_path):
    """apply_train_args(--resume): reuse the newest timestamped run dir that
    holds a step_* checkpoint instead of minting a fresh (empty) one."""
    import os
    import types
    from weclip_tpu.cli.common import apply_train_args
    from weclip_tpu.core.config import Config

    cfg = Config()
    wd = str(tmp_path / "work")
    base = os.path.join(wd, cfg.work_dir.ckpt_dir)
    os.makedirs(os.path.join(base, "2026-01-01-00-00", "step_00000010"))
    os.makedirs(os.path.join(base, "2026-01-02-00-00", "step_00000020"))
    os.makedirs(os.path.join(base, "2026-01-03-00-00"))      # empty run
    args = types.SimpleNamespace(crop_size=None, radius=None, max_iters=None,
                                 work_dir=wd, precision=None, resume=True)
    out = apply_train_args(cfg, args)
    assert out.work_dir.ckpt_dir.endswith("2026-01-02-00-00")
    args.resume = False
    out2 = apply_train_args(cfg, args)
    assert not out2.work_dir.ckpt_dir.endswith("2026-01-02-00-00")


def test_apply_train_args_override_wiring(tmp_path):
    """Every train CLI override must land in its config field (a typo in
    one dataclasses.replace would silently ignore the user's flag);
    --radius 0 must be honored (identity check, not truthiness —
    common.py documents the quirk)."""
    import types
    from weclip_tpu.cli.common import apply_train_args
    from weclip_tpu.core.config import Config

    cache = str(tmp_path / "cache")
    args = types.SimpleNamespace(crop_size=256, radius=0, max_iters=123,
                                 work_dir=str(tmp_path / "w"),
                                 precision="float32", resume=False,
                                 decoded_cache=cache)
    out = apply_train_args(Config(), args)
    assert out.dataset.crop_size == 256
    assert out.dataset.decoded_cache_dir == cache
    assert out.train.radius == 0
    assert out.train.max_iters == 123
    assert out.precision.compute_dtype == "float32"
    assert out.work_dir.dir == str(tmp_path / "w")
    # None/empty flags leave the config untouched
    args2 = types.SimpleNamespace(crop_size=None, radius=None, max_iters=None,
                                  work_dir=None, precision=None, resume=False)
    base = Config()
    out2 = apply_train_args(base, args2)
    assert out2.dataset.crop_size == base.dataset.crop_size
    assert out2.train.radius == base.train.radius
    assert out2.precision.compute_dtype == base.precision.compute_dtype
