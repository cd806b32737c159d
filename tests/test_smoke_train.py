"""End-to-end smoke: full train step (backbone -> CAM -> walk -> PAR ->
losses -> update) compiles and runs on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tests import tiny
from weclip_tpu.core import precision
from weclip_tpu.train import step as train_step_mod


def test_train_step_runs():
    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    batch = tiny.tiny_batch(cfg, clip_params)

    state, tx = train_step_mod.create_train_state(jax.random.PRNGKey(0), cfg)
    step_fn = train_step_mod.make_train_step(cfg, tx, policy=precision.FP32)
    rng = jax.random.PRNGKey(42)

    # copy before stepping: the step donates its input state buffers
    leaves0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    state2, metrics = step_fn(state, frozen, batch, rng)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics.loss))
    assert np.isfinite(float(metrics.seg_loss))
    assert np.isfinite(float(metrics.attn_loss))

    # params actually changed
    leaves1 = jax.tree_util.tree_leaves(state2.params)
    # warmup lr at step 0 is base_lr * 1e-6, so updates are ~1e-9: compare exactly
    changed = any(not np.array_equal(a, np.asarray(b))
                  for a, b in zip(leaves0, leaves1))
    assert changed

    # a second step (exercises the donated buffers / seg_trans cond flip)
    state3, metrics3 = step_fn(state2, frozen, batch, rng)
    assert np.isfinite(float(metrics3.loss))
