"""COCO full-protocol dress rehearsal (VERDICT r4 #7).

The reference COCO recipe (scripts/dist_clip_coco.py:287,
configs/coco_attn_reg.yaml:19-21) runs 80k iters with NO mid-training
validation, checkpoints only after iter 40k, and flips the seg-trans
affinity source at 40k.  The per-component behaviors are tested
elsewhere; what was never run is the PROTOCOL: one long(ish) synthetic
run through `cli.train_coco.main()` whose iteration count straddles a
scaled-down seg-trans gate and checkpoint-start, so gate flip, checkpoint
cadence, and loop stability are exercised in a single pass the way the
real 80k run would.  (Wall-clock projection for the real run lives in
PARITY.md, derived from the benched COCO step time.)
"""

import dataclasses
import glob
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cli_e2e import _argv, coco_tree  # noqa: F401  (fixture)


def _rehearsal_yaml(root, base_yaml):
    """Derive the long-run config from the e2e fixture's tiny yaml: 48
    iters straddling ckpt_start_iter=20 and seg_trans gate=24 (the 80k /
    40k protocol at 1/1667 scale), checkpoint every eval_iters=12."""
    text = open(base_yaml).read()
    text = text.replace("max_iters: 2", "max_iters: 48")
    text = text.replace("eval_iters: 2", "eval_iters: 12")
    text = text.replace("ckpt_start_iter: 1",
                        "ckpt_start_iter: 20\n  seg_trans_start_iter: 24")
    text = text.replace(f"dir: {root}/work\n",
                        f"dir: {root}/work_rehearsal\n")
    path = os.path.join(str(root), "rehearsal_coco.yaml")
    with open(path, "w") as f:
        f.write(text)
    return path


def test_coco_long_run_straddles_gate_and_ckpt_cadence(coco_tree):  # noqa: F811
    root, base_cfg = coco_tree
    cfg_path = _rehearsal_yaml(root, base_cfg)
    from weclip_tpu.cli import train_coco
    with _argv(["train_coco", "--config", cfg_path]):
        train_coco.main()

    # checkpoint cadence: saves at every eval_iters boundary AFTER
    # ckpt_start_iter (24, 36, 48) plus the final save (48, same step dir)
    # — and crucially NOT at 12 (the 40k-gate semantics at scale)
    runs = sorted(glob.glob(str(root / "work_rehearsal" / "checkpoints" / "*")))
    assert runs, "no checkpoint run dir"
    steps = sorted(int(os.path.basename(p).split("_")[-1])
                   for p in glob.glob(os.path.join(runs[-1], "step_*")))
    assert steps == [24, 36, 48], steps

    # the run dir's latest step is the final save
    from weclip_tpu.train import checkpoint
    assert checkpoint.latest_step(runs[-1]) == 48


def test_seg_trans_gate_is_live_in_the_compiled_step(coco_tree):  # noqa: F811
    """Same state, same batch, same dropout fold — only the reference's
    iter_num accounting (the `extra` val-forward counter) moved across the
    gate: the compiled step must produce different losses, proving the
    >40k seg-trans flip is a live lax-level branch, not a trace-time
    constant."""
    import jax
    import jax.numpy as jnp

    from tests import tiny
    cfg = tiny.tiny_config(num_classes=81)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, name="coco"),
        train=dataclasses.replace(cfg.train, seg_trans_start_iter=24,
                                  max_iters=48),
        cam=dataclasses.replace(cfg.cam, seg_trans_layers=10))

    from weclip_tpu.core import precision
    from weclip_tpu.train import step as step_mod
    frozen, clip_params = tiny.tiny_frozen(cfg)
    batch = tiny.tiny_batch(cfg, clip_params, batch=2)
    from weclip_tpu.core.compaction import compact_classes
    present = np.asarray(batch.present_mask)
    ci, ca = compact_classes(present, 4)
    state, tx = step_mod.create_train_state(jax.random.PRNGKey(0), cfg)
    fn = step_mod.make_train_step(cfg, tx, policy=precision.FP32)
    key = jax.random.PRNGKey(1)

    # the step donates its input state: rebuild params fresh per call
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    def loss_at(extra):
        params = jax.tree_util.tree_map(jnp.asarray, params0)
        st = step_mod.TrainState(params, tx.init(params),
                                 jnp.asarray(10, jnp.int32))
        _, met = fn(st, frozen, batch, key, jnp.asarray(ci), jnp.asarray(ca),
                    np.asarray(extra, np.int32))
        return float(met.seg_loss)

    below = loss_at(0)              # 10+1+0 = 11 <= 24: gate closed
    below2 = loss_at(1)             # still closed: must be reproducible
    above = loss_at(1000)           # 10+1+1000 > 24: gate open
    assert below == below2, (below, below2)
    assert below != above, "seg-trans gate had no effect on the loss"
    assert np.isfinite(above) and np.isfinite(below)
