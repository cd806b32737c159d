"""Multi-step training-dynamics lockstep golden (VERDICT r2 #3).

Runs 8 coupled optimizer steps of the ACTUAL reference trainer loop
(scripts/dist_clip_voc.py:238-267: forward -> pseudo labels -> affinity
label -> fg/bg-split CE + 0.1*aff loss -> PolyWarmupAdamW step) against our
``make_train_step`` on identical tiny weights and a fixed batch, crossing
the iter>15000 seg-trans gate (model_attn_aff_voc.py:146) mid-run via the
iter_num offset — the compounding-drift scenario SURVEY hard-part #5 names.
The COCO variant runs the same lockstep through model_attn_aff_coco +
dist_clip_coco.py's identical loss loop (:247-266), crossing ITS 40k gate
(model_attn_aff_coco.py:141) with the 81-class tables, 0.7 bbox threshold
and 10-layer seg-trans window in play.

Both sides train deterministically (dropout off; the reference trains with
dropout active, an RNG stream no cross-framework test can align).

Measured drift (tools/probe_lockstep.py, CPU fp32): per-step
|d_seg| <= 4e-4, |d_attn| <= 2e-6, final-param max-abs delta 1.0e-3 at the
reference warmup lr schedule.  Thresholds below are ~10x those.
"""

import dataclasses
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_composite_golden import (REF, build_tiny_pair, cpu_cuda)

import os
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

N_STEPS = 8
GATE_BASE = 14998          # gate (iter > 15000) fires at step 2 of 8


def square_labels():
    lab0 = np.zeros((64, 64), np.uint8)
    lab0[10:30, 10:40] = 3
    lab0[40:60, 45:60] = 7
    lab1 = np.zeros((64, 64), np.uint8)
    lab1[5:40, 5:35] = 13
    lab1[30:60, 40:62] = 20
    return [("s0", lab0), ("s1", lab1)]


def _stub_pydensecrf():
    """utils/camutils.py imports utils/dcrf.py -> pydensecrf (C++ ext) at
    module level; only cams_to_affinity_label is needed here."""
    for name in ("pydensecrf", "pydensecrf.densecrf", "pydensecrf.utils"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.unary_from_softmax = stub.unary_from_labels = None
            sys.modules[name] = stub


def ref_get_seg_loss(torch, F, pred, label, ignore_index=255):
    # dist_clip_voc.py:105-113
    bg_label = label.clone()
    bg_label[label != 0] = ignore_index
    bg_loss = F.cross_entropy(pred, bg_label.long(), ignore_index=ignore_index)
    fg_label = label.clone()
    fg_label[label == 0] = ignore_index
    fg_loss = F.cross_entropy(pred, fg_label.long(), ignore_index=ignore_index)
    return (bg_loss + fg_loss) * 0.5


@pytest.mark.parametrize("dataset", ["voc", "coco"])
def test_lockstep_training_dynamics(cpu_cuda, tmp_path, dataset):
    torch = cpu_cuda
    import torch.nn.functional as F

    labels = square_labels()
    gate_base = GATE_BASE if dataset == "voc" else 39998   # coco gate: >40000
    (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
        torch, tmp_path, iter_num=gate_base, labels=labels, dataset=dataset)
    cfg = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, crop_size=64))

    # ---- reference side: dist_clip_voc.py train loop ---------------------
    _stub_pydensecrf()
    from utils.optimizer import PolyWarmupAdamW
    from utils.losses import get_aff_loss
    from utils.camutils import cams_to_affinity_label
    from weclip_tpu.train import losses as our_losses

    m.train()
    m.encoder.eval()
    for mod in m.modules():
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0
    pg = m.get_param_groups()
    lr, wd = cfg.optimizer.learning_rate, cfg.optimizer.weight_decay
    opt = PolyWarmupAdamW(
        params=[{"params": pg[0], "lr": lr, "weight_decay": wd},
                {"params": pg[1], "lr": 0.0, "weight_decay": 0.0},
                {"params": pg[2], "lr": lr * 10, "weight_decay": wd},
                {"params": pg[3], "lr": lr * 10, "weight_decay": wd}],
        lr=lr, weight_decay=wd, betas=cfg.optimizer.betas,
        warmup_iter=cfg.optimizer.warmup_iter, max_iter=cfg.train.max_iters,
        warmup_ratio=cfg.optimizer.warmup_ratio, power=cfg.optimizer.power)

    g = 64 // cfg.clip.patch_size
    rmask_t = torch.from_numpy(
        np.asarray(our_losses.radius_mask(g, g, cfg.train.radius), np.float32))

    inputs = torch.from_numpy(imgs)
    ref_hist = []
    for _ in range(N_STEPS):
        segs, cam, attn_pred = m(inputs, names, mode="train")
        segs_up = F.interpolate(segs, size=cam.shape[1:], mode="bilinear",
                                align_corners=False)
        aff_label = cams_to_affinity_label(cam.clone(), mask=rmask_t,
                                           ignore_index=255)
        attn_loss, _, _ = get_aff_loss(attn_pred, aff_label)
        seg_loss = ref_get_seg_loss(torch, F, segs_up, cam)
        loss = seg_loss + 0.1 * attn_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_hist.append((float(seg_loss), float(attn_loss)))

    # ---- our side --------------------------------------------------------
    from weclip_tpu.core import precision
    from weclip_tpu.core.compaction import compact_classes
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    from weclip_tpu.train import step as step_mod
    from weclip_tpu.train.optimizer import make_optimizer

    ci, ca = compact_classes(present, 2)
    pe = vit.build_pos_emb(frozen["visual"], g, g)[None]
    batch = weclip.Batch(
        img=jnp.asarray(imgs), pos_emb=pe,
        valid=jnp.ones((2, g * g + 1), bool),
        gh=jnp.full((2,), g, jnp.int32), gw=jnp.full((2,), g, jnp.int32),
        present_mask=jnp.asarray(present))
    tx = make_optimizer(cfg.optimizer, cfg.train.max_iters)
    # the train step donates its input state — snapshot init params first
    params0 = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), params)
    state = step_mod.TrainState(params, tx.init(params),
                                jnp.zeros((), jnp.int32))
    fn = step_mod.make_train_step(cfg, tx, policy=precision.FP32)
    our_hist = []
    for _ in range(N_STEPS):
        state, met = fn(state, frozen, batch, None,
                        jnp.asarray(ci), jnp.asarray(ca),
                        extra_iter_num=jnp.asarray(gate_base, jnp.int32))
        our_hist.append((float(met.seg_loss), float(met.attn_loss)))

    # ---- per-step losses track through the gate crossing -----------------
    for it, ((rs, ra), (os_, oa)) in enumerate(zip(ref_hist, our_hist)):
        assert abs(rs - os_) < 5e-3, (it, rs, os_)
        assert abs(ra - oa) < 5e-4, (it, ra, oa)
    # the gate actually fired and the coupled system actually moved
    assert ref_hist[-1][0] < ref_hist[0][0] - 0.1

    # ---- final params ----------------------------------------------------
    from tests.test_composite_golden import _head_params_from_torch
    ref_tree = _head_params_from_torch(m.decoder_fts_fuse, m.decoder)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        ref_tree, state.params)
    max_d = max(jax.tree_util.tree_leaves(deltas))
    assert max_d < 5e-3, max_d
    # ...and are not trivially unchanged (optimizer really stepped)
    init_delta = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree_util.tree_leaves(params0),
                        jax.tree_util.tree_leaves(state.params)))
    assert init_delta > 0.0
