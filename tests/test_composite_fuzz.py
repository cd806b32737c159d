"""Seed/shape-FUZZED composite parity vs the executed reference forward.

The fixed-dims composites (test_composite_golden / test_composite_fulldim)
pin two geometry points (4x5 tiny grid, 20x20 full dim).  This sweep
randomizes exactly the dimensions our engine pads / masks / compacts over —
rectangular and odd grids, batch sizes 1 and 3, 1..6-class images, ignore
borders, the last VOC class id, both fusion-gate states, fp32 and the
shipped bf16 policy — so edge bugs in the padding/masking/compaction
machinery can't hide behind the goldens' fixed geometry.

Reference surface exercised per case: WeCLIP.forward train mode
(WeCLIP_model/model_attn_aff_voc.py:107-175) including the per-image label
PNG class-set read (clip_tool.py:111-124), GradCAM, the Sinkhorn walk with
scoremap2bbox masking, and PAR.  Dims stay tiny so the torch oracle runs in
seconds on CPU.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_composite_golden import (REF, build_tiny_pair, cpu_cuda,  # noqa: F401
                                         present_from_label)

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

NUM_FG = 20


def _fuzz_labels(rng, batch, gh, gw, max_cls, with_ignore):
    """Random rectangle labels: per image 1..max_cls fg classes (ids drawn
    from the full 1..20 VOC range incl. the last), optional 255 border."""
    h, w = gh * 16, gw * 16
    labels = []
    for i in range(batch):
        lab = np.zeros((h, w), np.uint8)
        k = int(rng.integers(1, max_cls + 1))
        ids = rng.choice(np.arange(1, NUM_FG + 1), size=k, replace=False)
        for cid in ids:
            y0 = int(rng.integers(0, max(1, h - 4)))
            x0 = int(rng.integers(0, max(1, w - 4)))
            y1 = int(rng.integers(y0 + 3, h + 1))
            x1 = int(rng.integers(x0 + 3, w + 1))
            lab[y0:y1, x0:x1] = cid
        if with_ignore:
            lab[: int(rng.integers(1, 5)), :] = 255
        # the reference crashes on a fg-free image (empty cam list) and VOC
        # train never produces one; guarantee at least one fg pixel
        if not ((lab >= 1) & (lab <= NUM_FG)).any():
            lab[h // 2, w // 2] = ids[0]
        labels.append((f"z{i}", lab))
    return labels


CASES = [
    # (seed, batch, gh, gw, max_cls, ignore, gated, policy)
    (11, 1, 3, 7, 1, False, False, "fp32"),   # batch 1, wide grid, 1 class
    (23, 3, 6, 2, 6, True, True, "fp32"),     # batch 3, tall grid, dense
    (37, 2, 5, 5, 4, True, False, "bf16"),    # shipped policy, square odd
    (53, 2, 2, 6, 3, False, True, "fp32"),    # minimal gh, gated
]


@pytest.mark.parametrize(
    "seed,batch,gh,gw,max_cls,ignore,gated,policy_name", CASES,
    ids=[f"s{c[0]}_b{c[1]}_{c[2]}x{c[3]}_{c[7]}" for c in CASES])
def test_fuzzed_composite(cpu_cuda, tmp_path, seed, batch, gh, gw, max_cls,
                          ignore, gated, policy_name):
    torch = cpu_cuda
    from weclip_tpu.core import precision
    from weclip_tpu.core.compaction import compact_classes
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit

    rng = np.random.default_rng(seed)
    labels = _fuzz_labels(rng, batch, gh, gw, max_cls, ignore)
    iter_num = 20000 if gated else 0
    (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
        torch, tmp_path, iter_num=iter_num, labels=labels)

    seg_t, cam_labels_t, attn_pred_t = m(torch.from_numpy(np.asarray(imgs)),
                                         names, mode="train")

    mc = max(int(present.sum(1).max()), 1)
    ci, ca = compact_classes(present, mc)
    pe = vit.build_pos_emb(frozen["visual"], gh, gw)[None]
    b = batch
    batch_in = weclip.Batch(
        img=jnp.asarray(np.asarray(imgs)), pos_emb=pe,
        valid=jnp.ones((b, gh * gw + 1), bool),
        gh=jnp.full((b,), gh, jnp.int32), gw=jnp.full((b,), gw, jnp.int32),
        present_mask=jnp.asarray(present))
    policy = (precision.make_policy("bfloat16") if policy_name == "bf16"
              else precision.FP32)
    out = weclip.forward_train(
        params, frozen, batch_in, cfg,
        require_seg_trans=jnp.bool_(gated), dropout_rng=None, policy=policy,
        cls_idx=jnp.asarray(ci), cls_active=jnp.asarray(ca))

    k = cfg.dataset.num_classes
    seg_ours = np.asarray(out.seg, np.float32).reshape(
        b, gh, gw, k).transpose(0, 3, 1, 2)
    seg_ref = seg_t.detach().numpy()
    if policy_name == "fp32":
        np.testing.assert_allclose(seg_ours, seg_ref, rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out.attn_pred),
                                   attn_pred_t.detach().numpy(),
                                   rtol=5e-2, atol=5e-3)
        label_floor = 0.98
    else:
        agree_seg = float((seg_ours.argmax(1) == seg_ref.argmax(1)).mean())
        assert agree_seg >= 0.995, agree_seg
        label_floor = 0.985

    ours_labels = np.asarray(out.cam_labels)
    ref_labels = cam_labels_t.detach().numpy()
    for i in range(b):
        assert set(np.unique(ref_labels[i])) <= set(
            [0] + list(ci[i][ca[i]] + 1)), np.unique(ref_labels[i])
    agree = float((ours_labels == ref_labels).mean())
    assert agree >= label_floor, f"pseudo-label agreement {agree:.4f}"
