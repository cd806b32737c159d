"""Isolate the step-0 seg-loss delta seen by tools/probe_lockstep.py."""
import dataclasses
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, ".")
from tools.probe_lockstep import ref_get_seg_loss, square_labels


def main():
    from tests.test_composite_golden import _install_reference, build_tiny_pair
    _install_reference()
    import torch
    import torch.nn.functional as F
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)

    import jax.numpy as jnp
    from weclip_tpu.core import precision
    from weclip_tpu.core.compaction import compact_classes
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    from weclip_tpu.ops.resize import resize_bilinear
    from weclip_tpu.train import losses as our_losses

    labels = square_labels()
    with tempfile.TemporaryDirectory() as td:
        (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
            torch, td, iter_num=0, labels=labels)
        m.train()
        m.encoder.eval()
        for mod in m.modules():
            if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
                mod.p = 0.0
        inputs = torch.from_numpy(imgs)
        segs, cam, attn_pred = m(inputs, names, mode="train")
        segs_up = F.interpolate(segs, size=cam.shape[1:], mode="bilinear",
                                align_corners=False)

        ci, ca = compact_classes(present, 2)
        g = 4
        pe = vit.build_pos_emb(frozen["visual"], g, g)[None]
        batch = weclip.Batch(
            img=jnp.asarray(imgs), pos_emb=pe,
            valid=jnp.ones((2, g * g + 1), bool),
            gh=jnp.full((2,), g, jnp.int32), gw=jnp.full((2,), g, jnp.int32),
            present_mask=jnp.asarray(present))
        out = weclip.forward_train(params, frozen, batch, cfg,
                                   require_seg_trans=jnp.bool_(False),
                                   dropout_rng=None, policy=precision.FP32,
                                   cls_idx=jnp.asarray(ci),
                                   cls_active=jnp.asarray(ca))
        seg_grid = np.asarray(out.seg).reshape(2, g, g, 21).transpose(0, 3, 1, 2)
        seg_hw = np.asarray(resize_bilinear(jnp.asarray(seg_grid), 64, 64))
        pseudo = np.asarray(out.cam_labels)

        cam_np = cam.detach().numpy()
        segs_up_np = segs_up.detach().numpy()
        print("pseudo agreement:", (pseudo == cam_np).mean())
        print("pseudo uniques ref:", [np.unique(cam_np[i]).tolist() for i in range(2)])
        print("pseudo uniques ours:", [np.unique(pseudo[i]).tolist() for i in range(2)])
        print("seg_hw maxdiff:", np.abs(seg_hw - segs_up_np).max())

        def rl(p, l):
            return float(ref_get_seg_loss(torch, F, torch.from_numpy(p),
                                          torch.from_numpy(l.astype(np.int64))))
        print("ref(ref seg, ref cam) =", rl(segs_up_np, cam_np))
        print("ref(our seg, our cam) =", rl(seg_hw, pseudo))
        print("ref(ref seg, our cam) =", rl(segs_up_np, pseudo))
        print("ref(our seg, ref cam) =", rl(seg_hw, cam_np))
        ours = float(our_losses.seg_loss(jnp.asarray(seg_hw),
                                         jnp.asarray(pseudo)))
        print("ours(our seg, our cam) =", ours)


def main2():
    """Same pair, but through make_train_step — isolates step.py."""
    from tests.test_composite_golden import _install_reference, build_tiny_pair
    _install_reference()
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)
    import jax.numpy as jnp
    from weclip_tpu.core import precision
    from weclip_tpu.core.compaction import compact_classes
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    from weclip_tpu.train import step as step_mod
    from weclip_tpu.train.optimizer import make_optimizer

    labels = square_labels()
    with tempfile.TemporaryDirectory() as td:
        (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
            torch, td, iter_num=0, labels=labels)
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, crop_size=64))
        ci, ca = compact_classes(present, 2)
        g = 4
        pe = vit.build_pos_emb(frozen["visual"], g, g)[None]
        batch = weclip.Batch(
            img=jnp.asarray(imgs), pos_emb=pe,
            valid=jnp.ones((2, g * g + 1), bool),
            gh=jnp.full((2,), g, jnp.int32), gw=jnp.full((2,), g, jnp.int32),
            present_mask=jnp.asarray(present))
        tx = make_optimizer(cfg.optimizer, cfg.train.max_iters)
        state = step_mod.TrainState(params, tx.init(params),
                                    jnp.zeros((), jnp.int32))
        fn = step_mod.make_train_step(cfg, tx, policy=precision.FP32)
        state, met = fn(state, frozen, batch, None,
                        jnp.asarray(ci), jnp.asarray(ca),
                        extra_iter_num=jnp.asarray(14998, jnp.int32))
        print("train_step: seg", float(met.seg_loss),
              "attn", float(met.attn_loss))


if __name__ == "__main__":
    import sys as _s
    main2() if "--step" in _s.argv else main()
