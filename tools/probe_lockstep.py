"""Scout for the multi-step training lockstep golden (VERDICT r2 #3):
run N reference optimizer steps (dist_clip_voc.py:238-267) vs our
make_train_step on identical tiny weights/batches, print per-step losses
and final param deltas.  Run on CPU:
    python -m tools.probe_lockstep                      # the committed 8-step
    python -m tools.probe_lockstep --steps 30           # long-horizon drift
    python -m tools.probe_lockstep --policy bfloat16    # production policy
"""
import dataclasses
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, ".")


def square_labels():
    lab0 = np.zeros((64, 64), np.uint8)
    lab0[10:30, 10:40] = 3
    lab0[40:60, 45:60] = 7
    lab1 = np.zeros((64, 64), np.uint8)
    lab1[5:40, 5:35] = 13
    lab1[30:60, 40:62] = 20
    return [("s0", lab0), ("s1", lab1)]


def ref_get_seg_loss(torch, F, pred, label, ignore_index=255):
    # dist_clip_voc.py:105-113
    bg_label = label.clone()
    bg_label[label != 0] = ignore_index
    bg_loss = F.cross_entropy(pred, bg_label.long(), ignore_index=ignore_index)
    fg_label = label.clone()
    fg_label[label == 0] = ignore_index
    fg_loss = F.cross_entropy(pred, fg_label.long(), ignore_index=ignore_index)
    return (bg_loss + fg_loss) * 0.5


def main(n_steps=8, gate_base=14998, policy_name="fp32"):
    from tests.test_composite_golden import (_install_reference, build_tiny_pair,
                                             present_from_label)
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
    from weclip_tpu.train import step as step_mod
    from weclip_tpu.train.optimizer import make_optimizer

    labels = square_labels()
    with tempfile.TemporaryDirectory() as td:
        (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
            torch, td, iter_num=gate_base, labels=labels)
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, crop_size=64))

        # ---- torch side: dist_clip_voc.py train loop ---------------------
        # utils/camutils.py imports utils/dcrf.py which needs the pydensecrf
        # C++ extension at import time; only cams_to_affinity_label is used
        # here, so stub the extension modules.
        import types
        for name in ("pydensecrf", "pydensecrf.densecrf", "pydensecrf.utils"):
            if name not in sys.modules:
                stub = types.ModuleType(name)
                stub.unary_from_softmax = stub.unary_from_labels = None
                sys.modules[name] = stub
        sys.path.insert(0, "/root/reference")
        from utils.optimizer import PolyWarmupAdamW
        from utils.losses import get_aff_loss
        from utils.camutils import cams_to_affinity_label

        m.train()
        m.encoder.eval()
        for mod in m.modules():
            if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
                mod.p = 0.0
        pg = m.get_param_groups()
        lr = cfg.optimizer.learning_rate
        wd = cfg.optimizer.weight_decay
        opt = PolyWarmupAdamW(
            params=[{"params": pg[0], "lr": lr, "weight_decay": wd},
                    {"params": pg[1], "lr": 0.0, "weight_decay": 0.0},
                    {"params": pg[2], "lr": lr * 10, "weight_decay": wd},
                    {"params": pg[3], "lr": lr * 10, "weight_decay": wd}],
            lr=lr, weight_decay=wd, betas=cfg.optimizer.betas,
            warmup_iter=cfg.optimizer.warmup_iter,
            max_iter=cfg.train.max_iters,
            warmup_ratio=cfg.optimizer.warmup_ratio,
            power=cfg.optimizer.power)

        # radius mask at the 4x4 grid (dist_clip_voc.py:116-133 via our port)
        from weclip_tpu.train import losses as our_losses
        g = 4
        rmask_np = our_losses.radius_mask(g, g, cfg.train.radius)
        rmask_t = torch.from_numpy(np.asarray(rmask_np, np.float32))

        inputs = torch.from_numpy(imgs)
        ref_losses = []
        for it in range(n_steps):
            segs, cam, attn_pred = m(inputs, names, mode="train")
            pseudo = cam
            segs_up = F.interpolate(segs, size=pseudo.shape[1:],
                                    mode="bilinear", align_corners=False)
            aff_label = cams_to_affinity_label(cam.clone(), mask=rmask_t,
                                               ignore_index=255)
            attn_loss, _, _ = get_aff_loss(attn_pred, aff_label)
            seg_loss = ref_get_seg_loss(torch, F, segs_up, pseudo)
            loss = seg_loss + 0.1 * attn_loss
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append((float(seg_loss), float(attn_loss)))

        # ---- our side ----------------------------------------------------
        ci, ca = compact_classes(present, 2)
        pe = vit.build_pos_emb(frozen["visual"], g, g)[None]
        batch = weclip.Batch(
            img=jnp.asarray(imgs), pos_emb=pe,
            valid=jnp.ones((2, g * g + 1), bool),
            gh=jnp.full((2,), g, jnp.int32), gw=jnp.full((2,), g, jnp.int32),
            present_mask=jnp.asarray(present))
        tx = make_optimizer(cfg.optimizer, cfg.train.max_iters)
        state = step_mod.TrainState(params, tx.init(params),
                                    jnp.zeros((), jnp.int32))
        policy = (precision.FP32 if policy_name == "fp32"
                  else precision.make_policy(policy_name))
        fn = step_mod.make_train_step(cfg, tx, policy=policy)
        our_losses_l = []
        for it in range(n_steps):
            state, met = fn(state, frozen, batch, None,
                            jnp.asarray(ci), jnp.asarray(ca),
                            extra_iter_num=jnp.asarray(gate_base, jnp.int32))
            our_losses_l.append((float(met.seg_loss), float(met.attn_loss)))

        for it, (r, o) in enumerate(zip(ref_losses, our_losses_l)):
            gate = "GATED" if (gate_base + it + 1) > 15000 else "plain"
            print(f"step {it} [{gate}] ref seg={r[0]:.5f} attn={r[1]:.5f} | "
                  f"ours seg={o[0]:.5f} attn={o[1]:.5f} | "
                  f"d_seg={abs(r[0]-o[0]):.2e} d_attn={abs(r[1]-o[1]):.2e}")

        # final param comparison (decoder+fuse)
        from tests.test_composite_golden import _head_params_from_torch
        ref_tree = _head_params_from_torch(m.decoder_fts_fuse, m.decoder)
        flat_r = jax.tree_util.tree_leaves(ref_tree)
        flat_o = jax.tree_util.tree_leaves(state.params)
        max_d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    for a, b in zip(flat_r, flat_o))
        max_rel = max(
            float(np.max(np.abs(np.asarray(a) - np.asarray(b))
                         / (np.abs(np.asarray(a)) + 1e-6)))
            for a, b in zip(flat_r, flat_o))
        print(f"final params: max_abs_delta={max_d:.3e} max_rel={max_rel:.3e}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8,
                    help="lockstep horizon (8 = the committed test; 30 = "
                         "the long-horizon drift curve recorded in PARITY)")
    ap.add_argument("--gate_base", type=int, default=14998)
    ap.add_argument("--policy", default="fp32",
                    help="our side's precision policy: fp32 (oracle-exact "
                         "comparison) or bfloat16 (production policy vs the "
                         "fp32 reference — measures combined drift)")
    a = ap.parse_args()
    main(n_steps=a.steps, gate_base=a.gate_base, policy_name=a.policy)
