"""Measure bf16-policy agreement vs the reference forward on the composite
golden setup (VERDICT r2 #1 scouting).  Run:
    python -m tools.probe_bf16_parity
"""
import os
import sys
import tempfile

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    import jax
    jax.config.update("jax_platforms", "cpu")   # env var alone is NOT enough

import numpy as np

sys.path.insert(0, ".")


def main():
    from tests.test_composite_golden import (_install_reference, _stub_mmcv,
                                             build_tiny_pair, _our_forward)
    _install_reference()
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)

    import jax.numpy as jnp
    from weclip_tpu.core import precision

    for gated in (False, True):
        with tempfile.TemporaryDirectory() as td:
            iter_num = 20000 if gated else 0
            (m, names, params, frozen, cfg, imgs,
             present) = build_tiny_pair(torch, td, iter_num=iter_num)
            seg_t, cam_t, attn_t = m(torch.from_numpy(imgs), names,
                                     mode="train")
            ref_labels = cam_t.detach().numpy()
            seg_ref = seg_t.detach().numpy()
            for pol_name, pol in (("fp32", precision.FP32),
                                  ("bf16", precision.make_policy("bfloat16"))):
                out, ci = _our_forward(params, frozen, cfg, imgs, present,
                                       require_seg_trans=gated, policy=pol)
                seg_ours = np.asarray(out.seg, np.float32).reshape(
                    2, 4, 5, 21).transpose(0, 3, 1, 2)
                rel = np.abs(seg_ours - seg_ref) / (np.abs(seg_ref) + 1e-3)
                agree = float((np.asarray(out.cam_labels) == ref_labels).mean())
                print(f"gated={gated} {pol_name}: label_agree={agree:.4f} "
                      f"seg_max_rel={rel.max():.4f} "
                      f"seg_argmax_agree="
                      f"{(seg_ours.argmax(1) == seg_ref.argmax(1)).mean():.4f}")


if __name__ == "__main__":
    main()
