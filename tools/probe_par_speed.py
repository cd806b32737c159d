"""Time the fused PAR kernel at the eval shape via a chained-dependency loop.

Methodology (PARITY.md "PAR bf16 negative result"): each call's mask input is
the previous call's output, so the N calls cannot be overlapped or elided;
one host read at the end forces the chain.  Reports ms/call at the eval
shape (8, 5, 512, 512) x 20 iters and the train shape (4, 5, 320, 320).

Usage: python tools/probe_par_speed.py [--calls 10] [--windows 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    import jax.numpy as jnp
    from weclip_tpu.core.config import ParConfig
    from weclip_tpu.core.runtime import enable_compilation_cache
    from weclip_tpu.refine.pallas_par import par_refine_pallas

    enable_compilation_cache()
    cfg = ParConfig()                     # (1,2,4,8,12,24) x 20 iters
    rng = np.random.default_rng(0)

    for name, (b, c, h, w) in (("eval", (8, 5, 512, 512)),
                               ("train", (4, 5, 320, 320))):
        imgs = jnp.asarray(rng.standard_normal((b, 3, h, w)), jnp.float32)
        masks = jnp.asarray(rng.uniform(0, 1, (b, c, h, w)), jnp.float32)
        out = par_refine_pallas(imgs, masks, cfg)
        np.asarray(out[0, 0, 0, :3])      # compile + barrier (tunnel-safe)
        best = float("inf")
        for _ in range(args.windows):
            t0 = time.perf_counter()
            o = masks
            for _ in range(args.calls):
                o = par_refine_pallas(imgs, o, cfg)
            np.asarray(o[0, 0, 0, :3])
            best = min(best, time.perf_counter() - t0)
        print(f"{name} ({b},{c},{h},{w}) x{cfg.num_iter} iters: "
              f"{best / args.calls * 1000:.1f} ms/call")


if __name__ == "__main__":
    main()
