"""Capture a jax.profiler trace of the msc-flip eval round on the real TPU
and print xprof framework_op_stats (the only trustworthy per-op timing on
this box — see PARITY.md measurement rules).

    python -m tools.profile_eval [--rounds 3] [--out /tmp/xprof_eval]
"""
import argparse
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/xprof_eval")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--comer", action="store_true")
    ap.add_argument("--coco", action="store_true",
                    help="COCO config: 81 classes, seg-only val round at "
                         "640px (the reference's val short-circuit)")
    ap.add_argument("--train", action="store_true",
                    help="trace the train step instead of the eval round "
                         "(composes with --coco/--comer)")
    args = ap.parse_args()

    import jax
    from weclip_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache()
    from weclip_tpu.core import precision
    from weclip_tpu.core.config import Config
    from weclip_tpu.evalx import metrics
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    from bench import build_state, make_examples

    cfg = Config()
    max_ori, with_cam = 512, True
    if args.coco:
        from weclip_tpu.core.config import coco_config
        cfg = coco_config()
        max_ori, with_cam = 640, False
    if args.comer:
        import dataclasses
        from weclip_tpu.core.config import ComerConfig
        cfg = dataclasses.replace(cfg, comer=ComerConfig(enabled=True))
    if args.train:
        return trace_train(cfg, args)
    rng = np.random.default_rng(0)
    policy = precision.make_policy("bfloat16")
    params, frozen, clip_params = build_state(cfg, rng)
    batch = cfg.eval.batch_images
    prep = make_prep(cfg, max_ori=max_ori, resize_long=cfg.eval.resize_long)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=policy, with_cam=with_cam, msc=True)
    built = ev.build_batch(make_examples(cfg, rng, batch))
    sb1, sb2, sizes, labels, presents, ci, ca = built
    k = cfg.dataset.num_classes
    hists = (metrics.zero_hist(k),) * 3

    round_fn = ev.round_for(ci.shape[1])

    def one_round(hists):
        ps, pm, hists = round_fn(params, frozen, sb1, sb2, sizes, labels,
                                 presents, ci, ca, hists)
        return ps, hists

    ps, hists = one_round(hists)          # compile
    np.asarray(hists[0])
    import time
    t0 = time.perf_counter()
    ps, hists = one_round(hists)
    np.asarray(hists[0]); np.asarray(ps)
    print(f"untraced round: {(time.perf_counter()-t0)*1000:.1f} ms",
          flush=True)

    with jax.profiler.trace(args.out):
        for _ in range(args.rounds):
            ps, hists = one_round(hists)
        np.asarray(hists[0])
        np.asarray(ps)

    path = sorted(glob.glob(args.out + "/plugins/profile/*/*.xplane.pb"))[-1]
    print("xplane:", path, flush=True)
    print_op_stats(path, args.top, args.rounds)


def trace_train(cfg, args):
    """Trace `args.rounds` x 6 train steps (bench.build_train_fixture — the
    SAME fixture the benchmark times, so trace == bench computation)."""
    import glob as _glob
    import time

    import jax
    from weclip_tpu.core import precision as prec
    from bench import build_train_fixture

    policy = prec.make_policy("bfloat16")
    fn, state, frozen, batch, key, ci, ca = build_train_fixture(cfg, policy)
    t0 = time.perf_counter()
    for _ in range(6):
        state, met = fn(state, frozen, batch, key, ci, ca)
    np.asarray(met.loss)
    print(f"untraced: {(time.perf_counter()-t0)/6*1000:.2f} ms/step",
          flush=True)
    steps = args.rounds * 6
    with jax.profiler.trace(args.out):
        for _ in range(steps):
            state, met = fn(state, frozen, batch, key, ci, ca)
        np.asarray(met.loss)
    path = sorted(_glob.glob(args.out + "/plugins/profile/*/*.xplane.pb"))[-1]
    print("xplane:", path, flush=True)
    print_op_stats(path, args.top, steps)


def print_op_stats(path, top=45, rounds=1):
    """Parse an xplane.pb via the xprof package (tensorboard_plugin_profile's
    pywrap is broken in this image) and print device ops by self-time."""
    import json
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data([path],
                                                   "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)[0]
    cols = [c["label"] for c in d["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
    rows = [r for r in rows if r[cols.index("Host/device")] == "Device"]
    tc = cols.index("Total self-time (us)")
    oc = cols.index("Operation Name")
    yc = cols.index("Operation Type")
    rows.sort(key=lambda r: -(r[tc] or 0))
    tot = sum(r[tc] or 0 for r in rows)
    print(f"total device self-time: {tot/1e3:.1f} ms over {rounds} rounds "
          f"({tot/1e3/max(rounds,1):.1f} ms/round)")
    for r in rows[:top]:
        print(f"{(r[tc] or 0)/1e3/max(rounds,1):8.2f} ms/round  "
              f"{str(r[yc])[:20]:20s} {str(r[oc])[:70]}")


if __name__ == "__main__":
    main()
