"""XLA-module timeline accounting for the benchmark loop (VERDICT r4 #1).

framework_op_stats sums device op *self*-times (135.2 ms/round in the r4
trace), but the bench walls 139.5 ms/round — and a sum of self-times is not
a wall measurement: it excludes inter-op scheduling inside a module, gaps
*between* module executions, and any per-window fixed cost (the final hist
readback round-trip).  This tool extracts the XLA-module execution events
from an xplane.pb (the "XLA Modules" device line, exported through xprof's
trace_viewer converter) and prints, per module execution: start, duration,
and the idle gap since the previous module — i.e. exactly the wall
decomposition the op stats cannot give.

    python -m tools.timeline_eval /tmp/xprof_r5   # dir passed to profile_eval

Reads the newest xplane.pb under <dir>/plugins/profile/*/.
"""
from __future__ import annotations

import glob
import json
import sys


def module_events(path: str):
    """[(name, ts_us, dur_us)] on the device 'XLA Modules' line, sorted."""
    from xprof.convert import raw_to_tool_data as r
    data, _ = r.xspace_to_tool_data([path], "trace_viewer@", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    evs = d["traceEvents"]
    # find the device pid (process named like 'TPU ...' / remapped id) and
    # its thread whose events are jit_<fn>(fingerprint) module executions:
    # module names start with 'jit_' and the thread carries few, long events
    names = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    mods = [e for e in evs
            if e.get("ph") == "X"
            and "Modules" in names.get((e["pid"], e.get("tid")), "")]
    if not mods:       # fallback: events shaped like jit_*(digits)
        mods = [e for e in evs if e.get("ph") == "X"
                and e["name"].startswith("jit_") and e["name"].endswith(")")]
    mods.sort(key=lambda e: e["ts"])
    return [(e["name"], float(e["ts"]), float(e["dur"])) for e in mods]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_eval"
    paths = sorted(glob.glob(root + "/plugins/profile/*/*.xplane.pb"))
    if not paths:
        print(f"no xplane.pb under {root}/plugins/profile/ "
              f"(run tools/profile_eval.py --out {root} first)")
        return
    path = paths[-1]
    print("xplane:", path)
    mods = module_events(path)
    if not mods:
        print("no module events found"); return
    prev_end = None
    tot_dur = tot_gap = 0.0
    print(f"{'module':44s} {'start ms':>10s} {'dur ms':>9s} {'gap ms':>8s}")
    for name, ts, dur in mods:
        gap = (ts - prev_end) / 1e3 if prev_end is not None else 0.0
        print(f"{name[:44]:44s} {ts/1e3:10.2f} {dur/1e3:9.2f} {gap:8.3f}")
        tot_dur += dur / 1e3
        if prev_end is not None:
            tot_gap += gap
        prev_end = ts + dur
    span = (mods[-1][1] + mods[-1][2] - mods[0][1]) / 1e3
    n = len(mods)
    print(f"\n{n} module executions: span {span:.1f} ms = "
          f"exec {tot_dur:.1f} + inter-module idle {tot_gap:.1f} ms")
    print(f"per execution: {tot_dur/n:.2f} ms exec + "
          f"{tot_gap/max(n-1,1):.3f} ms gap")


if __name__ == "__main__":
    main()
