"""Test-suite duration budget gate (VERDICT r4 #8).

The suite keeps growing (202 tests at r4 close, more now); the smoke tier
only stays useful if it stays fast, and the full tier only stays *run* if
its cost is visible.  This tool times the smoke tier against a budget and
prints the slowest tests, so suite growth is a deliberate decision with a
number attached rather than a slow drift:

    python -m tools.suite_budget [--budget 180] [--full]

Exits 1 if the smoke tier exceeds the budget (default 180 s wall on this
1-vCPU host — the r4/r5 smoke tier runs 70-110 s, so the budget trips on
a ~2x regression, not on host noise).  --full times the whole suite too
(no budget — its number is recorded, not gated) and prints its 15 slowest
tests for the round-close durations table.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time


def run_tier(args_list):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "pytest", *args_list],
                       capture_output=True, text=True)
    wall = time.time() - t0
    tail = r.stdout.strip().splitlines()
    durations = [l for l in tail if "::" in l and (" call " in l or "s call" in l)]
    summary = tail[-1] if tail else ""
    return wall, r.returncode, durations, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=180.0,
                    help="smoke-tier wall budget, seconds")
    ap.add_argument("--full", action="store_true",
                    help="also time the full suite (reported, not gated)")
    args = ap.parse_args()

    wall, rc, durs, summary = run_tier(
        ["tests/", "-m", "smoke", "-q", "--durations=10"])
    ok = rc == 0 and wall <= args.budget
    out = {"smoke_wall_s": round(wall, 1), "budget_s": args.budget,
           "smoke_rc": rc, "ok": ok, "smoke_summary": summary}
    for d in durs:
        print(d)
    if args.full:
        fwall, frc, fdurs, fsummary = run_tier(
            ["tests/", "-q", "--durations=15"])
        out.update({"full_wall_s": round(fwall, 1), "full_rc": frc,
                    "full_summary": fsummary})
        for d in fdurs:
            print(d)
    print(json.dumps(out))
    if not ok:
        print(f"SMOKE TIER OVER BUDGET: {wall:.0f}s > {args.budget:.0f}s "
              f"(or failed, rc={rc})", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
