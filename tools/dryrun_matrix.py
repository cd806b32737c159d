"""Multichip dryrun matrix (VERDICT r3 #6).

Runs ``__graft_entry__.dryrun_multichip(n)`` for a matrix of device
counts — even counts exercise the (data, model=2) tensor-parallel split,
odd counts the mp=1 fallback — each in a fresh subprocess with an
``n``-device fake CPU mesh, and records the outcomes as one JSON
artifact.  Usage:

    python tools/dryrun_matrix.py [--counts 2,3,4,8] [--out MULTICHIP_MATRIX.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(n: int, timeout_s: int = 900) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   env.get("XLA_FLAGS", "")).strip()
    env["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}").strip()
    code = f"import __graft_entry__ as g; g.dryrun_multichip({n})"
    t0 = time.monotonic()
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                           capture_output=True, text=True, timeout=timeout_s)
        tail = (r.stdout + r.stderr).strip().splitlines()[-1:]
        return {"n_devices": n, "rc": r.returncode, "ok": r.returncode == 0,
                "wall_s": round(time.monotonic() - t0, 1),
                "tail": tail[0] if tail else ""}
    except subprocess.TimeoutExpired:
        return {"n_devices": n, "rc": -1, "ok": False,
                "wall_s": round(time.monotonic() - t0, 1),
                "tail": f"timeout after {timeout_s}s"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="2,3,4,8")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "MULTICHIP_MATRIX.json"))
    args = ap.parse_args()
    rows = []
    for n in [int(c) for c in args.counts.split(",")]:
        row = run_one(n)
        rows.append(row)
        print(json.dumps(row), flush=True)
    ok = all(r["ok"] for r in rows)
    with open(args.out, "w") as f:
        json.dump({"ok": ok, "matrix": rows}, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
