"""Report per-module statement coverage from a tools/cov_plugin dump.

    python -m tools.cov_report /tmp/cov.json [--misses module.py]

Statements are counted via the ast module (excluding docstring-only
expressions), so the percentages line up with what the line events can
actually hit.
"""

from __future__ import annotations

import ast
import json
import os
import sys


def statement_lines(path: str) -> set:
    src = open(path).read()
    tree = ast.parse(src)
    lines = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.stmt):
            # skip docstring expressions
            if (isinstance(node, ast.Expr)
                    and isinstance(node.value, ast.Constant)
                    and isinstance(node.value.value, str)):
                continue
            lines.add(node.lineno)
    return lines


def main():
    dump = sys.argv[1]
    show = sys.argv[3] if len(sys.argv) > 3 and sys.argv[2] == "--misses" else None
    hits = {k: set(v) for k, v in json.load(open(dump)).items()}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "weclip_tpu")
    tot_s = tot_h = 0
    rows = []
    for dirpath, _, files in os.walk(pkg):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = os.path.join(dirpath, f)
            stmts = statement_lines(p)
            if not stmts:
                continue
            got = hits.get(p, set())
            h = len(stmts & got)
            tot_s += len(stmts)
            tot_h += h
            rel = os.path.relpath(p, root)
            rows.append((h / len(stmts), rel, h, len(stmts)))
            if show and rel.endswith(show):
                print(rel, "missing:", sorted(stmts - got))
    rows.sort()
    for frac, rel, h, n in rows:
        print(f"{frac*100:5.1f}%  {h:4d}/{n:<4d}  {rel}")
    print(f"TOTAL {tot_h / tot_s * 100:.1f}% ({tot_h}/{tot_s})")


if __name__ == "__main__":
    main()
