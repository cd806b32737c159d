"""sys.monitoring line-coverage collector for the test suite.

The image has no `coverage` package; Python 3.12's sys.monitoring LINE
events have low enough overhead to run under the full suite.  Usage:

    WECLIP_COV=/tmp/cov.json python -m pytest tests/ -q -p tools.cov_plugin
    python -m tools.cov_report /tmp/cov.json

Records executed (filename, lineno) pairs for files under weclip_tpu/ and
dumps them as JSON at session end.
"""

from __future__ import annotations

import json
import os
import sys

_TOOL = 4                      # sys.monitoring tool ids 0-5; 4 is free
_hits: dict = {}
_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_pkg = os.path.join(_root, "weclip_tpu")


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(_pkg):
        s = _hits.get(fn)
        if s is None:
            s = _hits[fn] = set()
        s.add(lineno)
    # each (code, line) only needs recording once — DISABLE stops further
    # events for this exact line (hot package lines fire millions of times
    # under the suite otherwise; output is identical)
    return sys.monitoring.DISABLE


def pytest_configure(config):
    if not os.environ.get("WECLIP_COV"):
        return
    mon = sys.monitoring
    mon.use_tool_id(_TOOL, "weclip-cov")
    mon.register_callback(_TOOL, mon.events.LINE, _on_line)
    mon.set_events(_TOOL, mon.events.LINE)


def pytest_unconfigure(config):
    out = os.environ.get("WECLIP_COV")
    if not out:
        return
    sys.monitoring.set_events(_TOOL, 0)
    sys.monitoring.free_tool_id(_TOOL)
    with open(out, "w") as f:
        json.dump({k: sorted(v) for k, v in _hits.items()}, f)
    print(f"\n[cov] wrote {out} ({len(_hits)} files)")
