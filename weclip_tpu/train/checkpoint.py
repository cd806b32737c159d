"""Orbax checkpoint/restore with step metadata.

The reference only ever *writes* late-training model weights
(dist_clip_voc.py:286-289) and cannot resume a crashed run (SURVEY §5.3-5.4).
Here every save captures params + optimizer state + step, so training resumes
exactly; saves are atomic via orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(base, f"step_{step:08d}")


def save(base_dir: str, step: int, params: Any, opt_state: Any = None) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(_ckpt_dir(base_dir, step))
    ckpt = {"params": params, "step": np.asarray(step)}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)
    return path


def latest_step(base_dir: str) -> Optional[int]:
    if not os.path.isdir(base_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(base_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore(base_dir: str, step: Optional[int] = None,
            template: Any = None) -> Tuple[Any, Any, int]:
    """Returns (params, opt_state_or_None, step).

    ``template`` is only used to re-impose pytree *container* types (orbax
    returns plain dicts/lists); values always come from disk, and extra
    on-disk subtrees (e.g. opt_state when only params are wanted) are fine.
    """
    import orbax.checkpoint as ocp
    # a "step_N" checkpoint directory may be passed directly as base_dir
    tail = os.path.basename(os.path.normpath(base_dir))
    if step is None and tail.startswith("step_") and os.path.isdir(base_dir):
        path = os.path.abspath(base_dir)
        step = int(tail.split("_")[1])
    else:
        if step is None:
            step = latest_step(base_dir)
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {base_dir}")
        path = os.path.abspath(_ckpt_dir(base_dir, step))
        if not os.path.isdir(path) and tail.startswith("step_"):
            path = os.path.abspath(base_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore(path)

    def impose(tpl, raw):
        if tpl is None or raw is None:
            return raw
        tdef = jax.tree_util.tree_structure(tpl)
        leaves = jax.tree_util.tree_leaves(raw)
        return jax.tree_util.tree_unflatten(tdef, leaves)

    params = ckpt["params"]
    opt_state = ckpt.get("opt_state")
    if template is not None:
        params = impose(template.get("params"), params)
        if "opt_state" in template:
            opt_state = impose(template["opt_state"], opt_state)
    return params, opt_state, int(np.asarray(ckpt["step"]))
