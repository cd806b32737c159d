"""Runtime niceties: persistent compilation cache + profiler helpers.

The axon TPU backend compiles via a remote helper and large programs (the
fused eval step, the Pallas PAR kernel) take minutes; the persistent cache
makes every run after the first start instantly (SURVEY §5.1 gap: the
reference has no tooling here at all)."""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager


def enable_compilation_cache(path: str | None = None) -> str:
    import jax
    path = path or os.environ.get("WECLIP_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/weclip_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


# Whether jitted programs in this process trace with operands sharded over
# a multi-device mesh.  None = never declared; pallas_ok() then falls back
# to the conservative global device count.
_sharded_compute: bool | None = None

# Trace-time depth of per-device (shard_map-manual) regions: inside one,
# every operand a kernel sees is a whole per-device array, so Mosaic custom
# calls are safe regardless of how the SURROUNDING program is sharded.
_per_device_depth: int = 0


@_contextmanager
def per_device_region():
    """Context manager marking a shard_map-manual body while it is TRACED.

    Dispatch decisions (pallas_ok) happen at Python trace time, so wrapping
    the body's computation in this context routes every kernel dispatch
    inside it to the fused Pallas implementations even though the process
    has declared multi-device compute — exactly the jax-documented
    supported configuration for Mosaic on a mesh (kernels per device under
    shard_map).  Callers: evalx/runner.round_for's sharded round."""
    global _per_device_depth
    _per_device_depth += 1
    try:
        yield
    finally:
        _per_device_depth -= 1


def declare_sharded_compute(active: bool) -> None:
    """Record whether compute is partitioned over a multi-device mesh.

    Called by the mesh owner (``parallel.mesh.make_mesh`` and the CLI
    single-device fast path): Mosaic custom calls cannot be
    auto-partitioned by GSPMD, but they are safe — and ~10x faster for PAR
    — whenever the computation runs whole on one device, regardless of how
    many OTHER devices the host exposes.  Latest declaration wins."""
    global _sharded_compute
    _sharded_compute = bool(active)


def pallas_ok() -> bool:
    """True when the fused Pallas kernels may be dispatched: TPU backend
    AND the current compute is not partitioned over a multi-device mesh.

    Under a multi-device mesh the kernels would sit inside plain ``jit``
    (no shard_map), and GSPMD cannot auto-partition a Mosaic custom call
    whose operands are sharded — the XLA formulations of every kernel are
    fully partitionable and take over there (multi-chip correctness is
    validated on the CPU fake-device mesh, which exercises exactly those
    XLA paths; PAR alone dispatches its kernel under shard_map,
    refine/par.py).  Whether compute is partitioned comes from the mesh
    owner via ``declare_sharded_compute``; if nothing was declared, fall
    back to requiring a single visible device — conservative, but a
    multi-device host running a genuinely unsharded program should go
    through make_mesh/build_eval_mesh, which declare.
    """
    import jax
    if jax.default_backend() != "tpu":
        return False
    if _per_device_depth > 0:
        # tracing a shard_map-manual body: operands are whole per-device
        # arrays, so the kernels are safe whatever the outer sharding is
        return True
    if _sharded_compute is not None:
        return not _sharded_compute
    return jax.device_count() == 1
