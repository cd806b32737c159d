"""Runtime niceties: persistent compilation cache + profiler helpers.

The axon TPU backend compiles via a remote helper and large programs (the
fused eval step, the Pallas PAR kernel) take minutes; the persistent cache
makes every run after the first start instantly (SURVEY §5.1 gap: the
reference has no tooling here at all)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax
    path = path or os.environ.get("WECLIP_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/weclip_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def pallas_ok() -> bool:
    """True when the fused Pallas kernels may be dispatched: TPU backend
    AND a single local device.

    Under a multi-device mesh the kernels would sit inside plain ``jit``
    (no shard_map), and GSPMD cannot auto-partition a Mosaic custom call
    whose operands are sharded — the XLA formulations of every kernel are
    fully partitionable and take over there (multi-chip correctness is
    validated on the CPU fake-device mesh, which exercises exactly those
    XLA paths).  Single chip — the measured-perf configuration — keeps the
    kernels.  Wrapping the kernels in shard_map to get both at once needs
    real multi-chip hardware to validate and is tracked in PARITY.md.
    """
    import jax
    return jax.default_backend() == "tpu" and jax.device_count() == 1
