"""Device mesh, sharding specs and collective helpers.

The reference has *no* distributed execution (SURVEY §2.10-2.11: the
"dist_" trainer pins one GPU, scripts/dist_clip_voc.py:5).  This module is
the single owner of all cross-chip structure for the TPU build:

- a 2-D ``(data, model)`` mesh over the local devices (v5e-8 pods and the
  CPU fake-device test mesh look identical to callers),
- NamedShardings for batch-sharded arrays and replicated parameters,
- collective helpers (psum for loss/metric reduction, all_gather for eval
  histograms) that ride ICI within a slice; XLA routes DCN transparently
  for multi-slice meshes.

Everything downstream (train step, msc-flip TTA) expresses parallelism by
sharding the leading batch axis over ``data``; a ``model`` axis is reserved
for tensor-parallel extensions (e.g. CoMer-scale backbones).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: int = -1,
              model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None,
              data_axis: str = "data",
              model_axis: str = "model") -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel == -1:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    used = data_parallel * model_parallel
    assert used <= n, f"need {used} devices, have {n}"
    from weclip_tpu.core.runtime import declare_sharded_compute
    declare_sharded_compute(used > 1)
    arr = np.asarray(devices[:used]).reshape(data_parallel, model_parallel)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading axis over the data axis, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with the batch axis sharded.

    Multi-process: each process passes ITS OWN disjoint rows of the global
    batch (the PrefetchLoader per-host shards) and the global array is
    assembled from the process-local shards
    (``jax.make_array_from_process_local_data`` — plain ``device_put``
    would require identical values on every host and only consume each
    host's addressable slice).  Single-process keeps the direct
    ``device_put`` fast path, byte-identical behavior."""
    multiproc = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sh = batch_sharding(mesh, x.ndim)
        if multiproc:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)
    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def model_shardings(mesh: Mesh, tree):
    """NamedShardings for a CLIP param tree with Megatron-pattern MLP weight
    sharding over the ``model`` axis.

    The transformer-block MLP holds ~2/3 of the frozen encoder's parameters
    (per width-w block: 8w^2 MLP vs 4w^2 attention).  Its two matmuls
    partition cleanly along the hidden dimension — ``fc_w (L, 4w, w)`` and
    ``fc_b (L, 4w)`` shard the hidden-OUT dim, ``proj_w (L, w, 4w)`` the
    hidden-IN dim — so XLA's GSPMD runs each half-hidden matmul locally and
    reduces the proj output across ``model`` (the classic tensor-parallel
    split).  Attention/LN/embedding weights stay replicated: the TPU
    attention path is a Pallas kernel whose operands must be gathered
    per-device anyway.  Dims that the axis size does not divide fall back
    to replicated, so any tree/mesh combination is safe."""
    mp_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    mp = mesh.shape[mp_axis] if mp_axis else 1

    def spec_for(path, x):
        if mp > 1 and len(path) >= 2:
            name = getattr(path[-1], "key", None)
            parent = getattr(path[-2], "key", None)
            nd = np.ndim(x)
            if parent == "mlp" and name in ("fc_w", "fc_b"):
                dim = nd - 2 if name == "fc_w" else nd - 1
                if np.shape(x)[dim] % mp == 0:
                    s = [None] * nd
                    s[dim] = mp_axis
                    return NamedSharding(mesh, P(*s))
            if parent == "mlp" and name == "proj_w":
                if np.shape(x)[nd - 1] % mp == 0:
                    s = [None] * nd
                    s[nd - 1] = mp_axis
                    return NamedSharding(mesh, P(*s))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def shard_model(mesh: Mesh, tree):
    """Device-put a param tree with ``model_shardings`` (falls back to plain
    replication when the mesh has no model axis or its size is 1)."""
    return jax.tree_util.tree_map(jax.device_put, tree,
                                  model_shardings(mesh, tree))


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    ndata = mesh.shape[mesh.axis_names[0]]
    assert global_batch % ndata == 0, (global_batch, ndata)
    return global_batch // ndata


def dp_only(mesh: Optional[Mesh]) -> bool:
    """True when ``mesh`` partitions compute over its leading (data) axis
    only — every non-data axis has size 1 — so a program that is pure
    data-parallel can run as ONE full-manual shard_map over ``data``
    (per_device_map below), the configuration that keeps the Mosaic
    kernels dispatched per device (core/runtime.pallas_ok)."""
    return (mesh is not None and mesh.size > 1
            and all(mesh.shape[a] == 1 for a in mesh.axis_names[1:]))


def per_device_map(fn, mesh: Mesh, in_specs, out_specs):
    """Full-manual ``shard_map`` whose body is traced inside
    ``runtime.per_device_region`` so every kernel dispatch inside ``fn``
    sees whole per-device operands and stays on the fused Pallas
    implementations.  ``fn`` may use the collective helpers above (the
    mesh's axis names are in scope); callers should gate on
    ``dp_only(mesh)`` unless the specs genuinely describe every axis."""
    from jax import shard_map

    from weclip_tpu.core.runtime import per_device_region

    def body(*args):
        with per_device_region():
            return fn(*args)

    return shard_map(body, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_vma=False)


# ---------------------------------------------------------------------------
# Collective helpers (for use inside shard_map'ed functions)
# ---------------------------------------------------------------------------

def psum(x, axis_name: str = "data"):
    return jax.lax.psum(x, axis_name)


def pmean(x, axis_name: str = "data"):
    return jax.lax.pmean(x, axis_name)


def all_gather(x, axis_name: str = "data", axis: int = 0):
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=True)
