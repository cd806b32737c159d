"""Shared CLI plumbing: logging, work-dir layout, config/override parsing.

Parity with the reference drivers' flags (scripts/dist_clip_voc.py:26-34,
test_msc_flip_voc.py:19-28) plus resume/precision knobs.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import logging
import os
import sys

from weclip_tpu.core.config import Config, coco_config, load_config


def setup_runtime():
    """Enable the persistent XLA compilation cache for all CLI entry points."""
    try:
        from weclip_tpu.core.runtime import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass


def setup_logger(filename: str | None = None):
    setup_runtime()
    fmt = logging.Formatter("%(asctime)s - %(filename)s - %(levelname)s: %(message)s")
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    ch = logging.StreamHandler(sys.stdout)
    ch.setFormatter(fmt)
    root.addHandler(ch)
    if filename:
        fh = logging.FileHandler(filename, mode="w")
        fh.setFormatter(fmt)
        root.addHandler(fh)


def train_parser(default_config: str | None = None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=default_config, type=str)
    p.add_argument("--work_dir", default=None, type=str)
    p.add_argument("--radius", default=None, type=int)
    p.add_argument("--crop_size", default=None, type=int)
    p.add_argument("--max_iters", default=None, type=int)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--precision", default=None, choices=["bfloat16", "float32"])
    p.add_argument("--profile", default=None, type=str, metavar="START:END",
                   help="capture a jax.profiler trace between these steps")
    p.add_argument("--decoded_cache", default=None, type=str, metavar="DIR",
                   help="pre-decoded .npy image/label cache directory "
                        "(first epoch decodes and fills it; useful on "
                        "few-core hosts, see tools/measure_host_pipeline.py)")
    return p


def eval_parser(default_config: str | None = None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=default_config, type=str)
    p.add_argument("--work_dir", default="results", type=str)
    p.add_argument("--bkg_score", default=0.45, type=float,
                   help="INERT reference-parity flag: the reference parses "
                        "it but never reads it (background comes from "
                        "pow(1-max_cam, bg_exponent)); kept so command "
                        "lines port over unchanged")
    p.add_argument("--resize_long", default=512, type=int)
    p.add_argument("--eval_set", default="val", type=str)
    p.add_argument("--model_path", default=None, type=str)
    p.add_argument("--crf_impl", default="native",
                   choices=["native", "jax"],
                   help="dense-CRF backend: exact C++ permutohedral lattice "
                        "on the host, or the approximate batched on-device "
                        "JAX mean field")
    p.add_argument("--crf_stride", default=4, type=int,
                   help="bilateral subsampling stride of the jax CRF.  "
                        "Default 4: retains >=85%% of the CRF's mIoU effect "
                        "vs the exact lattice (<=0.15 pt at real-data CRF-"
                        "gain scales — inside the ±0.3 parity budget; "
                        "tests/test_crf.py budget test).  8 is the fast "
                        "mode (~3x quicker, ~74%% retained — budget-"
                        "marginal); --crf_impl native is always exact")
    p.add_argument("--crf", action="store_true",
                   help="dense-CRF post-processing (the reference defines "
                        "crf_proc but ships with the call commented out)")
    p.add_argument("--max_images", default=None, type=int)
    p.add_argument("--precision", default=None, choices=["bfloat16", "float32"])
    p.add_argument("--save_preds", action="store_true",
                   help="write per-image prediction PNGs (+ colormap) like "
                        "the reference's prediction/ and prediction_cmap/ dirs")
    p.add_argument("--save_logits", action="store_true",
                   help="dump per-image {segs, msc_segs} npys like "
                        "test_msc_flip_voc.py:111")
    add_mesh_arg(p)
    return p


def add_mesh_arg(p: argparse.ArgumentParser):
    p.add_argument("--mesh", default=-1, type=int,
                   help="total devices for sharded evaluation (-1 = all "
                        "local devices, 1 = single chip): a (data, model) "
                        "mesh of this size, with the tensor-parallel width "
                        "taken from cfg.mesh.model_parallel (so it must "
                        "divide --mesh); eval.batch_images is rounded up "
                        "to a multiple of the data width")


def build_eval_mesh(cfg: Config, args, params, frozen):
    """Resolve --mesh into (cfg, mesh, params, frozen): a (data, model)
    mesh over the requested device count — ``--mesh`` picks the data width,
    ``cfg.mesh.model_parallel`` the tensor-parallel width (frozen MLP
    weights shard over it, mesh.model_shardings; everything else
    replicates) — with the eval batch rounded up to a data-mesh multiple.
    Returns mesh=None (inputs untouched) for a single device."""
    import jax
    mp = max(cfg.mesh.model_parallel, 1)
    total = getattr(args, "mesh", -1)
    if total in (-1, 0, None):
        total = (jax.device_count() // mp) * mp
    if total <= 1:
        # Single-device eval ('--mesh 1 = single chip', regardless of the
        # config's tensor-parallel width): declare so the Pallas kernels
        # stay enabled even when the host exposes more devices
        # (core/runtime.pallas_ok).
        from weclip_tpu.core.runtime import declare_sharded_compute
        declare_sharded_compute(False)
        return cfg, None, params, frozen
    if total % mp != 0:
        raise SystemExit(
            f"--mesh {total} is not a multiple of cfg.mesh.model_parallel="
            f"{mp}; pass a total device count divisible by the "
            f"tensor-parallel width (or set mesh.model_parallel in the "
            f"config)")
    n = total // mp
    from weclip_tpu.parallel import mesh as meshlib
    mesh = meshlib.make_mesh(data_parallel=n, model_parallel=mp)
    bsz = ((cfg.eval.batch_images + n - 1) // n) * n
    if bsz != cfg.eval.batch_images:
        logging.getLogger("weclip_tpu").info(
            "eval.batch_images %d -> %d (multiple of %d-device mesh)",
            cfg.eval.batch_images, bsz, n)
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, batch_images=bsz))
    return (cfg, mesh, meshlib.replicate(mesh, params),
            meshlib.shard_model(mesh, frozen))


def apply_train_args(cfg: Config, args) -> Config:
    ds = cfg.dataset
    tr = cfg.train
    # parser defaults are None — check identity, not truthiness, so an
    # explicit 0 override (e.g. --radius 0 ablations) is honored
    if args.crop_size is not None:
        ds = dataclasses.replace(ds, crop_size=args.crop_size)
    if getattr(args, "decoded_cache", None):
        ds = dataclasses.replace(ds, decoded_cache_dir=args.decoded_cache)
    if args.radius is not None:
        tr = dataclasses.replace(tr, radius=args.radius)
    if args.max_iters is not None:
        tr = dataclasses.replace(tr, max_iters=args.max_iters)
    wd = cfg.work_dir
    if args.work_dir:
        wd = dataclasses.replace(wd, dir=args.work_dir)
    pr = cfg.precision
    if args.precision:
        pr = dataclasses.replace(pr, compute_dtype=args.precision)
    # timestamped checkpoint dirs (dist_clip_voc.py:308-316); on --resume,
    # reuse the newest run dir that actually holds a checkpoint — a fresh
    # timestamp would silently restart from scratch
    ts = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M")
    if getattr(args, "resume", False):
        base = os.path.join(wd.dir, wd.ckpt_dir)
        if os.path.isdir(base):
            runs = sorted(
                d for d in os.listdir(base)
                if os.path.isdir(os.path.join(base, d))
                and any(s.startswith("step_")
                        for s in os.listdir(os.path.join(base, d))))
            if runs:
                ts = runs[-1]
    wd = dataclasses.replace(wd, ckpt_dir=os.path.join(wd.ckpt_dir, ts))
    return dataclasses.replace(cfg, dataset=ds, train=tr, work_dir=wd,
                               precision=pr)


def load_train_config(args, dataset: str) -> Config:
    base = coco_config() if dataset == "coco" else Config()
    cfg = load_config(args.config) if args.config else base
    cfg = apply_train_args(cfg, args)
    os.makedirs(os.path.join(cfg.work_dir.dir, cfg.work_dir.ckpt_dir),
                exist_ok=True)
    setup_logger(os.path.join(
        cfg.work_dir.dir,
        datetime.datetime.now().strftime("%Y-%m-%d-%H-%M") + ".log"))
    return cfg
