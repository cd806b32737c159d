"""Iteration-based trainer (parity with scripts/dist_clip_voc.py:137-296).

Differences by design, all TPU-first:
- the whole step (forward + pseudo-labels + losses + update) is one XLA
  program; batches are sharded over the mesh's data axis,
- validation uses the batched eval engine instead of a per-image loop,
- checkpoints include optimizer state and support resume (the reference
  restarts from iter 0 after any crash),
- profiling hooks (jax.profiler) and per-step timing are built in.
"""

from __future__ import annotations

import dataclasses
import datetime
import logging
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.models import weclip
from weclip_tpu.models.clip import loader as clip_loader
from weclip_tpu.models.clip import prompts, vit
from weclip_tpu.parallel import mesh as meshlib
from weclip_tpu.train import checkpoint
from weclip_tpu.train import step as step_mod

log = logging.getLogger("weclip_tpu")


def build_frozen(cfg: Config, rng_seed: int = 0):
    """Load (or randomly init, for dev) the frozen CLIP + text features."""
    fetchable = clip_loader.is_fetchable(cfg.clip.pretrained_path)
    if fetchable or (cfg.clip.pretrained_path
                     and os.path.exists(cfg.clip.pretrained_path)):
        clip_params, clip_cfg = clip_loader.load_clip(
            cfg.clip.pretrained_path, cfg.clip,
            expected_sha256=cfg.clip.pretrained_sha256)
        cfg = dataclasses.replace(cfg, clip=clip_cfg)
        from weclip_tpu.models.clip.tokenizer import Tokenizer
        tok = Tokenizer()
        fg, bg = prompts.build_text_features(
            cfg.dataset.name, clip_params["text"], cfg.clip, tok,
            template=cfg.clip.prompt_template)
    else:
        log.warning("no CLIP checkpoint at %r — random init (dev only)",
                    cfg.clip.pretrained_path)
        key = jax.random.PRNGKey(rng_seed)
        clip_params = vit.init_clip_params(key, cfg.clip)
        fg_names, bg_names = prompts.class_tables(cfg.dataset.name)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 11))
        fg = np.asarray(jax.random.normal(k1, (len(fg_names), cfg.clip.embed_dim)))
        bg = np.asarray(jax.random.normal(k2, (len(bg_names), cfg.clip.embed_dim)))
        fg = fg / np.linalg.norm(fg, axis=-1, keepdims=True)
        bg = bg / np.linalg.norm(bg, axis=-1, keepdims=True)
    frozen = weclip.build_frozen_state(clip_params, fg, bg)
    return frozen, clip_params, cfg


def make_device_batch(host_batch: Dict[str, np.ndarray], pos_emb, valid,
                      grid: int, mesh) -> weclip.Batch:
    # host_batch holds this process's LOCAL rows; the jitted program sees
    # the GLOBAL batch (shard_batch assembles it across processes).  gh/gw
    # are per-example, so they ride the same batch sharding — building
    # them at global size with jnp.full would hand a host-local array to
    # the global-mesh jit under multi-process.
    lb = host_batch["img"].shape[0]
    dev = meshlib.shard_batch(mesh, {
        "img": host_batch["img"],
        "present_mask": host_batch["present_mask"],
        "gh": np.full((lb,), grid, np.int32),
        "gw": np.full((lb,), grid, np.int32),
    })
    return weclip.Batch(
        img=dev["img"], pos_emb=pos_emb, valid=valid,
        gh=dev["gh"], gw=dev["gw"],
        present_mask=dev["present_mask"])


def train(cfg: Config, resume: bool = False,
          max_steps: Optional[int] = None,
          dataset=None, val_dataset=None,
          profile_steps: Optional[Tuple[int, int]] = None) -> step_mod.TrainState:
    policy = precision.make_policy(cfg.precision.compute_dtype,
                                   cfg.precision.param_dtype,
                                   cfg.precision.softmax_dtype)
    mesh = meshlib.make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)
    log.info("mesh: %s", mesh)

    frozen, clip_params, cfg = build_frozen(cfg, cfg.train.seed)
    frozen = meshlib.shard_model(mesh, frozen)

    if dataset is None:
        if cfg.dataset.name == "coco":
            from weclip_tpu.data.coco import CocoClsDataset
            dataset = CocoClsDataset(cfg.dataset, cfg.train.split,
                                     seed=cfg.train.seed)
        else:
            from weclip_tpu.data.voc import VOCClsDataset
            dataset = VOCClsDataset(cfg.dataset, cfg.train.split,
                                    seed=cfg.train.seed)
    # samples_per_gpu is the per-chip batch (its literal meaning); the global
    # batch scales with the data-parallel mesh size
    n_data = mesh.shape[mesh.axis_names[0]]
    global_batch = cfg.train.samples_per_gpu * n_data
    log.info("global batch %d (%d per chip x %d chips)",
             global_batch, cfg.train.samples_per_gpu, n_data)
    from weclip_tpu.data.loader import PrefetchLoader
    # multi-host slices: each host feeds its own disjoint shard of every
    # epoch (SURVEY §2.10) at the PER-HOST batch size global_batch / P;
    # mesh.shard_batch assembles the global batch from the process-local
    # shards.  Single-host (P == 1) is byte-identical to before.
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    loader = PrefetchLoader(dataset, global_batch // n_proc,
                            seed=cfg.train.seed,
                            process_index=jax.process_index(),
                            process_count=n_proc)

    state, tx = step_mod.create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    ckpt_dir = os.path.join(cfg.work_dir.dir, cfg.work_dir.ckpt_dir)
    if resume and checkpoint.latest_step(ckpt_dir) is not None:
        params, opt_state, step0 = checkpoint.restore(
            ckpt_dir, template={"params": state.params,
                                "opt_state": state.opt_state,
                                "step": np.asarray(0)})
        state = step_mod.TrainState(params, opt_state,
                                    jnp.asarray(step0, jnp.int32))
        log.info("resumed from step %d", step0)

    step_fn = step_mod.make_train_step(cfg, tx, policy,
                                       mesh=mesh if mesh.size > 1 else None)
    grid = cfg.dataset.crop_size // cfg.clip.patch_size
    pos_emb = meshlib.replicate(
        mesh, np.asarray(vit.build_pos_emb(clip_params["visual"], grid, grid))[None])
    l = grid * grid + 1
    # host numpy (identical on every process) -> batch-sharded global array;
    # per-process slices are constant so no per-host assembly is needed
    valid = jax.device_put(np.ones((global_batch, l), bool),
                           meshlib.batch_sharding(mesh, 2))

    # replicate over the global mesh: a bare PRNGKey is committed to local
    # device 0, which other processes cannot address under multi-host jit
    rng = meshlib.replicate(mesh, jax.random.PRNGKey(cfg.train.seed + 1))
    total = max_steps or cfg.train.max_iters
    t_start = time.time()
    t_window = time.time()
    # metrics accumulate as a device-side running sum — ONE host readback
    # per log window instead of log_iters readbacks (each ~30ms over the
    # axon tunnel, multi-second stalls otherwise)
    msum = None
    n_in_window = 0

    from weclip_tpu.utils.tb import ScalarWriter
    writer = ScalarWriter(os.path.join(cfg.work_dir.dir,
                                       cfg.work_dir.tb_logger_dir))

    it = iter(loader)
    start_step = int(state.step)
    # reference iter_num accounting: validation forwards advance the same
    # counter that gates seg_trans (see train_step docstring); batch-1 val
    # means one forward per val image upstream
    val_forward_calls = 0
    if resume and start_step > 0 and val_dataset is not None:
        val_forward_calls = (start_step // cfg.train.eval_iters) * len(val_dataset)
    for n_iter in range(start_step, total):
        if profile_steps and n_iter == profile_steps[0]:
            jax.profiler.start_trace(os.path.join(cfg.work_dir.dir, "profile"))
        host_batch = next(it)
        batch = make_device_batch(host_batch, pos_emb, valid, grid, mesh)
        # static class-bucket compaction: the jit re-specializes per bucket
        # size (typically one or two buckets over a whole run)
        from weclip_tpu.core.compaction import compact_classes, pick_bucket
        mc = pick_bucket(host_batch["present_mask"], (4, 8, 16,
                                                      cfg.dataset.num_classes - 1))
        if jax.process_count() > 1:
            # the bucket is data-dependent on the LOCAL shard; hosts must
            # agree on one static size or their compiled programs diverge
            # (multi-host jit requires identical programs).  Max over
            # hosts = smallest bucket safe for every shard.
            from jax.experimental import multihost_utils
            mc = int(np.max(multihost_utils.process_allgather(
                np.asarray(mc, np.int32))))
        ci, ca = compact_classes(host_batch["present_mask"], mc)
        dev_c = meshlib.shard_batch(mesh, {"ci": ci, "ca": ca})
        # numpy scalar (not jnp): uncommitted inputs are treated as
        # replicated by jit on a multi-process mesh; a jnp array would be
        # committed to local device 0 only
        state, m = step_fn(state, frozen, batch, rng, dev_c["ci"], dev_c["ca"],
                           np.asarray(val_forward_calls, np.int32))
        msum = m if msum is None else jax.tree_util.tree_map(jnp.add, msum, m)
        n_in_window += 1
        if profile_steps and n_iter == profile_steps[1]:
            jax.block_until_ready(m.loss)
            jax.profiler.stop_trace()

        if (n_iter + 1) % cfg.train.log_iters == 0:
            ms = jax.tree_util.tree_map(lambda x: float(x) / n_in_window, msum)
            msum = None
            n_in_window = 0
            window_s = time.time() - t_window
            t_window = time.time()
            rate = cfg.train.log_iters * global_batch / window_s
            eta = datetime.timedelta(seconds=int(
                (total - n_iter - 1) * window_s / cfg.train.log_iters))
            log.info("iter %d/%d; img/s %.2f; eta %s; seg_loss %.4f; "
                     "attn_loss %.4f; pseudo_mAcc %.4f",
                     n_iter + 1, total, rate, eta, ms.seg_loss, ms.attn_loss,
                     ms.pseudo_acc)
            writer.add_scalars("train", {
                "seg_loss": ms.seg_loss, "attn_loss": ms.attn_loss,
                "pseudo_mAcc": ms.pseudo_acc, "imgs_per_sec": rate,
            }, n_iter + 1)

        if (n_iter + 1) % cfg.train.eval_iters == 0:
            if (n_iter + 1) > cfg.train.ckpt_start_iter:
                path = checkpoint.save(ckpt_dir, n_iter + 1, state.params,
                                       state.opt_state)
                log.info("saved %s", path)
            if val_dataset is not None:
                scores = validate(cfg, state.params, frozen, clip_params,
                                  val_dataset, policy, mesh=mesh)
                log.info("val seg: %s", scores["seg"])
                log.info("val cam: %s", scores["cam"])
                val_forward_calls += len(val_dataset)

    loader.close()
    log.info("training done in %s",
             datetime.timedelta(seconds=int(time.time() - t_start)))
    checkpoint.save(ckpt_dir, total, state.params, state.opt_state)
    return state


def validate(cfg: Config, params, frozen, clip_params, val_dataset, policy,
             max_images: Optional[int] = None, mesh=None):
    """Training-time validation (dist_clip_voc.py:71-102): original-size
    single-scale 'val' forward with cam + seg scores.

    ``mesh``: shard the val batches over its data axis (params/frozen are
    assumed already replicated on it, as the train loop keeps them)."""
    from weclip_tpu.evalx.runner import Evaluator, make_prep
    if mesh is not None:
        n = mesh.shape[mesh.axis_names[0]]
        if n > 1:
            bsz = ((cfg.eval.batch_images + n - 1) // n) * n
            cfg = dataclasses.replace(
                cfg, eval=dataclasses.replace(cfg.eval, batch_images=bsz))
        else:
            mesh = None
    max_ori = 512 if cfg.dataset.name == "voc" else 640
    prep = make_prep(cfg, max_ori=max_ori, resize_long=None)
    pe = np.asarray(clip_params["visual"]["positional_embedding"])
    ev = Evaluator(cfg, prep, pe, policy=policy, with_cam=True, msc=False,
                   mesh=mesh)
    return ev.run(params, frozen, val_dataset, max_images=max_images)
