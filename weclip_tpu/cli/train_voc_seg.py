"""Fully-supervised VOC training for the seg variant (paper setup: 5.7M
trainable params on GT masks; the reference ships only the model + eval
driver for this configuration)."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.cli import common

log = logging.getLogger("weclip_tpu")


def main():
    args = common.train_parser().parse_args()
    cfg = common.load_train_config(args, "voc")

    from weclip_tpu.core import precision
    from weclip_tpu.data.loader import PrefetchLoader
    from weclip_tpu.data.voc import VOCBase
    from weclip_tpu.data import transforms
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    from weclip_tpu.parallel import mesh as meshlib
    from weclip_tpu.train import checkpoint
    from weclip_tpu.train.seg_step import create_seg_train_state, make_seg_train_step
    from weclip_tpu.train.trainer import build_frozen

    class VOCSegTrainDataset(VOCBase):
        """GT-supervised crops (flip + crop with label, voc.py:216-251)."""

        def __getitem__(self, idx):
            return self.get_example(idx, None)

        def get_example(self, idx, rng):
            name = self.names[idx]
            image = self.read_image(name).astype(np.float32)
            label = self.read_label(name).astype(np.float32)
            image, label = transforms.random_fliplr(image, label, rng=rng)
            image = transforms.PhotoMetricDistortion()(
                image, rng=rng).astype(np.float32)
            image, label, _ = transforms.random_crop(
                image, self.cfg.crop_size, label,
                ignore_index=self.cfg.ignore_index, rng=rng)
            image = transforms.normalize_img(image)
            return {"img": np.transpose(image, (2, 0, 1)).astype(np.float32),
                    "label": label.astype(np.int32)}

    policy = precision.make_policy(cfg.precision.compute_dtype)
    mesh = meshlib.make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)
    frozen, clip_params, cfg = build_frozen(cfg)
    frozen = meshlib.shard_model(mesh, frozen)

    ds = VOCSegTrainDataset(cfg.dataset, cfg.train.split)
    # samples_per_gpu is per-chip; global batch scales with the data mesh.
    # Multi-host: the loader draws this process's b/P shard and
    # mesh.shard_batch assembles the global batch (same contract as
    # train/trainer.py) — a full-global-size loader here would leave
    # (P-1)/P of every epoch unconsumed.
    n_data = mesh.shape[mesh.axis_names[0]]
    b = cfg.train.samples_per_gpu * n_data
    n_proc = jax.process_count()
    assert b % n_proc == 0, (b, n_proc)
    loader = PrefetchLoader(ds, b // n_proc, seed=cfg.train.seed,
                            process_index=jax.process_index(),
                            process_count=n_proc)
    state, tx = create_seg_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    step_fn = make_seg_train_step(cfg, tx, policy)

    grid = cfg.dataset.crop_size // cfg.clip.patch_size
    pos_emb = meshlib.replicate(
        mesh, np.asarray(vit.build_pos_emb(clip_params["visual"], grid, grid))[None])
    l = grid * grid + 1
    # numpy source + replicated rng: multi-process-safe inputs (see
    # train/trainer.py for the full rationale)
    valid = jax.device_put(np.ones((b, l), bool),
                           meshlib.batch_sharding(mesh, 2))
    rng = meshlib.replicate(mesh, jax.random.PRNGKey(cfg.train.seed + 1))

    import os
    ckpt_dir = os.path.join(cfg.work_dir.dir, cfg.work_dir.ckpt_dir)
    start_step = 0
    if args.resume and checkpoint.latest_step(ckpt_dir) is not None:
        from weclip_tpu.train.step import TrainState
        params, opt_state, start_step = checkpoint.restore(
            ckpt_dir, template={"params": state.params,
                                "opt_state": state.opt_state,
                                "step": np.asarray(0)})
        state = TrainState(params, opt_state,
                           jnp.asarray(start_step, jnp.int32))
        log.info("resumed from step %d", start_step)
    it = iter(loader)
    for n_iter in range(start_step, cfg.train.max_iters):
        hb = next(it)
        lb = hb["img"].shape[0]
        dev = meshlib.shard_batch(mesh, {
            "img": hb["img"], "label": hb["label"],
            "gh": np.full((lb,), grid, np.int32),
            "gw": np.full((lb,), grid, np.int32),
            "present_mask": np.zeros((lb, cfg.dataset.num_classes - 1),
                                     bool)})
        batch = weclip.Batch(
            img=dev["img"], pos_emb=pos_emb, valid=valid,
            gh=dev["gh"], gw=dev["gw"],
            present_mask=dev["present_mask"])
        state, m = step_fn(state, frozen, batch, dev["label"], rng)
        if (n_iter + 1) % cfg.train.log_iters == 0:
            log.info("iter %d: loss %.4f acc %.4f", n_iter + 1,
                     float(m.loss), float(m.acc))
        if (n_iter + 1) % cfg.train.eval_iters == 0 and \
                (n_iter + 1) > cfg.train.ckpt_start_iter:
            checkpoint.save(ckpt_dir, n_iter + 1, state.params, state.opt_state)
    loader.close()
    checkpoint.save(ckpt_dir, cfg.train.max_iters, state.params, state.opt_state)


if __name__ == "__main__":
    main()
