"""The jitted training step: forward -> pseudo-labels -> losses -> update.

One XLA program per step replaces the reference's hot loop
(scripts/dist_clip_voc.py:238-267), which round-trips host<->device dozens of
times per iteration.  Data parallelism falls out of sharding the batch axis
over the mesh's ``data`` axis (weclip_tpu/parallel/mesh.py) — XLA inserts the
gradient all-reduce automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.models import weclip
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.train import losses
from weclip_tpu.train.optimizer import make_optimizer


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jax.Array


class StepMetrics(NamedTuple):
    loss: jax.Array
    seg_loss: jax.Array
    attn_loss: jax.Array
    pseudo_acc: jax.Array     # fraction of pixels where argmax(seg) == pseudo label


def create_train_state(rng: jax.Array, cfg: Config) -> Tuple[TrainState, optax.GradientTransformation]:
    params = weclip.init_trainable_params(rng, cfg)
    tx = make_optimizer(cfg.optimizer, cfg.train.max_iters)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    policy: precision.Policy = precision.DEFAULT,
                    mesh=None):
    crop = cfg.dataset.crop_size
    g = crop // cfg.clip.patch_size
    rmask = jnp.asarray(losses.radius_mask(g, g, cfg.train.radius))

    def loss_fn(params, frozen, batch: weclip.Batch, require_seg_trans,
                dropout_rng, cls_idx, cls_active):
        out = weclip.forward_train(params, frozen, batch, cfg,
                                   require_seg_trans, dropout_rng, policy,
                                   cls_idx=cls_idx, cls_active=cls_active,
                                   mesh=mesh)
        b = batch.img.shape[0]
        seg_grid = out.seg.reshape(b, g, g, -1).transpose(0, 3, 1, 2)
        seg_hw = resize_bilinear(seg_grid, crop, crop)        # (B,K,H,W)

        pseudo = jax.lax.stop_gradient(out.cam_labels)
        sloss = losses.seg_loss(seg_hw, pseudo, cfg.dataset.ignore_index)
        aff_label = losses.cams_to_affinity_label(
            pseudo, rmask, cfg.dataset.ignore_index, cfg.clip.patch_size)
        aloss, _, _ = losses.aff_loss(out.attn_pred, aff_label)
        total = sloss + cfg.train.attn_loss_weight * aloss

        pred = jnp.argmax(seg_hw, axis=1)
        pacc = jnp.mean((pred == pseudo).astype(jnp.float32))
        return total, StepMetrics(total, sloss, aloss, pacc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, frozen, batch: weclip.Batch,
                   rng: jax.Array, cls_idx=None, cls_active=None,
                   extra_iter_num: jax.Array = None
                   ) -> Tuple[TrainState, StepMetrics]:
        # The reference increments iter_num at the top of EVERY forward and
        # compares iter_num > 15000 (model_attn_aff_voc.py:111,146).  That
        # counter also advances during mid-training validation (validate()
        # calls the same forward once per val image, dist_clip_voc.py:71-102),
        # so the gate fires earlier than train-iter 15000 in the reference's
        # actual runs; ``extra_iter_num`` carries that validation-call count
        # for exact accounting (the trainer supplies it).
        extra = (jnp.zeros((), jnp.int32) if extra_iter_num is None
                 else extra_iter_num)
        require_seg_trans = (state.step + 1 + extra) > cfg.train.seg_trans_start_iter
        # rng=None trains deterministically (dropout off) — used by the
        # reference-lockstep goldens; real training always passes a key.
        dropout_rng = (None if rng is None
                       else jax.random.fold_in(rng, state.step))
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, require_seg_trans, dropout_rng,
            cls_idx, cls_active)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
