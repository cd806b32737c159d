"""Fully-supervised variant ("seg"): frozen CLIP features -> fuse ->
decoder, trained with ground-truth masks.

Parity target: WeCLIP_model/model_attn_aff_voc_seg.py (ALL CLIP params
frozen :64-65, no GradCAM / PAR / affinity — forward is features -> fuse ->
decoder -> logits :102-125) and its msc-flip eval driver
test_msc_flip_seg.py.  The reference ships no training script for this
variant (SURVEY §2.5); standard ignore-aware cross-entropy against GT
labels reproduces the paper's fully-supervised setup (81.6 VOC val mIoU,
5.7M trainable params).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.models import weclip
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.train.losses import _masked_ce
from weclip_tpu.train.optimizer import make_optimizer
from weclip_tpu.train.step import TrainState


class SegMetrics(NamedTuple):
    loss: jax.Array
    acc: jax.Array


def make_seg_train_step(cfg: Config, tx: optax.GradientTransformation,
                        policy: precision.Policy = precision.DEFAULT):
    crop = cfg.dataset.crop_size
    g = crop // cfg.clip.patch_size

    def loss_fn(params, frozen, batch: weclip.Batch, label, dropout_rng):
        _, head_out, _, _ = weclip.backbone_and_heads(
            params, frozen, batch, cfg, dropout_rng, policy)
        b = batch.img.shape[0]
        seg_grid = head_out.seg.reshape(b, g, g, -1).transpose(0, 3, 1, 2)
        seg_hw = resize_bilinear(seg_grid, crop, crop)
        valid = label != cfg.dataset.ignore_index
        loss = _masked_ce(seg_hw, label, valid)
        pred = jnp.argmax(seg_hw, axis=1)
        acc = jnp.sum((pred == label) * valid) / jnp.maximum(valid.sum(), 1)
        return loss, SegMetrics(loss, acc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, frozen, batch: weclip.Batch,
                   label, rng) -> Tuple[TrainState, SegMetrics]:
        dropout_rng = jax.random.fold_in(rng, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frozen, batch, label, dropout_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def create_seg_train_state(rng, cfg: Config):
    params = weclip.init_trainable_params(rng, cfg)
    tx = make_optimizer(cfg.optimizer, cfg.train.max_iters)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx
