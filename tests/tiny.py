"""Tiny model/config builders shared by tests (CPU-sized)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core.config import ClipConfig, Config, DatasetConfig, ParConfig
from weclip_tpu.models import weclip
from weclip_tpu.models.clip import vit


def tiny_clip_config(layers: int = 12) -> ClipConfig:
    return ClipConfig(
        patch_size=16, vision_width=64, vision_layers=layers, vision_heads=2,
        embed_dim=32, context_length=16, vocab_size=128,
        transformer_width=32, transformer_heads=2, transformer_layers=2,
    )


def tiny_config(crop: int = 64, num_classes: int = 6) -> Config:
    cfg = Config()
    return dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, crop_size=crop,
                                    num_classes=num_classes),
        clip=tiny_clip_config(),
        par=ParConfig(dilations=(1, 2), num_iter=4),
    )


def tiny_frozen(cfg: Config, seed: int = 0, num_bg: int = 5):
    key = jax.random.PRNGKey(seed)
    clip_params = vit.init_clip_params(key, cfg.clip)
    num_fg = cfg.dataset.num_classes - 1
    k1, k2 = jax.random.split(jax.random.fold_in(key, 7))
    fg = jax.random.normal(k1, (num_fg, cfg.clip.embed_dim))
    bg = jax.random.normal(k2, (num_bg, cfg.clip.embed_dim))
    fg = fg / jnp.linalg.norm(fg, axis=-1, keepdims=True)
    bg = bg / jnp.linalg.norm(bg, axis=-1, keepdims=True)
    return weclip.build_frozen_state(clip_params, fg, bg), clip_params


def tiny_batch(cfg: Config, clip_params, batch: int = 2, seed: int = 1):
    crop = cfg.dataset.crop_size
    g = crop // cfg.clip.patch_size
    l = g * g + 1
    key = jax.random.PRNGKey(seed)
    img = jax.random.normal(key, (batch, 3, crop, crop))
    pos = vit.build_pos_emb(clip_params["visual"], g, g)[None]
    valid = jnp.ones((batch, l), bool)
    num_fg = cfg.dataset.num_classes - 1
    present = np.zeros((batch, num_fg), bool)
    present[:, 0] = True
    present[:, num_fg - 1] = True       # the bg->last-class quirk
    return weclip.Batch(
        img=img, pos_emb=pos, valid=valid,
        gh=jnp.full((batch,), g, jnp.int32), gw=jnp.full((batch,), g, jnp.int32),
        present_mask=jnp.asarray(present),
    )
