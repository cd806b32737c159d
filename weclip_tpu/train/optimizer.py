"""optax poly-warmup AdamW, matching ``PolyWarmupAdamW``
(utils/optimizer.py:3-33).

The reference adjusts lr *before* each step with global_step starting at 0:
- warmup (t < W):  mult = 1 - (1 - t/W) * (1 - warmup_ratio)
- poly   (t < T):  mult = (1 - t/T) ** power
Only the decoder+fuse parameters train, at 10x the base lr
(dist_clip_voc.py:213-230 with empty groups 0-2).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from weclip_tpu.core.config import OptimizerConfig


def poly_warmup_schedule(cfg: OptimizerConfig, max_iters: int, base_lr: float):
    def schedule(step):
        t = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = 1.0 - (1.0 - t / cfg.warmup_iter) * (1.0 - cfg.warmup_ratio)
        poly = jnp.power(jnp.maximum(1.0 - t / max_iters, 0.0), cfg.power)
        mult = jnp.where(t < cfg.warmup_iter, warm, poly)
        return base_lr * mult
    return schedule


def make_optimizer(cfg: OptimizerConfig, max_iters: int) -> optax.GradientTransformation:
    base_lr = cfg.learning_rate * cfg.head_lr_mult
    return optax.adamw(
        learning_rate=poly_warmup_schedule(cfg, max_iters, base_lr),
        b1=cfg.betas[0], b2=cfg.betas[1], eps=1e-8,
        weight_decay=cfg.weight_decay,
    )


def make_sgd_optimizer(cfg: OptimizerConfig, max_iters: int,
                       momentum: float = 0.9) -> optax.GradientTransformation:
    """Poly-warmup SGD (utils/optimizer.py:35-65 ``PolyWarmupSGD`` — unused
    by the reference drivers but part of its optimizer surface)."""
    base_lr = cfg.learning_rate * cfg.head_lr_mult
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(learning_rate=poly_warmup_schedule(cfg, max_iters, base_lr),
                  momentum=momentum),
    )
