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
        # the reference stops ADJUSTING lr once global_step >= max_iter
        # (utils/optimizer.py:17-28 has no else-branch), so a run driven
        # past max_iter keeps stepping at the LAST set lr — the t = T-1
        # value — never 0.  Clamp t to reproduce that for step >= T.
        tp = jnp.minimum(t, float(max_iters - 1))
        poly = jnp.power(jnp.maximum(1.0 - tp / max_iters, 0.0), cfg.power)
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


def sgd_poly_warmup_schedule(cfg: OptimizerConfig, max_iters: int,
                             base_lr: float):
    """``PolyWarmupSGD``'s OWN schedule (utils/optimizer.py:49-59), which
    differs from the AdamW one and is reproduced verbatim, quirks
    included: during warmup the multiplier is ``(1 - t/W)**power * 10``
    (it DECAYS from 10x to 0 — apparently inverted, but that is what the
    reference computes), then poly decay over the REMAINING iters
    ``(1 - (t-W)/(T-W))**power``.  Dead code upstream (no driver uses it);
    kept surface-faithful rather than silently substituting the AdamW
    warmup."""
    def schedule(step):
        t = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        w = float(cfg.warmup_iter)
        warm = jnp.power(jnp.maximum(1.0 - t / w, 0.0), cfg.power) * 10.0
        # like PolyWarmupAdamW, the reference stops adjusting at
        # global_step >= max_iter (utils/optimizer.py:51-62): past-end
        # steps keep the t = T-1 lr, so clamp before the poly term
        tp = jnp.minimum(t, float(max_iters - 1))
        poly = jnp.power(
            jnp.maximum(1.0 - (tp - w) / (max_iters - w), 0.0), cfg.power)
        return base_lr * jnp.where(t < w, warm, poly)
    return schedule


def make_sgd_optimizer(cfg: OptimizerConfig, max_iters: int,
                       momentum: float = 0.9) -> optax.GradientTransformation:
    """Poly-warmup SGD (utils/optimizer.py:35-65 ``PolyWarmupSGD`` — unused
    by the reference drivers but part of its optimizer surface).
    torch.optim.SGD couples weight decay into the gradient BEFORE the
    momentum buffer — optax.add_decayed_weights ahead of optax.sgd matches
    that exactly (lockstep-tested against the reference class)."""
    base_lr = cfg.learning_rate * cfg.head_lr_mult
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.sgd(
            learning_rate=sgd_poly_warmup_schedule(cfg, max_iters, base_lr),
            momentum=momentum),
    )
