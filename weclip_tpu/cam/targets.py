"""CAM target functions — the seed-vector builders that replace
pytorch_grad_cam/utils/model_targets.py.

The reference's targets are callables applied to the model output under
autograd; in the vjp formulation a target IS the cotangent (seed) vector
fed to the pullback, so each class here builds that seed directly.  The
FasterRCNN target is detection-specific and out of scope for this framework
(no detection head exists in the reference's live paths either).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class ClassifierOutputTarget:
    """Select one class logit (model_targets.py:5-11): the seed is the
    one-hot of the category over a (T,) logit vector."""

    def __init__(self, category: int):
        self.category = category

    def seed(self, num_outputs: int, dtype=jnp.float32) -> jax.Array:
        return jax.nn.one_hot(self.category, num_outputs, dtype=dtype)

    def __call__(self, model_output: jax.Array) -> jax.Array:
        if model_output.ndim == 1:
            return model_output[self.category]
        return model_output[:, self.category]


class ClassifierOutputSoftmaxTarget(ClassifierOutputTarget):
    """Softmaxed variant: score = softmax(logits)[category].  The seed for a
    pullback through raw logits is the softmax Jacobian row, which depends
    on the logit VALUES — ``seed`` therefore requires ``logits=``."""

    def __call__(self, model_output: jax.Array) -> jax.Array:
        p = jax.nn.softmax(model_output, axis=-1)
        if model_output.ndim == 1:
            return p[self.category]
        return p[:, self.category]

    def seed(self, num_outputs: int, dtype=jnp.float32,
             logits: jax.Array = None) -> jax.Array:
        """d softmax(z)[c] / dz = p_c * (onehot_c - p) — the cotangent to
        feed a raw-logit pullback so it computes the softmaxed score's
        gradient (the reference reaches the same thing through autograd,
        pytorch_grad_cam/utils/model_targets.py:10-16)."""
        if logits is None:
            raise ValueError(
                "ClassifierOutputSoftmaxTarget.seed needs logits= — the "
                "softmax Jacobian row depends on the logit values (use "
                "ClassifierOutputTarget for a value-free one-hot seed)")
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        e = jax.nn.one_hot(self.category, num_outputs, dtype=p.dtype)
        pc = p[..., self.category]
        return ((e - p) * pc[..., None]).astype(dtype)


class SemanticSegmentationTarget:
    """Masked per-class score sum (model_targets.py:13-24): score =
    sum over masked pixels of the category's logit map."""

    def __init__(self, category: int, mask):
        self.category = category
        self.mask = jnp.asarray(mask)

    def __call__(self, model_output: jax.Array) -> jax.Array:
        return jnp.sum(model_output[self.category] * self.mask)

    def seed_fn(self, model_output_shape) -> jax.Array:
        """Cotangent for a (C, H, W) output: the mask in the category slot."""
        seed = jnp.zeros(model_output_shape, self.mask.dtype)
        return seed.at[self.category].set(self.mask)
