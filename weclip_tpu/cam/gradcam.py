"""Hook-free GradCAM on the last CLIP block via ``jax.vjp``.

Reference behavior being reproduced (SURVEY §3.3):

- ``CLIP.forward_last_layer`` (clip/model.py:407-429) runs resblock 11 with
  grad, ln_post, mean-pools patch tokens, projects, L2-normalizes and
  returns softmaxed image-text logits.
- ``pytorch_grad_cam`` hooks the *output of resblock-11's ln_1*
  (model_attn_aff_voc.py:84) and taps its gradient
  (activations_and_gradients.py:11-37).
- GradCAM weights = spatial mean of those gradients (grad_cam.py:16-23);
  CAM = min-max-normalized ReLU(sum_c w_c * act_c)
  (base_cam.py:116-154, utils/image.py:51-61).
- The loss backpropagated is the *softmax probability* of the target class
  over [present-fg-classes ∪ all-bg-classes] (base_cam.py:84-90,
  clip_tool.py:134-147).

TPU-first re-design: the per-image, per-class Python loop with repeated
``loss.backward(retain_graph=True)`` becomes one ``jax.vjp`` linearization
per image whose pullback is ``vmap``-ed over all foreground class seeds at
once; absent classes are masked to -inf *before* the softmax, which yields
exactly the reference's present-classes-only softmax.  XLA turns the batched
pullbacks into a handful of large MXU matmuls.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision
from weclip_tpu.core.config import ClipConfig
from weclip_tpu.models.clip import vit


class CamOutputs(NamedTuple):
    cams: jax.Array        # (B, C_fg, P) min-max normalized CAMs on the padded grid
    attn_last: jax.Array   # (B, L, L) head-mean attention of block 11
    probs: jax.Array       # (B, T) masked softmax over [fg ; bg] logits


def _image_text_probs(params, x_out, text_features, text_mask, valid, policy):
    """ln_post -> masked mean-pool -> proj -> L2 norm -> scaled cosine ->
    masked softmax (clip/model.py:409-427 with present-class masking)."""
    x = vit.layer_norm(x_out, params["ln_post"]["g"], params["ln_post"]["b"])
    pmask = valid[1:].astype(jnp.float32)                       # patch tokens only
    pooled = jnp.sum(x[1:] * pmask[:, None], axis=0) / jnp.maximum(pmask.sum(), 1.0)
    feat = pooled @ params["proj"].astype(jnp.float32)
    feat = feat / jnp.linalg.norm(feat)
    tf = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    logits = jnp.exp(params["logit_scale"]) * (tf @ feat)       # (T,)
    logits = jnp.where(text_mask, logits, -jnp.inf)
    return jax.nn.softmax(logits)


def _minmax_valid(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Min-max normalize over valid cells (utils/image.py:51-61); invalid -> 0."""
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, x, big))
    lo = jnp.where(jnp.isfinite(lo) & (lo < big), lo, 0.0)
    x = x - lo
    hi = jnp.max(jnp.where(valid, x, 0.0))
    x = x / (1e-7 + hi)
    return jnp.where(valid, x, 0.0)


def gradcam_single(
    visual_params,
    logit_scale,
    x11: jax.Array,            # (L, D) input tokens to block 11 (frozen output)
    text_features: jax.Array,  # (T, E) rows: [fg_classes ; bg_classes]
    text_mask: jax.Array,      # (T,) bool: present fg + all bg
    valid: jax.Array,          # (L,) token validity
    class_idx: jax.Array,      # (C,) int32 fg class ids to compute CAMs for
    cfg: ClipConfig,
    policy: precision.Policy = precision.DEFAULT,
    num_patches: int = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """GradCAM for the given foreground classes of one image in one
    linearization (the reference runs one backward per *present* class,
    clip_tool.py:139-147 — ``class_idx`` is that compacted set, padded to a
    static size).

    ``num_patches`` (static) is the padded-GRID patch count P when ``x11``
    arrives at the frozen backbone's stream-padded length Ls > 1+P
    (vit.VisionFeatures): CAMs are emitted for the grid block ``[1:1+P]``
    only.  Default (None) keeps P = L-1, the unpadded contract.

    Returns (cams (C, P), attn_last (L, L), probs (T,)).
    """
    block11 = jax.tree_util.tree_map(lambda a: a[cfg.vision_layers - 1],
                                     visual_params["blocks"])
    p = {"ln_post": visual_params["ln_post"], "proj": visual_params["proj"],
         "logit_scale": logit_scale}

    a0 = vit.layer_norm(x11, block11["ln_1"]["g"], block11["ln_1"]["b"])

    def head_fn(a):
        x_out, attn_w = vit.block_forward_from_ln1(
            block11, x11[None], a[None], cfg.vision_heads,
            valid=valid[None], policy=policy)
        probs = _image_text_probs(p, x_out[0], text_features, text_mask, valid, policy)
        # attention map as has_aux: keeps the export OUT of the pullback
        # graph entirely (a zero cotangent through it is not guaranteed to
        # be eliminated by XLA); downstream consumes it under stop_gradient
        return probs, attn_w[0]

    probs, pullback, attn_last = jax.vjp(head_fn, a0, has_aux=True)

    # one softmax-probability seed per requested class
    seeds = jax.nn.one_hot(class_idx, text_features.shape[0], dtype=probs.dtype)

    def grad_for(seed):
        (g,) = pullback(seed)
        return g                                              # (L, D) grad at ln_1 out

    grads = jax.vmap(grad_for)(seeds)                          # (C, L, D)

    pe = 1 + (num_patches if num_patches is not None else x11.shape[0] - 1)
    # GradCAM: weights = mean over valid patch positions of the gradient
    # (stream-padding tokens beyond pe are invalid => zero contribution)
    pmask = valid[1:pe].astype(jnp.float32)
    denom = jnp.maximum(pmask.sum(), 1.0)
    weights = jnp.sum(grads[:, 1:pe] * pmask[None, :, None], axis=1) / denom  # (C, D)
    acts = a0[1:pe]                                            # (P, D) patch activations
    cams = jnp.einsum("cd,pd->cp", weights, acts.astype(jnp.float32))
    cams = jnp.maximum(cams, 0.0)
    cams = jax.vmap(lambda c: _minmax_valid(c, valid[1:pe].astype(bool)))(cams)
    return cams, attn_last, probs


def gradcam_batch(
    visual_params,
    logit_scale,
    x11: jax.Array,            # (B, L, D)
    text_features: jax.Array,  # (T, E)
    text_mask: jax.Array,      # (B, T)
    valid: jax.Array,          # (B, L)
    num_fg: int,
    cfg: ClipConfig,
    policy: precision.Policy = precision.DEFAULT,
    class_idx: jax.Array = None,   # (B, C) compacted class ids; default all fg
    num_patches: int = None,       # static grid patch count (stream-padded x11)
) -> CamOutputs:
    if class_idx is None:
        class_idx = jnp.broadcast_to(jnp.arange(num_fg, dtype=jnp.int32),
                                     (x11.shape[0], num_fg))
    f = lambda x, tm, v, ci: gradcam_single(visual_params, logit_scale, x,
                                            text_features, tm, v, ci, cfg,
                                            policy, num_patches=num_patches)
    cams, attn_last, probs = jax.vmap(f)(x11, text_mask, valid, class_idx)
    return CamOutputs(cams, attn_last, probs)
