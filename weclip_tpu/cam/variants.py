"""CAM-engine variant library.

The reference vendors jacobgil/pytorch-grad-cam and exports a family of CAM
methods (pytorch_grad_cam/__init__.py) of which WeCLIP's live path uses only
GradCAM (SURVEY §2.2).  This module provides the same method surface as pure
functions over the shared vjp plumbing in cam/gradcam.py — one forward +
linearization per image, per-method weighting rules:

- grad_cam:       w_c = mean_p g[p, c]                   (grad_cam.py:16-23)
- grad_cam_pp:    GradCAM++ alpha-weighted ReLU grads    (grad_cam_plusplus.py)
- xgrad_cam:      w_c = sum_p g[p,c] * a[p,c] / sum a    (xgrad_cam.py)
- layer_cam:      cam = sum_c ReLU(g) * a (spatial)      (layer_cam.py)
- eigen_cam:      first right-singular projection of a   (eigen_cam.py)
- eigen_grad_cam: eigen on g * a                          (eigen_grad_cam.py)

All return min-max normalized (C, P) maps like the reference's
scale_cam_image epilogue (utils/image.py:51-61).  Score-CAM and the ablation
variants perturb inputs per class channel — expressible as an extra batched
forward; provided for completeness via ``score_cam``.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from weclip_tpu.cam.gradcam import _image_text_probs, _minmax_valid
from weclip_tpu.core import precision
from weclip_tpu.core.config import ClipConfig
from weclip_tpu.models.clip import vit


def _acts_and_grads(visual_params, logit_scale, x11, text_features,
                    text_mask, valid, class_idx, cfg, policy):
    """Shared plumbing: returns (acts (L,D), grads (C,L,D), probs)."""
    block11 = jax.tree_util.tree_map(lambda a: a[cfg.vision_layers - 1],
                                     visual_params["blocks"])
    p = {"ln_post": visual_params["ln_post"], "proj": visual_params["proj"],
         "logit_scale": logit_scale}
    a0 = vit.layer_norm(x11, block11["ln_1"]["g"], block11["ln_1"]["b"])

    def head_fn(a):
        x_out, _ = vit.block_forward_from_ln1(
            block11, x11[None], a[None], cfg.vision_heads,
            valid=valid[None], policy=policy)
        return _image_text_probs(p, x_out[0], text_features, text_mask,
                                 valid, policy)

    probs, pullback = jax.vjp(head_fn, a0)
    seeds = jax.nn.one_hot(class_idx, text_features.shape[0],
                           dtype=probs.dtype)
    grads = jax.vmap(lambda s: pullback(s)[0])(seeds)
    return a0, grads, probs


def _pe(x11: jax.Array, num_patches: int | None) -> int:
    """End of the CLS+patches block: 1 + P.  ``num_patches`` is the padded
    GRID patch count when x11 is stream-padded (vit.VisionFeatures);
    None = x11 is exactly (1 + P, D).  One definition for every engine so
    the stream-padding contract cannot drift between methods."""
    return 1 + (num_patches if num_patches is not None else x11.shape[0] - 1)


def _finish(cam: jax.Array, valid: jax.Array) -> jax.Array:
    cam = jnp.maximum(cam, 0.0)
    return jax.vmap(lambda c: _minmax_valid(c, valid[1:].astype(bool)))(cam)


def grad_cam(acts, grads, valid):
    pm = valid[1:].astype(jnp.float32)
    w = jnp.sum(grads[:, 1:] * pm[None, :, None], 1) / jnp.maximum(pm.sum(), 1.0)
    return jnp.einsum("cd,pd->cp", w, acts[1:])


def grad_cam_pp(acts, grads, valid):
    """GradCAM++ (grad_cam_plusplus.py:20-33): alpha = g^2 / (2 g^2 +
    (sum_p a) * g^3 + 1e-6), zeroed where g == 0; w = sum_p ReLU(g) * alpha."""
    g = grads[:, 1:]
    a = acts[1:][None]
    pm = valid[1:].astype(jnp.float32)[None, :, None]
    g2, g3 = g * g, g * g * g
    sum_a = jnp.sum(a * pm, axis=1, keepdims=True)      # (1, 1, D)
    denom = 2.0 * g2 + sum_a * g3 + 1e-6
    alpha = jnp.where(g != 0.0, g2 / denom, 0.0)
    w = jnp.sum(alpha * jnp.maximum(g, 0.0) * pm, axis=1)
    return jnp.einsum("cd,pd->cp", w, acts[1:])


def xgrad_cam(acts, grads, valid):
    """XGradCAM: w = sum_p g*a / (sum_p a + eps)."""
    a = acts[1:][None]
    pm = valid[1:].astype(jnp.float32)[None, :, None]
    num = jnp.sum(grads[:, 1:] * a * pm, axis=1)
    den = jnp.sum(a * pm, axis=1) + 1e-7
    w = num / den
    return jnp.einsum("cd,pd->cp", w, acts[1:])


def layer_cam(acts, grads, valid):
    """LayerCAM: cam_p = sum_d ReLU(g[p,d]) * a[p,d]."""
    return jnp.sum(jnp.maximum(grads[:, 1:], 0.0) * acts[1:][None], axis=-1)


def eigen_cam(acts, grads, valid):
    """EigenCAM: projection onto the first right-singular vector of acts
    (svd_on_activations.py) — gradient-free; same map for every class."""
    pm = valid[1:].astype(jnp.float32)
    a = acts[1:] * pm[:, None]
    a = a - jnp.mean(a, axis=0, keepdims=True)
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    proj = a @ vt[0]
    return jnp.broadcast_to(proj[None], (grads.shape[0], proj.shape[0]))


def eigen_grad_cam(acts, grads, valid):
    pm = valid[1:].astype(jnp.float32)

    def one(g):
        a = acts[1:] * g * pm[:, None]
        a = a - jnp.mean(a, axis=0, keepdims=True)
        _, _, vt = jnp.linalg.svd(a, full_matrices=False)
        return a @ vt[0]

    return jax.vmap(one)(grads[:, 1:])


_WEIGHTED: Dict[str, Callable] = {
    "grad_cam": grad_cam,
    "grad_cam_pp": grad_cam_pp,
    "xgrad_cam": xgrad_cam,
    "layer_cam": layer_cam,
    "eigen_cam": eigen_cam,
    "eigen_grad_cam": eigen_grad_cam,
}


def cam_single(method: str, visual_params, logit_scale, x11, text_features,
               text_mask, valid, class_idx, cfg: ClipConfig,
               policy: precision.Policy = precision.DEFAULT,
               num_patches: int = None):
    """Compute CAMs (C, P) for one image with the chosen method.

    ``num_patches`` (static) is the padded-GRID patch count P when ``x11``
    comes stream-padded from vit.vision_forward_frozen (Ls > 1 + P) — same
    contract as cam/gradcam.py: the forward runs on the full stream, the
    CAM assembly slices back to (C, P).  None = x11 is exactly (1+P, D)."""
    if method == "score_cam":
        return score_cam(visual_params, logit_scale, x11, text_features,
                         text_mask, valid, class_idx, cfg, policy,
                         num_patches=num_patches)
    if method == "ablation_cam":
        return ablation_cam(visual_params, logit_scale, x11, text_features,
                            text_mask, valid, class_idx, cfg, policy,
                            num_patches=num_patches)
    acts, grads, _ = _acts_and_grads(visual_params, logit_scale, x11,
                                     text_features, text_mask, valid,
                                     class_idx, cfg, policy)
    pe = _pe(x11, num_patches)
    acts, grads, valid = acts[:pe], grads[:, :pe], valid[:pe]
    return _finish(_WEIGHTED[method](acts, grads, valid), valid)


def _perturb_setup(visual_params, logit_scale, x11, text_features, text_mask,
                   valid, cfg, policy, top_channels):
    """Shared plumbing for the perturbation CAMs: ln_1 activations, the
    re-scoring closure, and the channel set (all D channels when
    ``top_channels`` is None, else the top-k by activation energy)."""
    block11 = jax.tree_util.tree_map(lambda a: a[cfg.vision_layers - 1],
                                     visual_params["blocks"])
    p = {"ln_post": visual_params["ln_post"], "proj": visual_params["proj"],
         "logit_scale": logit_scale}
    a0 = vit.layer_norm(x11, block11["ln_1"]["g"], block11["ln_1"]["b"])

    if top_channels is None:
        chans = jnp.arange(a0.shape[1], dtype=jnp.int32)
    else:
        energy = jnp.sum(jnp.abs(a0[1:]), axis=0)
        chans = jnp.argsort(-energy)[:top_channels]

    def probs_of(a):
        x_out, _ = vit.block_forward_from_ln1(
            block11, x11[None], a[None], cfg.vision_heads,
            valid=valid[None], policy=policy)
        return _image_text_probs(p, x_out[0], text_features, text_mask,
                                 valid, policy)

    return a0, chans, probs_of


def _chunked_scores(fn, chans: jax.Array, chunk: int = 32) -> jax.Array:
    """vmap(fn) over channels in lax.map'd chunks: full-channel runs (768
    forwards) stay within memory instead of materializing one giant vmap."""
    n = chans.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    padded = jnp.pad(chans, (0, n_pad - n))
    groups = padded.reshape(n_pad // chunk, chunk)
    out = jax.lax.map(lambda g: jax.vmap(fn)(g), groups)
    return out.reshape(n_pad, -1)[:n]


def score_cam(visual_params, logit_scale, x11, text_features, text_mask,
              valid, class_idx, cfg: ClipConfig,
              policy: precision.Policy = precision.DEFAULT,
              top_channels: int | None = None,
              num_patches: int = None):
    """ScoreCAM (score_cam.py surface): re-score the model with
    activation-masked inputs, softmax the class scores into channel weights.

    The upstream class cannot run against the reference's list-input CLIP
    (score_cam.py:31 does input_tensor.shape on a list — proven in
    tests/test_cam_variants_na.py), so this is a TPU-native adaptation: the
    perturbation applies to the GradCAM target layer's activation space
    (ln_1 of block 11) rather than the image.  Default scores ALL channels
    like the upstream loop; ``top_channels`` is the flagged fast mode
    (energy-ranked top-k)."""
    a0, chans, probs_of = _perturb_setup(
        visual_params, logit_scale, x11, text_features, text_mask, valid,
        cfg, policy, top_channels)

    vmask = valid.astype(bool)

    def channel_score(d):
        m = a0[:, d]
        # min/max over VALID rows only: stream-padded zero rows must not
        # shift the normalization (identical for exact-length inputs)
        big = jnp.float32(3.4e38)
        mmin = jnp.min(jnp.where(vmask, m, big))
        mmax = jnp.max(jnp.where(vmask, m, -big))
        m = (m - mmin) / (mmax - mmin + 1e-7)
        return probs_of(a0 * m[:, None])

    scores = _chunked_scores(channel_score, chans)        # (K, T)
    w = jax.nn.softmax(scores[:, class_idx], axis=0)      # (K, C)
    pe = _pe(x11, num_patches)
    cam = jnp.einsum("kc,pk->cp", w, a0[1:pe][:, chans])
    return _finish(cam, valid[:pe])


def ablation_cam(visual_params, logit_scale, x11, text_features, text_mask,
                 valid, class_idx, cfg: ClipConfig,
                 policy: precision.Policy = precision.DEFAULT,
                 top_channels: int | None = None,
                 num_patches: int = None):
    """AblationCAM (ablation_cam.py surface): weight = (score - score with
    the channel zeroed) / score.

    Same adaptation story as :func:`score_cam` (the upstream class crashes
    on the list-input CLIP — tests/test_cam_variants_na.py): ablation
    happens in the target layer's activation space; all channels by
    default, energy-ranked top-k via ``top_channels``."""
    a0, chans, probs_of = _perturb_setup(
        visual_params, logit_scale, x11, text_features, text_mask, valid,
        cfg, policy, top_channels)

    base = probs_of(a0)                                   # (T,)

    def ablated(d):
        mask = jnp.ones((a0.shape[1],)).at[d].set(0.0)
        return probs_of(a0 * mask[None, :])

    abl = _chunked_scores(ablated, chans)                 # (K, T)
    w = ((base[None, :] - abl) / (base[None, :] + 1e-7))[:, class_idx]  # (K,C)
    pe = _pe(x11, num_patches)
    cam = jnp.einsum("kc,pk->cp", w, a0[1:pe][:, chans])
    return _finish(cam, valid[:pe])
