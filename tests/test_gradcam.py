"""vjp-GradCAM vs a torch autograd oracle reproducing the reference chain:
forward_last_layer (clip/model.py:407-429) + ln_1 hook taps
(activations_and_gradients.py:11-37) + GradCAM weights/normalization
(grad_cam.py:16-23, base_cam.py:116-154, utils/image.py:51-61)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests import tiny
from tests.test_attention_block import TorchBlock, torch_mha_oracle
from weclip_tpu.cam.gradcam import gradcam_single
from weclip_tpu.core import precision


def np_params(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def torch_forward_last_layer(block_p, ln_post_g, ln_post_b, proj, logit_scale,
                             x11, text_features, n_heads):
    """Returns (probs, attn_w, a) with a = ln_1 output (grad-enabled leaf)."""
    x = torch.from_numpy(x11)[None]                     # (1, L, D)
    a = F.layer_norm(x, x.shape[-1:], torch.from_numpy(block_p["ln_1"]["g"]),
                     torch.from_numpy(block_p["ln_1"]["b"]))
    a = a.detach().requires_grad_(True)
    attn_out, attn_w = torch_mha_oracle(
        a, torch.from_numpy(block_p["attn"]["in_w"]),
        torch.from_numpy(block_p["attn"]["in_b"]),
        torch.from_numpy(block_p["attn"]["out_w"]),
        torch.from_numpy(block_p["attn"]["out_b"]), n_heads)
    y = x + attn_out
    z = F.layer_norm(y, y.shape[-1:], torch.from_numpy(block_p["ln_2"]["g"]),
                     torch.from_numpy(block_p["ln_2"]["b"]))
    z = F.linear(z, torch.from_numpy(block_p["mlp"]["fc_w"]),
                 torch.from_numpy(block_p["mlp"]["fc_b"]))
    z = z * torch.sigmoid(1.702 * z)
    z = F.linear(z, torch.from_numpy(block_p["mlp"]["proj_w"]),
                 torch.from_numpy(block_p["mlp"]["proj_b"]))
    out = y + z

    out = F.layer_norm(out, out.shape[-1:], torch.from_numpy(ln_post_g),
                       torch.from_numpy(ln_post_b))
    pooled = out[:, 1:, :].mean(dim=1)
    feat = pooled @ torch.from_numpy(proj)
    feat = feat / feat.norm(dim=1, keepdim=True)
    tf = torch.from_numpy(text_features)
    tf = tf / tf.norm(dim=1, keepdim=True)
    logits = float(np.exp(logit_scale)) * feat @ tf.t()
    probs = logits.softmax(dim=-1)
    return probs, attn_w, a


def minmax(c):
    c = c - c.min()
    return c / (1e-7 + c.max())


def test_gradcam_matches_torch_autograd():
    cfg = tiny.tiny_config()
    frozen, clip_params = tiny.tiny_frozen(cfg)
    fz = np_params(frozen)
    visual = fz["visual"]
    num_fg = cfg.dataset.num_classes - 1
    l = 17                                             # 4x4 grid + CLS
    rng = np.random.default_rng(3)
    x11 = rng.standard_normal((l, cfg.clip.vision_width)).astype(np.float32)
    text = np.concatenate([fz["fg_text"], fz["bg_text"]], 0).astype(np.float32)
    tmask = np.ones((text.shape[0],), bool)
    tmask[1] = False                                   # one absent fg class

    # ours
    cams, attn_last, probs = gradcam_single(
        frozen["visual"], frozen["logit_scale"], jnp.asarray(x11),
        jnp.asarray(text), jnp.asarray(tmask), jnp.ones((l,), bool),
        jnp.arange(num_fg, dtype=jnp.int32), cfg.clip, policy=precision.FP32)

    # torch oracle (masked classes dropped from the softmax set entirely,
    # like the reference's present-classes-only text stack)
    block_p = jax.tree_util.tree_map(
        lambda a: a[cfg.clip.vision_layers - 1], visual["blocks"])
    keep = np.where(tmask)[0]
    t_probs, t_attn, a = torch_forward_last_layer(
        block_p, visual["ln_post"]["g"], visual["ln_post"]["b"],
        visual["proj"], fz["logit_scale"], x11, text[keep],
        cfg.clip.vision_heads)

    # probs parity on the kept set
    ours_kept = np.asarray(probs)[keep]
    np.testing.assert_allclose(ours_kept, t_probs.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn_last), t_attn.detach().numpy()[0],
                               rtol=1e-4, atol=1e-5)

    # per-class CAM parity (present classes only)
    for j, cls in enumerate(keep[keep < num_fg]):
        if a.grad is not None:
            a.grad = None
        t_probs[0, j].backward(retain_graph=True)
        grads = a.grad.numpy()[0]                      # (L, D)
        w = grads[1:].mean(axis=0)                     # spatial mean, CLS dropped
        cam = np.maximum((a.detach().numpy()[0, 1:] * w).sum(-1), 0)
        cam = minmax(cam)
        np.testing.assert_allclose(np.asarray(cams)[cls], cam,
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"class {cls}")
