"""PAR refinement vs a torch oracle reproducing WeCLIP_model/PAR.py."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from weclip_tpu.core.config import ParConfig
from weclip_tpu.refine.par import par_refine


def torch_par_oracle(imgs, masks, dilations, num_iter, w1=0.3, w2=0.01):
    """Reference PAR semantics (PAR.py:26-92): 8 neighbors per dilation via
    grouped conv on replicate-padded input; affinity = softmax over neighbors
    of appearance + 0.01 * softmax of position distances; Jacobi iterations."""
    kernel = torch.zeros(8, 1, 3, 3)
    pos_k = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
    for i, (r, c) in enumerate(pos_k):
        kernel[i, 0, r, c] = 1

    def neighbors(x):
        b, c, h, w = x.shape
        outs = []
        for d in dilations:
            xp = F.pad(x, [d] * 4, mode="replicate")
            xp = xp.reshape(b * c, 1, xp.shape[-2], xp.shape[-1])
            out = F.conv2d(xp, kernel, dilation=d).view(b, c, 8, h, w)
            outs.append(out)
        return torch.cat(outs, dim=2)

    imgs = F.interpolate(imgs, size=masks.shape[-2:], mode="bilinear",
                         align_corners=True)
    b, c, h, w = imgs.shape
    _imgs = neighbors(imgs)
    ker = torch.ones(1, 1, 8, 1, 1)
    for i in (0, 2, 5, 7):
        ker[0, 0, i] = np.sqrt(2)
    pos = torch.cat([ker * d for d in dilations], dim=2)

    _imgs_rep = imgs.unsqueeze(2).repeat(1, 1, _imgs.shape[2], 1, 1)
    _pos_rep = pos.repeat(b, 1, 1, h, w)
    _imgs_abs = torch.abs(_imgs - _imgs_rep)
    _imgs_std = torch.std(_imgs, dim=2, keepdim=True)
    _pos_std = torch.std(_pos_rep, dim=2, keepdim=True)

    aff = -((_imgs_abs / (_imgs_std + 1e-8) / w1) ** 2)
    aff = aff.mean(dim=1, keepdim=True)
    pos_aff = -((_pos_rep / (_pos_std + 1e-8) / w1) ** 2)
    aff = F.softmax(aff, dim=2) + w2 * F.softmax(pos_aff, dim=2)

    for _ in range(num_iter):
        _masks = neighbors(masks)
        masks = (_masks * aff).sum(2)
    return masks


def test_par_matches_torch(rng):
    cfg = ParConfig(dilations=(1, 2, 4), num_iter=5)
    imgs = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    masks = rng.uniform(0, 1, (2, 4, 24, 24)).astype(np.float32)

    ours = np.asarray(par_refine(jnp.asarray(imgs), jnp.asarray(masks), cfg))
    ref = torch_par_oracle(torch.from_numpy(imgs), torch.from_numpy(masks),
                           cfg.dilations, cfg.num_iter).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_par_full_dilations(rng):
    cfg = ParConfig()          # (1,2,4,8,12,24) x 20 iters — reference setup
    imgs = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    masks = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    ours = np.asarray(par_refine(jnp.asarray(imgs), jnp.asarray(masks), cfg))
    ref = torch_par_oracle(torch.from_numpy(imgs), torch.from_numpy(masks),
                           cfg.dilations, cfg.num_iter).numpy()
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)
