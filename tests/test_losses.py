"""Losses + affinity labels vs torch reference semantics
(scripts/dist_clip_voc.py:105-133, utils/losses.py:11-22,
utils/camutils.py:226-247)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from weclip_tpu.train import losses


def torch_seg_loss(pred, label, ignore_index=255):
    bg_label = label.clone()
    bg_label[label != 0] = ignore_index
    bg_loss = F.cross_entropy(pred, bg_label.long(), ignore_index=ignore_index)
    fg_label = label.clone()
    fg_label[label == 0] = ignore_index
    fg_loss = F.cross_entropy(pred, fg_label.long(), ignore_index=ignore_index)
    return (bg_loss + fg_loss) * 0.5


def torch_aff_loss(inputs, targets):
    pos_label = (targets == 1).short()
    pos_count = pos_label.sum() + 1
    neg_label = (targets == 0).short()
    neg_count = neg_label.sum() + 1
    pos_loss = torch.sum(pos_label * (1 - inputs)) / pos_count
    neg_loss = torch.sum(neg_label * inputs) / neg_count
    return 0.5 * pos_loss + 0.5 * neg_loss


def torch_aff_label(cam_label, mask, ignore_index=255):
    b, h, w = cam_label.shape
    lab = F.interpolate(cam_label.unsqueeze(1).float(),
                        size=[h // 16, w // 16], mode="nearest")
    _l = lab.reshape(b, 1, -1)
    rep = _l.repeat([1, _l.shape[-1], 1])
    rep_t = rep.permute(0, 2, 1)
    aff = (rep == rep_t).long()
    for i in range(b):
        if mask is not None:
            aff[i, mask == 0] = ignore_index
        aff[i, :, rep[i, 0, :] == ignore_index] = ignore_index
        aff[i, rep[i, 0, :] == ignore_index, :] = ignore_index
    return aff


def test_seg_loss_matches_torch(rng):
    logits = rng.standard_normal((2, 6, 32, 32)).astype(np.float32)
    label = rng.integers(0, 6, (2, 32, 32)).astype(np.int32)
    label[0, :4] = 255
    ours = float(losses.seg_loss(jnp.asarray(logits), jnp.asarray(label)))
    ref = float(torch_seg_loss(torch.from_numpy(logits),
                               torch.from_numpy(label)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_aff_loss_matches_torch(rng):
    pred = rng.uniform(0, 1, (2, 16, 16)).astype(np.float32)
    target = rng.choice([0, 1, 255], (2, 16, 16)).astype(np.int32)
    ours, _, _ = losses.aff_loss(jnp.asarray(pred), jnp.asarray(target))
    ref = float(torch_aff_loss(torch.from_numpy(pred),
                               torch.from_numpy(target)))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


def test_aff_label_matches_torch(rng):
    b, hw = 2, 64
    label = rng.integers(0, 4, (b, hw, hw)).astype(np.int32)
    label[0, :8] = 255
    mask = losses.radius_mask(4, 4, radius=1)
    ours = np.asarray(losses.cams_to_affinity_label(
        jnp.asarray(label), jnp.asarray(mask)))
    ref = torch_aff_label(torch.from_numpy(label),
                          torch.from_numpy(mask)).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_radius_mask_matches_reference():
    # oracle: dist_clip_voc.py:116-133 double loop
    def ref_mask(h, w, radius):
        hw = h * w
        mask = np.zeros((hw, hw))
        for i in range(hw):
            _h, _w = i // w, i % w
            for i1 in range(max(0, _h - radius), min(h, _h + radius + 1)):
                for i2 in range(max(0, _w - radius), min(w, _w + radius + 1)):
                    j = i1 * w + i2
                    mask[i, j] = 1
                    mask[j, i] = 1
        return mask

    for h, w, r in [(5, 5, 2), (4, 6, 8), (20, 20, 8)]:
        np.testing.assert_array_equal(losses.radius_mask(h, w, r),
                                      ref_mask(h, w, r))
