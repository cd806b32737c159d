"""Sinkhorn transition matrix + attention fusion vs torch reference
(clip_tool.py:64-80,152-176)."""

import numpy as np
import torch

import jax.numpy as jnp

from weclip_tpu.refine import affinity as aff


def torch_compute_trans_mat(attn_weight):
    # clip_tool.py:64-80
    trans_mat = attn_weight / torch.sum(attn_weight, dim=0, keepdim=True)
    trans_mat = trans_mat / torch.sum(trans_mat, dim=1, keepdim=True)
    for _ in range(2):
        trans_mat = trans_mat / torch.sum(trans_mat, dim=0, keepdim=True)
        trans_mat = trans_mat / torch.sum(trans_mat, dim=1, keepdim=True)
    trans_mat = (trans_mat + trans_mat.transpose(1, 0)) / 2
    for _ in range(1):
        trans_mat = torch.matmul(trans_mat, trans_mat)
    return trans_mat


def test_sinkhorn_matches_torch(rng):
    p = 25
    a = rng.uniform(0.01, 1.0, (p, p)).astype(np.float32)
    ours = np.asarray(aff.sinkhorn_transition(jnp.asarray(a),
                                              jnp.ones((p,), bool)))
    ref = torch_compute_trans_mat(torch.from_numpy(a)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_sinkhorn_padded_equals_compact(rng):
    p, pv = 16, 10
    a = np.zeros((p, p), np.float32)
    a[:pv, :pv] = rng.uniform(0.01, 1.0, (pv, pv)).astype(np.float32)
    valid = np.zeros((p,), bool)
    valid[:pv] = True
    ours = np.asarray(aff.sinkhorn_transition(jnp.asarray(a), jnp.asarray(valid)))
    ref = np.asarray(aff.sinkhorn_transition(jnp.asarray(a[:pv, :pv]),
                                             jnp.ones((pv,), bool)))
    np.testing.assert_allclose(ours[:pv, :pv], ref, rtol=1e-5, atol=1e-7)
    assert np.all(ours[pv:] == 0) and np.all(ours[:, pv:] == 0)


def torch_fuse_plain(attn_list, attn_last, n_fuse):
    w = torch.cat([attn_list, attn_last], dim=0)
    w = w[:, 1:, 1:][-n_fuse:]
    return torch.mean(w, dim=0)


def torch_fuse_gated(attn_list, attn_last, seg_attn, n_window):
    attn_weight = torch.cat([attn_list, attn_last], dim=0)
    attn_weight = attn_weight[:, 1:, 1:][-n_window:]
    attn_diff = seg_attn - attn_weight
    attn_diff = torch.sum(attn_diff.flatten(1), dim=1)
    diff_th = torch.mean(attn_diff)
    attn_mask = torch.zeros_like(attn_diff)
    attn_mask[attn_diff <= diff_th] = 1
    attn_mask = attn_mask.reshape(-1, 1, 1).expand_as(attn_weight)
    w = torch.sum(attn_mask * attn_weight, dim=0) / (torch.sum(attn_mask, dim=0) + 1e-5)
    return w * seg_attn.squeeze(0)


def test_fusion_matches_torch(rng):
    k, l = 7, 10
    attn = rng.uniform(0, 1, (k, 1, l, l)).astype(np.float32)
    attn_last = rng.uniform(0, 1, (1, l, l)).astype(np.float32)
    seg_attn = rng.uniform(0, 1, (1, l - 1, l - 1)).astype(np.float32)

    ours_plain = np.asarray(aff.fuse_attention_plain(
        jnp.asarray(attn), jnp.asarray(attn_last), 8))[0]
    ref_plain = torch_fuse_plain(torch.from_numpy(attn[:, 0]),
                                 torch.from_numpy(attn_last), 8).numpy()
    np.testing.assert_allclose(ours_plain, ref_plain, rtol=1e-5, atol=1e-6)

    valid_p = jnp.ones((1, l - 1))
    ours_gated = np.asarray(aff.fuse_attention_gated(
        jnp.asarray(attn), jnp.asarray(attn_last), jnp.asarray(seg_attn),
        6, valid_p))[0]
    ref_gated = torch_fuse_gated(torch.from_numpy(attn[:, 0]),
                                 torch.from_numpy(attn_last),
                                 torch.from_numpy(seg_attn), 6).numpy()
    np.testing.assert_allclose(ours_gated, ref_gated, rtol=1e-4, atol=1e-6)


def test_random_walk_refine(rng):
    # end-to-end: trans @ (box-masked cam) equals dense reference math
    g = 6
    p = g * g
    cam = rng.uniform(0, 1, (2, p)).astype(np.float32)
    cam = cam / cam.max(axis=1, keepdims=True)
    trans = rng.uniform(0, 1, (p, p)).astype(np.float32)
    valid = jnp.ones((g, g), bool)
    out = np.asarray(aff.random_walk_cams(
        jnp.asarray(cam), jnp.asarray(trans), valid,
        jnp.int32(g), jnp.int32(g), 0.4))
    assert out.shape == (2, p)
    assert np.isfinite(out).all()


def test_sinkhorn_walk_matches_reference_math(rng):
    """Independent numpy oracle mirroring clip_tool.py:64-80
    (compute_trans_mat: 3 col/row normalization rounds, symmetrize, one
    self-matmul) and :179-192 (column-box-masked walk, trans @ cam) — the
    earlier walk test only asserted shape/finiteness.  Box masks are
    separately cv2-validated (test_bbox.py), so the oracle may reuse
    scoremap_box_mask."""
    import jax.numpy as jnp
    from weclip_tpu.refine.affinity import (random_walk_cams,
                                            sinkhorn_transition)
    from weclip_tpu.refine.bbox import scoremap_box_mask

    g = 7
    p = g * g
    aff = rng.uniform(0.05, 1.0, (p, p)).astype(np.float32)
    cams = rng.uniform(0.0, 1.0, (3, p)).astype(np.float32)
    thr = 0.4

    # --- reference math, plain numpy (float64 to stand apart) -------------
    t = aff.astype(np.float64)
    for _ in range(3):
        t = t / t.sum(axis=0, keepdims=True)
        t = t / t.sum(axis=1, keepdims=True)
    t = (t + t.T) / 2.0
    t = t @ t
    expected = []
    for c in range(3):
        box = np.asarray(scoremap_box_mask(
            jnp.asarray(cams[c].reshape(g, g)), jnp.ones((g, g), bool),
            jnp.int32(g), jnp.int32(g), thr)).reshape(-1)
        expected.append((t * box[None, :]) @ cams[c])
    expected = np.stack(expected)

    # --- ours --------------------------------------------------------------
    trans = sinkhorn_transition(jnp.asarray(aff), jnp.ones((p,), bool),
                                rounds=3)
    ours = np.asarray(random_walk_cams(jnp.asarray(cams), trans,
                                       jnp.ones((g, g), bool),
                                       jnp.int32(g), jnp.int32(g), thr))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-6)
