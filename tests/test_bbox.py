"""On-device box masks vs the reference's OpenCV pipeline
(clip/utils.py:115-142 + clip_tool.py:179-186)."""

import cv2
import numpy as np

import jax.numpy as jnp

from weclip_tpu.refine.bbox import connected_components, scoremap_box_mask


def cv2_box_mask(scoremap: np.ndarray, threshold: float) -> np.ndarray:
    """Exact reference behavior: threshold, findContours, union of clipped
    bounding rects painted as mask[y0:y1, x0:x1]."""
    height, width = scoremap.shape
    image = np.expand_dims((scoremap * 255).astype(np.uint8), 2)
    _, thr = cv2.threshold(image, int(threshold * np.max(image)), 255,
                           cv2.THRESH_BINARY)
    contours = cv2.findContours(thr, cv2.RETR_TREE,
                                cv2.CHAIN_APPROX_SIMPLE)[-2]
    mask = np.zeros((height, width), np.float32)
    if len(contours) == 0:
        return mask
    for contour in contours:
        x, y, w, h = cv2.boundingRect(contour)
        x0, y0 = x, y
        x1 = min(x + w, width - 1)
        y1 = min(y + h, height - 1)
        mask[y0:y1, x0:x1] = 1
    return mask


def test_connected_components_basic():
    grid = np.zeros((6, 6), bool)
    grid[0, 0] = True
    grid[1, 1] = True          # diagonal -> same component (8-connectivity)
    grid[4, 4] = True
    labels = np.asarray(connected_components(jnp.asarray(grid)))
    assert labels[0, 0] == labels[1, 1] == 0
    assert labels[4, 4] == 28
    assert labels[2, 2] == 36  # sentinel


def test_box_mask_matches_cv2(rng):
    g = 20
    valid = jnp.ones((g, g), bool)
    for trial in range(12):
        cam = rng.uniform(0, 1, (g, g)).astype(np.float32)
        # make blobby structure
        cam = cv2.GaussianBlur(cam, (5, 5), 2.0)
        cam = (cam - cam.min()) / (cam.max() - cam.min() + 1e-7)
        ours = np.asarray(scoremap_box_mask(jnp.asarray(cam), valid,
                                            jnp.int32(g), jnp.int32(g), 0.4))
        ref = cv2_box_mask(cam, 0.4)
        np.testing.assert_array_equal(ours, ref, err_msg=f"trial {trial}")


def test_box_mask_empty():
    g = 8
    cam = np.zeros((g, g), np.float32)
    ours = np.asarray(scoremap_box_mask(jnp.asarray(cam), jnp.ones((g, g), bool),
                                        jnp.int32(g), jnp.int32(g), 0.4))
    assert ours.sum() == 0


def test_box_mask_padded_region(rng):
    """The padded grid must reproduce what the unpadded grid computes."""
    gh, gw, g = 5, 7, 10
    cam_small = rng.uniform(0, 1, (gh, gw)).astype(np.float32)
    cam_small = (cam_small - cam_small.min()) / (cam_small.max() - cam_small.min())
    cam_pad = np.zeros((g, g), np.float32)
    cam_pad[:gh, :gw] = cam_small
    valid = np.zeros((g, g), bool)
    valid[:gh, :gw] = True

    ours = np.asarray(scoremap_box_mask(jnp.asarray(cam_pad), jnp.asarray(valid),
                                        jnp.int32(gh), jnp.int32(gw), 0.4))
    ref = cv2_box_mask(cam_small, 0.4)
    np.testing.assert_array_equal(ours[:gh, :gw], ref)
    assert ours[gh:, :].sum() == 0 and ours[:, gw:].sum() == 0
