"""Image utilities: VOC colormap encoding and denormalization
(parity: utils/imutils.py:7-24,136-154)."""

from __future__ import annotations

import numpy as np


def colormap(n: int = 256) -> np.ndarray:
    """The VOC palette (bit-twiddling generator, imutils.py:136-154)."""
    def bitget(byteval, idx):
        return (byteval & (1 << idx)) != 0

    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r = r | (bitget(c, 0) << (7 - j))
            g = g | (bitget(c, 1) << (7 - j))
            b = b | (bitget(c, 2) << (7 - j))
            c = c >> 3
        cmap[i] = (r, g, b)
    return cmap


_CMAP = colormap()


def encode_cmap(label: np.ndarray) -> np.ndarray:
    """Class-id mask -> RGB visualization (imutils.py:7-9)."""
    return _CMAP[np.asarray(label, np.int64) % 256]


def denormalize_img(img: np.ndarray,
                    mean=(123.675, 116.28, 103.53),
                    std=(58.395, 57.12, 57.375)) -> np.ndarray:
    """(…,3,H,W) normalized -> uint8 RGB (imutils.py:12-24)."""
    arr = np.asarray(img, np.float32)
    out = arr * np.asarray(std, np.float32)[:, None, None] \
        + np.asarray(mean, np.float32)[:, None, None]
    return np.clip(out, 0, 255).astype(np.uint8)


def save_prediction(path: str, pred: np.ndarray, cmap: bool = False) -> None:
    from PIL import Image
    arr = encode_cmap(pred) if cmap else np.asarray(pred, np.uint8)
    Image.fromarray(arr).save(path)
