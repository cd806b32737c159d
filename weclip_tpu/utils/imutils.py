"""Image utilities: VOC colormap encoding, denormalization, and the
TensorBoard grid renderers (parity: utils/imutils.py:7-133,136-154).

The renderers replace the reference's torchvision.make_grid + torch
interpolate pipeline with pure numpy (tiling) + the framework's own
bilinear resize semantics; matplotlib supplies the jet/viridis LUTs with
a closed-form jet fallback when it is absent."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def promote_rgb(img: np.ndarray) -> np.ndarray:
    """Promote grayscale to 3-channel and drop any alpha channel
    (reference robust_read_image, datasets/coco.py:20-25)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3]


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


# ---------------------------------------------------------------------------
# TensorBoard grid renderers (imutils.py:26-133)
# ---------------------------------------------------------------------------

def _apply_cmap(x: np.ndarray, name: str) -> np.ndarray:
    """(..., H, W) in [0,1] -> (..., H, W, 3) float RGB in [0,255]."""
    try:
        import matplotlib
        rgb = matplotlib.colormaps[name](np.asarray(x, np.float32))[..., :3]
        return rgb * 255.0
    except Exception:
        # closed-form jet-like fallback
        v = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
        r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
        g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
        b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
        return np.stack([r, g, b], -1) * 255.0


def _resize_chw(x: np.ndarray, h: int, w: int,
                align_corners: bool = False) -> np.ndarray:
    """(B, C, H, W) bilinear resize on host via the framework's resize op."""
    import jax
    import jax.numpy as jnp
    from weclip_tpu.ops.resize import resize_bilinear
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        b, c = x.shape[:2]
        flat = jnp.asarray(x.reshape(b * c, *x.shape[2:]), jnp.float32)
        out = resize_bilinear(flat, h, w, align_corners=align_corners)
        return np.asarray(out).reshape(b, c, h, w)


def make_grid(imgs: np.ndarray, nrow: int = 2, padding: int = 2) -> np.ndarray:
    """(B, 3, H, W) uint8 -> one (3, H', W') uint8 tile grid
    (torchvision.utils.make_grid behavior at imutils.py:30,38)."""
    b, c, h, w = imgs.shape
    ncol = nrow                       # torchvision's nrow = images per row
    nrows = (b + ncol - 1) // ncol
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.zeros((c, gh, gw), np.uint8)
    for i in range(b):
        r, cc = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + cc * (w + padding)
        grid[:, y:y + h, x:x + w] = imgs[i]
    return grid


def tensorboard_image(imgs: np.ndarray, cam: np.ndarray,
                      nrow: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Denormalized image grid + jet CAM-overlay grid (imutils.py:26-40).

    imgs: (B, 3, H, W) normalized;  cam: (B, C, h, w) CAM scores."""
    _imgs = np.stack([denormalize_img(im) for im in imgs])
    cam_up = _resize_chw(np.asarray(cam, np.float32),
                         _imgs.shape[2], _imgs.shape[3])
    cam_max = cam_up.max(axis=1)                          # (B, H, W)
    heat = _apply_cmap(cam_max, "jet")                    # (B, H, W, 3)
    blend = heat.transpose(0, 3, 1, 2) * 0.5 + _imgs * 0.5
    return (make_grid(_imgs, nrow),
            make_grid(np.clip(blend, 0, 255).astype(np.uint8), nrow))


def tensorboard_edge(edge: np.ndarray, n_row: int = 2,
                     size: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """Viridis-colored edge/score map grid (imutils.py:42-51)."""
    e = _resize_chw(np.asarray(edge, np.float32), *size)[:, 0]
    heat = _apply_cmap(e, "viridis").transpose(0, 3, 1, 2)
    return make_grid(heat.astype(np.uint8), n_row)


def tensorboard_attn(attns: Sequence[np.ndarray],
                     size: Tuple[int, int] = (224, 224),
                     n_pix: float = 0.0, n_row: int = 4) -> np.ndarray:
    """Per-layer attention-row visualizations (imutils.py:54-85): for each
    (B, HW, HW) attention, take the row of the pixel at relative position
    ``n_pix``, reshape to (h, w), upsample (align_corners=True upstream),
    min-max normalize per image, viridis-color, tile."""
    tiles: List[np.ndarray] = []
    for attn in attns:
        b, hw, _ = attn.shape
        h = w = int(np.sqrt(hw))
        row = int(h * n_pix) * (w + 1)
        a = np.asarray(attn[:, row, :], np.float32).reshape(b, 1, h, w)
        a = _resize_chw(a, *size, align_corners=True)[:, 0]
        lo = a.min(axis=(1, 2), keepdims=True)
        a = a - lo
        a = a / np.maximum(a.max(axis=(1, 2), keepdims=True), 1e-12)
        tiles.append(_apply_cmap(a, "viridis").transpose(0, 3, 1, 2))
    stack = np.concatenate(tiles, axis=0).astype(np.uint8)
    return make_grid(stack, n_row)


def tensorboard_attn2(attns: Sequence[np.ndarray],
                      size: Tuple[int, int] = (224, 224),
                      n_pixs: Sequence[float] = (0.0, 0.3, 0.6, 0.9),
                      n_row: int = 4,
                      with_attn_pred: bool = True) -> List[np.ndarray]:
    """Multi-anchor-pixel variant (imutils.py:87-124): renders the top
    layers and the last layers at each relative pixel in ``n_pixs``."""
    if with_attn_pred:
        top, last = list(attns[:-3]), list(attns[-3:-1])
        top = top + [attns[-1]]
    else:
        top, last = list(attns[:-2]), list(attns[-2:])
    grids = [tensorboard_attn(top, size, p, n_row) for p in n_pixs]
    grids += [tensorboard_attn(last, size, p, 2 * n_row) for p in n_pixs]
    return grids


def tensorboard_label(labels: np.ndarray, nrow: int = 2) -> np.ndarray:
    """VOC-colormapped label grid (imutils.py:125-133)."""
    lab = np.asarray(labels)
    if lab.ndim == 2:
        lab = lab[None]
    rgb = np.stack([encode_cmap(l) for l in lab]).transpose(0, 3, 1, 2)
    return make_grid(rgb, nrow)
