"""OpenAI CLIP checkpoint → JAX pytree loader.

Mirrors the reference's ``clip.load``/``build_model`` behavior
(clip/clip.py:95-150, clip/model.py:481-529): accepts either a TorchScript
archive or a plain state_dict, strips ``module.`` prefixes, infers the ViT
architecture from tensor shapes, and (unlike the fp16-converting reference,
clip/model.py:457-478) upcasts everything to fp32 — the TPU precision policy
downcasts to bf16 at compute time instead.

torch is used only as a host-side deserializer; no torch ops run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np

from weclip_tpu.core.config import ClipConfig


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy(), dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]                      # clip/clip.py:140-143
        if hasattr(v, "detach"):
            out[k] = _to_np(v)
    return out


def infer_config(sd: Dict[str, np.ndarray], base: ClipConfig = None) -> ClipConfig:
    """Shape-driven architecture inference (clip/model.py:493-513)."""
    base = base or ClipConfig()
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len([k for k in sd
                         if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")])
    patch = sd["visual.conv1.weight"].shape[-1]
    embed_dim = sd["text_projection"].shape[1]
    tw = sd["ln_final.weight"].shape[0]
    tlayers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")})
    return dataclasses.replace(
        base,
        vision_width=vision_width, vision_layers=vision_layers,
        vision_heads=vision_width // 64, patch_size=patch,
        embed_dim=embed_dim, context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=tw, transformer_heads=tw // 64,
        transformer_layers=tlayers,
    )


def _block_params(sd: Dict[str, np.ndarray], prefix: str, n: int) -> Dict[str, Any]:
    def stack(fmt):
        return np.stack([sd[fmt.format(i)] for i in range(n)])
    return {
        "ln_1": {"g": stack(prefix + ".{}.ln_1.weight"),
                 "b": stack(prefix + ".{}.ln_1.bias")},
        "attn": {"in_w": stack(prefix + ".{}.attn.in_proj_weight"),
                 "in_b": stack(prefix + ".{}.attn.in_proj_bias"),
                 "out_w": stack(prefix + ".{}.attn.out_proj.weight"),
                 "out_b": stack(prefix + ".{}.attn.out_proj.bias")},
        "ln_2": {"g": stack(prefix + ".{}.ln_2.weight"),
                 "b": stack(prefix + ".{}.ln_2.bias")},
        "mlp": {"fc_w": stack(prefix + ".{}.mlp.c_fc.weight"),
                "fc_b": stack(prefix + ".{}.mlp.c_fc.bias"),
                "proj_w": stack(prefix + ".{}.mlp.c_proj.weight"),
                "proj_b": stack(prefix + ".{}.mlp.c_proj.bias")},
    }


def params_from_state_dict(sd: Dict[str, np.ndarray],
                           cfg: ClipConfig) -> Dict[str, Any]:
    visual = {
        "conv1_w": sd["visual.conv1.weight"],
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {"g": sd["visual.ln_pre.weight"], "b": sd["visual.ln_pre.bias"]},
        "blocks": _block_params(sd, "visual.transformer.resblocks", cfg.vision_layers),
        "ln_post": {"g": sd["visual.ln_post.weight"], "b": sd["visual.ln_post.bias"]},
        "proj": sd["visual.proj"],
    }
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": _block_params(sd, "transformer.resblocks", cfg.transformer_layers),
        "ln_final": {"g": sd["ln_final.weight"], "b": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    return {"visual": visual, "text": text,
            "logit_scale": np.asarray(sd["logit_scale"], np.float32)}


# Published OpenAI checkpoint URLs; the sha256 of each file is the
# second-to-last URL path segment (clip/clip.py:30-41).  Only the ViT
# entries are loadable by this (ViT-only) framework; the table mirrors the
# full ``clip.available_models`` surface.
MODEL_URLS = {
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models():
    """Names accepted by ``download_checkpoint`` (clip/clip.py:91-93)."""
    return list(MODEL_URLS)


def is_fetchable(path: str) -> bool:
    """True when ``path`` names a downloadable checkpoint: a MODEL_URLS key
    or an http(s) URL.  Single source of truth for callers that decide
    between fetching and local-file/random-init fallbacks."""
    return bool(path) and (path in MODEL_URLS
                           or path.startswith(("http://", "https://")))


def download_checkpoint(name_or_url: str, root: str = None,
                        expected_sha256: str = None) -> str:
    """sha256-verified checkpoint fetch (reference clip/clip.py:44-73).

    ``name_or_url``: a key of MODEL_URLS (e.g. "ViT-B/16") or a direct URL.
    OpenAI catalog URLs embed their digest as the second-to-last path
    segment and are always verified; for other hosts pass
    ``expected_sha256`` — without it the download is used unverified (with
    a warning) rather than failing against a bogus path segment.
    Returns the local file path; an existing file with a matching digest
    (or any existing file, when unverified) is reused without
    re-downloading.
    """
    import hashlib
    import logging
    import os
    import urllib.request

    url = MODEL_URLS.get(name_or_url, name_or_url)
    root = root or os.path.expanduser("~/.cache/weclip_tpu")
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    digest = expected_sha256
    if digest is None and url in MODEL_URLS.values():
        digest = url.split("/")[-2]          # OpenAI URL convention
    if digest is None:
        logging.getLogger("weclip_tpu").warning(
            "no sha256 provided for checkpoint URL %s — the download will "
            "NOT be verified (set ClipConfig.pretrained_sha256)", url)

    def _file_sha256(p):
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    if os.path.isfile(target) and (digest is None
                                   or _file_sha256(target) == digest):
        return target
    tmp = target + ".part"
    h = hashlib.sha256()
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            h.update(buf)
            out.write(buf)
    if digest is not None and h.hexdigest() != digest:
        os.remove(tmp)
        raise RuntimeError(
            f"checkpoint download from {url} failed sha256 verification "
            f"(got {h.hexdigest()}, expected {digest})")
    os.replace(tmp, target)
    return target


def load_clip(path: str, base: ClipConfig = None,
              download_root: str = None,
              expected_sha256: str = None) -> Tuple[Dict[str, Any], ClipConfig]:
    """``path`` may be a local file, a MODEL_URLS name, or an http(s) URL —
    the latter two are fetched via ``download_checkpoint``."""
    import os
    if is_fetchable(path):
        path = download_checkpoint(path, root=download_root,
                                   expected_sha256=expected_sha256)
    elif not os.path.exists(path):
        raise FileNotFoundError(
            f"CLIP checkpoint {path!r} not found (pass a local file, a "
            f"model name from {available_models()}, or a URL)")
    sd = load_torch_state_dict(path)
    cfg = infer_config(sd, base)
    return params_from_state_dict(sd, cfg), cfg


CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(image: np.ndarray, n_px: int = 224) -> np.ndarray:
    """The canonical CLIP input transform (clip/clip.py:79-86 ``_transform``:
    bicubic short-side resize, center crop, CLIP-stats normalization).

    WeCLIP's own pipelines deliberately use ImageNet normalization instead
    (transforms.py:8-15 quirk), so this exists for the ``clip.load`` API
    surface: zero-shot probing or feature extraction at CLIP's native stats.

    image: (H, W, 3) uint8 RGB -> (3, n_px, n_px) float32 normalized.
    """
    from PIL import Image as _Image
    im = _Image.fromarray(image)
    w, h = im.size
    scale = n_px / min(w, h)
    im = im.resize((max(n_px, int(round(w * scale))),
                    max(n_px, int(round(h * scale)))), _Image.BICUBIC)
    w, h = im.size
    left, top = (w - n_px) // 2, (h - n_px) // 2
    im = im.crop((left, top, left + n_px, top + n_px))
    arr = np.asarray(im, np.float32) / 255.0
    arr = (arr - np.asarray(CLIP_MEAN, np.float32)) \
        / np.asarray(CLIP_STD, np.float32)
    return arr.transpose(2, 0, 1)
