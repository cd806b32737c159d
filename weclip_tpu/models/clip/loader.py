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


def load_clip(path: str, base: ClipConfig = None) -> Tuple[Dict[str, Any], ClipConfig]:
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
