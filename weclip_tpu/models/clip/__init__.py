"""CLIP subpackage facade — mirrors the reference's ``clip`` module surface
(clip/__init__.py + clip/clip.py exports) with TPU-native equivalents."""

from weclip_tpu.models.clip.loader import (infer_config, load_clip,
                                           load_torch_state_dict,
                                           params_from_state_dict)
from weclip_tpu.models.clip.tokenizer import Tokenizer, tokenize
from weclip_tpu.models.clip.vit import (encode_text, init_clip_params,
                                        vision_forward_frozen)

__all__ = [
    "load_clip", "load_torch_state_dict", "params_from_state_dict",
    "infer_config", "Tokenizer", "tokenize", "encode_text",
    "init_clip_params", "vision_forward_frozen",
]
