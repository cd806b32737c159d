"""Class-name prompt tables and the zero-shot text-embedding builder.

Tables mirror clip/clip_text.py (the exact synonym-enriched strings are part
of the method — pseudo-label quality depends on them).  The text encoder
runs exactly once at model init (model_attn_aff_voc.py:34-46,81-82); the
resulting (num_classes, embed_dim) tables are treated as constants
afterwards, so they are computed here eagerly and cached.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from weclip_tpu.core.config import ClipConfig
from weclip_tpu.models.clip import vit
from weclip_tpu.models.clip.tokenizer import Tokenizer, tokenize

# clip/clip_text.py:2-4
BACKGROUND_CATEGORY_VOC: List[str] = [
    'ground', 'land', 'grass', 'tree', 'building', 'wall', 'sky', 'lake',
    'water', 'river', 'sea', 'railway', 'railroad', 'keyboard', 'helmet',
    'cloud', 'house', 'mountain', 'ocean', 'road', 'rock', 'street',
    'valley', 'bridge', 'sign',
]

# clip/clip_text.py:6-10
CLASS_NAMES_VOC: List[str] = [
    'aeroplane', 'bicycle', 'bird', 'boat', 'bottle',
    'bus', 'car', 'cat', 'chair', 'cow',
    'diningtable', 'dog', 'horse', 'motorbike', 'person',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor',
]

# clip/clip_text.py:12-16 (synonym-enriched prompts actually used for CAM)
NEW_CLASS_NAMES_VOC: List[str] = [
    'aeroplane', 'bicycle', 'bird avian', 'boat', 'bottle',
    'bus', 'car', 'cat', 'chair seat', 'cow',
    'diningtable', 'dog', 'horse', 'motorbike',
    'person with clothes,people,human',
    'pottedplant', 'sheep', 'sofa', 'train', 'tvmonitor screen',
]

# clip/clip_text.py:19-35
CLASS_NAMES_COCO: List[str] = [
    'person', 'bicycle', 'car', 'motorbike', 'aeroplane',
    'bus', 'train', 'truck', 'boat', 'traffic light',
    'fire hydrant', 'stop sign', 'parking meter', 'bench', 'bird',
    'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack',
    'umbrella', 'handbag', 'tie', 'suitcase', 'frisbee',
    'skis', 'snowboard', 'sports ball', 'kite', 'baseball bat',
    'baseball glove', 'skateboard', 'surfboard', 'tennis racket', 'bottle',
    'wine glass', 'cup', 'fork', 'knife', 'spoon',
    'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut',
    'cake', 'chair', 'sofa', 'pottedplant', 'bed',
    'diningtable', 'toilet', 'tvmonitor', 'laptop', 'mouse',
    'remote', 'keyboard', 'cell phone', 'microwave', 'oven',
    'toaster', 'sink', 'refrigerator', 'book', 'clock',
    'vase', 'scissors', 'teddy bear', 'hair drier', 'toothbrush',
]

# clip/clip_text.py:37-53
NEW_CLASS_NAMES_COCO: List[str] = [
    'person with clothes,people,human', 'bicycle', 'car', 'motorbike', 'aeroplane',
    'bus', 'train', 'truck', 'boat', 'traffic light',
    'fire hydrant', 'stop sign', 'parking meter', 'bench', 'bird avian',
    'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack,bag',
    'umbrella,parasol', 'handbag,purse', 'necktie', 'suitcase', 'frisbee',
    'skis', 'sknowboard', 'sports ball', 'kite', 'baseball bat',
    'glove', 'skateboard', 'surfboard', 'tennis racket', 'bottle',
    'wine glass', 'cup', 'fork', 'knife', 'dessertspoon',
    'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut',
    'cake', 'chair seat', 'sofa', 'pottedplant', 'bed',
    'diningtable', 'toilet', 'tvmonitor screen', 'laptop', 'mouse',
    'remote control', 'keyboard', 'cell phone', 'microwave', 'oven',
    'toaster', 'sink', 'refrigerator', 'book', 'clock',
    'vase', 'scissors', 'teddy bear', 'hairdrier,blowdrier', 'toothbrush',
]

# clip/clip_text.py:56-58
BACKGROUND_CATEGORY_COCO: List[str] = [
    'ground', 'land', 'grass', 'tree', 'building', 'wall', 'sky', 'lake',
    'water', 'river', 'sea', 'railway', 'railroad', 'helmet',
    'cloud', 'house', 'mountain', 'ocean', 'road', 'rock', 'street',
    'valley', 'bridge',
]


def class_tables(dataset: str):
    """(fg_names, bg_names) for a dataset key."""
    if dataset == "voc":
        return NEW_CLASS_NAMES_VOC, BACKGROUND_CATEGORY_VOC
    if dataset == "coco":
        return NEW_CLASS_NAMES_COCO, BACKGROUND_CATEGORY_COCO
    raise ValueError(dataset)


def zeroshot_classifier(classnames: Sequence[str], templates: Sequence[str],
                        text_params, cfg: ClipConfig,
                        tokenizer: Tokenizer) -> np.ndarray:
    """Per-class L2-normalized mean prompt embedding
    (model_attn_aff_voc.py:34-46).  Returns (num_classes, embed_dim) fp32."""
    rows = []
    for name in classnames:
        toks = tokenize([t.format(name) for t in templates], tokenizer,
                        cfg.context_length)
        emb = vit.encode_text(text_params, jnp.asarray(toks), cfg)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        rows.append(np.asarray(mean / jnp.linalg.norm(mean)))
    return np.stack(rows).astype(np.float32)


def build_text_features(dataset: str, text_params, cfg: ClipConfig,
                        tokenizer: Tokenizer,
                        template: str = "a clean origami {}."):
    """(fg_features (C_fg, E), bg_features (C_bg, E)) fp32 numpy."""
    fg_names, bg_names = class_tables(dataset)
    fg = zeroshot_classifier(fg_names, [template], text_params, cfg, tokenizer)
    bg = zeroshot_classifier(bg_names, [template], text_params, cfg, tokenizer)
    return fg, bg
