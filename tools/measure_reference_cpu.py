"""Timed run of the REFERENCE WeCLIP msc-flip val pipeline on this box's CPU.

Grounds bench.py's A100 baseline estimate (BASELINE.md): the reference
publishes no throughput, so we (a) measure the reference's own stage times
at full model size (ViT-B/16, 21 classes, 512px protocol,
test_msc_flip_voc.py:32-113) on CPU torch, (b) measure this CPU's sustained
GEMM rate as the compute calibration, and (c) in BASELINE.md scale the
GPU-eligible stages by (A100 sustained rate / CPU sustained rate) while
holding serial/host stages fixed.  Random weights — stage *times* depend on
shapes only.

Usage:  python tools/measure_reference_cpu.py [--repeats 2] [--out json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_reference_golden import REF, _install_reference  # noqa: E402
from tests.test_composite_golden import _stub_mmcv  # noqa: E402

STAGES: dict = {}


def _timed(name, fn):
    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        STAGES[name] = STAGES.get(name, 0.0) + (time.perf_counter() - t0)
        STAGES[name + "_calls"] = STAGES.get(name + "_calls", 0) + 1
        return out
    return wrap


def build_full_reference(torch, tmp, num_fg=20, num_bg=25):
    """Full-size reference WeCLIP assembled exactly like
    model_attn_aff_voc.py:61-92 but with random weights and no CUDA
    (tests/test_composite_golden.py::build_tiny_pair pattern)."""
    _stub_mmcv()
    import numpy as np
    from clip.model import CLIP
    from WeCLIP_model import model_attn_aff_voc as ref_mod
    from WeCLIP_model.segformer_head import SegFormerHead
    from WeCLIP_model.Decoder.TransDecoder import DecoderTransformer
    from WeCLIP_model.PAR import PAR
    from pytorch_grad_cam import GradCAM

    clip_model = CLIP(embed_dim=512, image_resolution=224, vision_layers=12,
                      vision_width=768, vision_patch_size=16,
                      context_length=77, vocab_size=49408,
                      transformer_width=512, transformer_heads=8,
                      transformer_layers=12).float().eval()

    rng = np.random.default_rng(7)
    fg = rng.standard_normal((num_fg, 512)).astype(np.float32)
    bg = rng.standard_normal((num_bg, 512)).astype(np.float32)
    fg /= np.linalg.norm(fg, axis=-1, keepdims=True)
    bg /= np.linalg.norm(bg, axis=-1, keepdims=True)

    m = ref_mod.WeCLIP.__new__(ref_mod.WeCLIP)
    torch.nn.Module.__init__(m)
    m.num_classes = num_fg + 1
    m.embedding_dim = 256
    m.in_channels = [768] * 4                      # voc_attn_reg.yaml:43
    m.encoder = clip_model
    m.decoder_fts_fuse = SegFormerHead(in_channels=[768] * 4,
                                       embedding_dim=256,
                                       num_classes=num_fg + 1, index=11)
    m.decoder = DecoderTransformer(width=256, layers=3, heads=8,
                                   output_dim=num_fg + 1)
    m.bg_text_features = torch.from_numpy(bg)
    m.fg_text_features = torch.from_numpy(fg)
    m.target_layers = [clip_model.visual.transformer.resblocks[-1].ln_1]
    m.grad_cam = GradCAM(model=clip_model, target_layers=m.target_layers,
                         reshape_transform=ref_mod.reshape_transform)
    seg_dir = os.path.join(tmp, "SegmentationClassAug")
    os.makedirs(seg_dir, exist_ok=True)
    m.root_path = seg_dir
    m.cam_bg_thres = 1
    m.par = PAR(num_iter=20, dilations=[1, 2, 4, 8, 12, 24])  # :89
    m.iter_num = 10**6                             # val-protocol gate open
    m.require_all_fts = True
    m = m.float().eval()

    # ---- stage instrumentation ------------------------------------------
    ref_mod.generate_clip_fts = _timed("backbone_fwd", ref_mod.generate_clip_fts)
    m.grad_cam.forward = _timed("gradcam", m.grad_cam.forward)
    m.par.forward = _timed("par", m.par.forward)
    m.decoder_fts_fuse.forward = _timed("fuse_head", m.decoder_fts_fuse.forward)
    m.decoder.forward = _timed("decoder", m.decoder.forward)
    import clip.clip_tool as ct
    ref_mod.perform_single_voc_cam = _timed("cam_chain_total",
                                            ct.perform_single_voc_cam)
    return m, ref_mod, seg_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _install_reference()
    import numpy as np
    import torch
    import torch.nn.functional as F
    from PIL import Image

    # reference runs CUDA-only; identity-patch .cuda() (composite-golden recipe)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.manual_seed(0)

    tmp = tempfile.mkdtemp(prefix="refbase_")
    m, ref_mod, seg_dir = build_full_reference(torch, tmp)

    # one typical VOC val image: 375x500, 2 fg classes (+ the bg quirk class)
    oh, ow = 375, 500
    lab = np.zeros((oh, ow), np.uint8)
    lab[40:200, 60:300] = 5
    lab[220:340, 250:450] = 12
    name = "img0"
    Image.fromarray(lab).save(os.path.join(seg_dir, name + ".png"))
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, oh, ow)).astype(np.float32)

    def one_image():
        """test_msc_flip_voc.py:50-98 for one image, scales (1.0, 0.75)."""
        inputs = torch.from_numpy(img)
        names = [name, name]
        ratio = 512 / max(oh, ow)
        _h, _w = int(oh * ratio), int(ow * ratio)
        inputs = F.interpolate(inputs, size=(_h, _w), mode="bilinear",
                               align_corners=False)
        segs_list = []
        inputs_cat = torch.cat([inputs, inputs.flip(-1)], dim=0)
        segs_cat, cam, _ = m(inputs_cat, names, mode="val")
        segs = segs_cat[0].unsqueeze(0)
        segs_list.append((segs_cat[0] + segs_cat[1].flip(-1)) / 2)
        _, _, hh, ww = segs_cat.shape
        _inputs = F.interpolate(inputs, scale_factor=0.75, mode="bilinear",
                                align_corners=False)
        inputs_cat = torch.cat([_inputs, _inputs.flip(-1)], dim=0)
        segs_cat, _, _ = m(inputs_cat, names, mode="val")
        _segs_cat = F.interpolate(segs_cat, size=(hh, ww), mode="bilinear",
                                  align_corners=False)
        segs_list.append((_segs_cat[0] + _segs_cat[1].flip(-1)) / 2)
        msc = torch.mean(torch.stack(segs_list, 0), 0).unsqueeze(0)
        rs = F.interpolate(segs, size=(oh, ow), mode="bilinear",
                           align_corners=False)
        rm = F.interpolate(msc, size=(oh, ow), mode="bilinear",
                           align_corners=False)
        torch.argmax(rs, 1).numpy(); torch.argmax(rm, 1).numpy()
        # the reference also np.saves both logit tensors per image (:113)
        t0 = time.perf_counter()
        np.save(os.path.join(tmp, name + ".npy"),
                {"segs": segs.detach().numpy(), "msc_segs": msc.detach().numpy()})
        STAGES["np_save"] = STAGES.get("np_save", 0.0) + time.perf_counter() - t0

    with torch.enable_grad():
        one_image()                                # warm-up (not timed)
    STAGES.clear()
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        one_image()
    total = (time.perf_counter() - t0) / args.repeats
    stages = {k: (v / args.repeats if not k.endswith("_calls")
                  else v // args.repeats) for k, v in STAGES.items()}

    # ---- CPU GEMM calibration (sustained fp32 matmul rate) ---------------
    a = torch.randn(2048, 2048)
    b = torch.randn(2048, 2048)
    a @ b
    t0 = time.perf_counter()
    for _ in range(10):
        a @ b
    gemm_s = (time.perf_counter() - t0) / 10
    gflops = 2 * 2048**3 / gemm_s / 1e9

    result = {
        "protocol": "test_msc_flip_voc.py one-image msc-flip val, 375x500",
        "total_s_per_image": round(total, 3),
        "stages_s": {k: round(v, 4) for k, v in stages.items()},
        "cpu_threads": torch.get_num_threads(),
        "cpu_gemm_gflops_fp32": round(gflops, 1),
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
