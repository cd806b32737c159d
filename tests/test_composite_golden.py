"""COMPOSITE golden tests: the reference's *assembled* forward paths vs ours.

The per-stage goldens (tests/test_reference_golden.py) pin every component;
these tests pin the composition, where small numeric drifts can compound
across the CAM -> Sinkhorn walk -> PAR chain (SURVEY hard-part #5):

- reference ``WeCLIP.forward`` (WeCLIP_model/model_attn_aff_voc.py:107-175)
  vs ``weclip.forward_train`` — same tiny random weights transplanted into
  both, plain (iter<=15000) and gated (require_seg_trans) fusion paths;
- the reference msc-flip validate loop (test_msc_flip_voc.py:32-113) vs the
  batched ``evalx`` engine (tests/test_composite_msc.py).

With no real VOC data on this box, argmax-level agreement of the pseudo
labels here is the strongest available proxy for the +-0.3 mIoU budget.
"""

import dataclasses
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_reference_golden import REF, _install_reference

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

GH, GW = 4, 5                 # 64x80 image, patch 16
H, W = GH * 16, GW * 16
NUM_FG, NUM_BG = 20, 5        # VOC fg classes; tiny bg set (both sides share)
EMBED = 32                    # tiny head width (reference default 256)
VIT_W = 128


def _stub_mmcv():
    """segformer_head.py imports mmcv.cnn.ConvModule at module level but
    never instantiates it; stub it so the reference head imports."""
    if "mmcv" not in sys.modules:
        mm = types.ModuleType("mmcv")
        mc = types.ModuleType("mmcv.cnn")
        mc.ConvModule = object
        mm.cnn = mc
        sys.modules["mmcv"] = mm
        sys.modules["mmcv.cnn"] = mc


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """The reference hard-codes .cuda() on modules/tensors
    (model_attn_aff_voc.py, clip_tool.py); run it on CPU by making those
    calls identity."""
    _install_reference()
    import torch
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    torch.manual_seed(0)
    return torch


def _head_params_from_torch(fuse_mod, dec_mod):
    """Transplant reference SegFormerHead + DecoderTransformer weights into
    our stacked head param tree (weclip_tpu/models/heads.py layout)."""
    # .copy(): same-dtype np.asarray of .numpy() is a VIEW of torch storage,
    # and CPU JAX zero-copy aliases numpy buffers — without the copy, later
    # torch optimizer steps would silently mutate "our" params (bit us in
    # the lockstep golden scouting)
    sdf = {k: np.asarray(v.detach().numpy(), np.float32).copy()
           for k, v in fuse_mod.state_dict().items()}
    sdd = {k: np.asarray(v.detach().numpy(), np.float32).copy()
           for k, v in dec_mod.state_dict().items()}
    nl = fuse_mod.indexes
    fuse = {
        "proj1_w": jnp.stack([jnp.asarray(
            sdf[f"linears_modulelist.{i}.proj.weight"]) for i in range(nl)]),
        "proj1_b": jnp.stack([jnp.asarray(
            sdf[f"linears_modulelist.{i}.proj.bias"]) for i in range(nl)]),
        "proj2_w": jnp.stack([jnp.asarray(
            sdf[f"linears_modulelist.{i}.proj_2.weight"]) for i in range(nl)]),
        "proj2_b": jnp.stack([jnp.asarray(
            sdf[f"linears_modulelist.{i}.proj_2.bias"]) for i in range(nl)]),
        "fuse_w": jnp.asarray(sdf["linear_fuse.weight"][:, :, 0, 0]),
        "fuse_b": jnp.asarray(sdf["linear_fuse.bias"]),
    }
    blocks = []
    n_blocks = len({k.split(".")[2] for k in sdd
                    if k.startswith("transformer.resblocks.")})
    for i in range(n_blocks):
        p = f"transformer.resblocks.{i}."
        blocks.append({
            "ln_1": {"g": jnp.asarray(sdd[p + "ln_1.weight"]),
                     "b": jnp.asarray(sdd[p + "ln_1.bias"])},
            "attn": {"in_w": jnp.asarray(sdd[p + "attn.in_proj_weight"]),
                     "in_b": jnp.asarray(sdd[p + "attn.in_proj_bias"]),
                     "out_w": jnp.asarray(sdd[p + "attn.out_proj.weight"]),
                     "out_b": jnp.asarray(sdd[p + "attn.out_proj.bias"])},
            "ln_2": {"g": jnp.asarray(sdd[p + "ln_2.weight"]),
                     "b": jnp.asarray(sdd[p + "ln_2.bias"])},
            "mlp": {"fc_w": jnp.asarray(sdd[p + "mlp.c_fc.weight"]),
                    "fc_b": jnp.asarray(sdd[p + "mlp.c_fc.bias"]),
                    "proj_w": jnp.asarray(sdd[p + "mlp.c_proj.weight"]),
                    "proj_b": jnp.asarray(sdd[p + "mlp.c_proj.bias"])},
        })
    decoder = {
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "pred_w": jnp.asarray(sdd["linear_pred.weight"][:, :, 0, 0]),
        "pred_b": jnp.asarray(sdd["linear_pred.bias"]),
    }
    return {"head": {"fuse": fuse, "decoder": decoder}}


def default_labels():
    """Two 64x80 label PNG arrays exercising the unique(png)-1 class-id
    shift (clip_tool.py:112-118: drop {254, 255} after the shift)."""
    lab0 = np.zeros((H, W), np.uint8)
    lab0[10:30, 10:40] = 3                      # -> class 2
    lab0[40:60, 50:70] = 7                      # -> class 6
    lab0[:4, :] = 255                           # ignore -> 254, dropped
    lab1 = np.zeros((H, W), np.uint8)
    lab1[5:40, 5:35] = 13                       # -> class 12
    lab1[30:60, 40:75] = 20                     # -> class 19
    return [("img0", lab0), ("img1", lab1)]


def present_from_label(lab, num_fg=NUM_FG):
    """present_mask via the PRODUCTION derivation — the reference reads the
    PNG itself inside its forward, so routing our side through
    data/voc.py::class_set_from_label puts the production class-set code
    inside every composite/lockstep oracle loop.  (A private reimplementation
    here previously masked a real production bug: the signed-vs-uint8
    unique(label)-1 misreading, fixed round 3.)"""
    from weclip_tpu.data.voc import class_set_from_label
    return class_set_from_label(lab, num_fg)


def build_tiny_pair(torch, tmp_path, iter_num=0, labels=None,
                    dataset="voc", vit_width=VIT_W, embed=EMBED,
                    vision_layers=12, text_width=64, clip_embed_dim=32):
    """One random model, realized twice: the reference WeCLIP torch module
    and our (params, frozen, cfg) with the SAME weights.

    ``labels``: list of (name, (oh, ow) uint8 label array) written as the
    SegmentationClassAug PNGs that drive the reference's class sets.
    ``dataset``: 'voc' (model_attn_aff_voc) or 'coco' (model_attn_aff_coco:
    80 fg classes, SegmentationClass/train label dir, 0.7 bbox threshold,
    10-layer seg-trans window, 40k gate).
    ``vit_width``/``embed``: default tiny dims; pass 768/256 for the
    full-ViT-B/16-dimension golden.

    Returns (ref_model, img_names, params, frozen, cfg, imgs, present).
    """
    _stub_mmcv()
    from clip.model import CLIP
    if dataset == "coco":
        from WeCLIP_model import model_attn_aff_coco as ref_mod
    else:
        from WeCLIP_model import model_attn_aff_voc as ref_mod
    from WeCLIP_model.segformer_head import SegFormerHead
    from WeCLIP_model.Decoder.TransDecoder import DecoderTransformer
    from WeCLIP_model.PAR import PAR
    from pytorch_grad_cam import GradCAM
    from PIL import Image

    num_fg = 80 if dataset == "coco" else NUM_FG

    clip_model = CLIP(embed_dim=clip_embed_dim, image_resolution=224,
                      vision_layers=vision_layers,
                      vision_width=vit_width, vision_patch_size=16,
                      context_length=16, vocab_size=64,
                      transformer_width=text_width,
                      transformer_heads=1, transformer_layers=2
                      ).float().eval()

    rng = np.random.default_rng(7)
    fg = rng.standard_normal((num_fg, clip_embed_dim)).astype(np.float32)
    bg = rng.standard_normal((NUM_BG, clip_embed_dim)).astype(np.float32)
    fg /= np.linalg.norm(fg, axis=-1, keepdims=True)
    bg /= np.linalg.norm(bg, axis=-1, keepdims=True)

    # ---- reference WeCLIP, assembled without clip.load/zeroshot (its
    # __init__ needs a real checkpoint + CUDA; every other field is set
    # exactly as model_attn_aff_voc.py:61-92 does) -------------------------
    m = ref_mod.WeCLIP.__new__(ref_mod.WeCLIP)
    torch.nn.Module.__init__(m)
    m.num_classes = num_fg + 1
    m.embedding_dim = embed
    m.in_channels = vit_width
    m.encoder = clip_model
    m.decoder_fts_fuse = SegFormerHead(
        in_channels=[vit_width] * 4, embedding_dim=embed,
        num_classes=num_fg + 1, index=11)
    m.decoder = DecoderTransformer(width=embed, layers=3, heads=8,
                                   output_dim=num_fg + 1)
    m.bg_text_features = torch.from_numpy(bg)
    m.fg_text_features = torch.from_numpy(fg)
    m.target_layers = [clip_model.visual.transformer.resblocks[-1].ln_1]
    # the hook machinery passes (tensor, H//16, W//16) positionally
    # (activations_and_gradients.py:23,39-41), so the raw reshape_transform
    # picks up the right tiny grid from the input tensor's h/w
    m.grad_cam = GradCAM(model=clip_model, target_layers=m.target_layers,
                         reshape_transform=ref_mod.reshape_transform)
    if dataset == "coco":
        # model_attn_aff_coco.py:78 + :135: root/SegmentationClass/train/
        m.root_path = os.path.join(str(tmp_path), "SegmentationClass")
        seg_dir = os.path.join(m.root_path, "train")
    else:
        seg_dir = os.path.join(str(tmp_path), "SegmentationClassAug")
        m.root_path = seg_dir
    os.makedirs(seg_dir, exist_ok=True)
    m.cam_bg_thres = 1
    m.par = PAR(num_iter=4, dilations=[1, 2])
    m.iter_num = iter_num
    m.require_all_fts = True
    m = m.float().eval()

    # ---- label PNGs drive the reference's per-image class sets -----------
    if labels is None:
        labels = default_labels()
    for name, lab in labels:
        Image.fromarray(lab).save(os.path.join(seg_dir, name + ".png"))
    present = np.stack([present_from_label(lab, num_fg)
                        for _, lab in labels])

    # ---- our side: same weights through the state-dict transplant --------
    from weclip_tpu.core.config import ClipConfig, Config, ParConfig
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip.loader import infer_config, params_from_state_dict

    sd = {k: v.float().numpy().copy()
          for k, v in clip_model.state_dict().items()}
    clip_cfg = infer_config(sd, ClipConfig())
    clip_cfg = dataclasses.replace(clip_cfg, embedding_dim=embed)
    clip_params = params_from_state_dict(sd, clip_cfg)
    if dataset == "coco":
        from weclip_tpu.core.config import coco_config
        base = coco_config()
    else:
        base = Config()
    cfg = dataclasses.replace(
        base,
        dataset=dataclasses.replace(base.dataset, num_classes=num_fg + 1),
        clip=clip_cfg,
        par=ParConfig(dilations=(1, 2), num_iter=4),
    )
    frozen = weclip.build_frozen_state(
        jax.tree_util.tree_map(jnp.asarray, clip_params), fg, bg)
    params = _head_params_from_torch(m.decoder_fts_fuse, m.decoder)

    imgs = [rng.standard_normal((3,) + lab.shape).astype(np.float32)
            for _, lab in labels]
    if len({im.shape for im in imgs}) == 1:
        imgs = np.stack(imgs)
    return m, [n for n, _ in labels], params, frozen, cfg, imgs, present


def _our_forward(params, frozen, cfg, imgs, present, require_seg_trans,
                 policy=None):
    from weclip_tpu.core import precision
    from weclip_tpu.core.compaction import compact_classes
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit

    ci, ca = compact_classes(present, 2)
    pe = vit.build_pos_emb(frozen["visual"], GH, GW)[None]
    batch = weclip.Batch(
        img=jnp.asarray(imgs), pos_emb=pe,
        valid=jnp.ones((2, GH * GW + 1), bool),
        gh=jnp.full((2,), GH, jnp.int32), gw=jnp.full((2,), GW, jnp.int32),
        present_mask=jnp.asarray(present))
    return weclip.forward_train(
        params, frozen, batch, cfg,
        require_seg_trans=jnp.bool_(require_seg_trans), dropout_rng=None,
        policy=policy or precision.FP32, cls_idx=jnp.asarray(ci),
        cls_active=jnp.asarray(ca)), ci


@pytest.mark.parametrize("policy_name", ["fp32", "bf16"])
@pytest.mark.parametrize("gated", [False, True],
                         ids=["plain_fusion", "gated_fusion"])
def test_weclip_forward_composite(cpu_cuda, tmp_path, gated, policy_name):
    """Reference WeCLIP.forward vs our forward_train on identical weights:
    seg/attn_pred allclose, pseudo cam_labels agree at argmax level.

    gated=False: iter_num <= 15000 -> plain last-8 attention mean
    (clip_tool.py:172-176); gated=True: iter_num > 15000 -> learned-affinity
    gated fusion (clip_tool.py:152-170).

    policy_name="bf16" runs OUR side under the SHIPPED production policy
    (PrecisionConfig.compute_dtype default; the reference ships fp16
    end-to-end, clip/model.py:457-478) — quantifying the parity the
    headline bench number actually runs at (VERDICT r2 #1).  Measured
    (tools/probe_bf16_parity.py, CPU): bf16 label agreement 0.991-0.993 vs
    fp32's 0.9998+, seg argmax agreement 1.0 in both."""
    torch = cpu_cuda
    from weclip_tpu.core import precision
    iter_num = 20000 if gated else 0
    (m, names, params, frozen, cfg, imgs,
     present) = build_tiny_pair(torch, tmp_path, iter_num=iter_num)

    seg_t, cam_labels_t, attn_pred_t = m(torch.from_numpy(imgs), names,
                                         mode="train")
    policy = (precision.make_policy("bfloat16") if policy_name == "bf16"
              else precision.FP32)
    out, ci = _our_forward(params, frozen, cfg, imgs, present,
                           require_seg_trans=gated, policy=policy)

    # seg logits: ours (B, P, K) grid-order tokens -> reference (B, K, gh, gw)
    seg_ours = np.asarray(out.seg, np.float32).reshape(
        2, GH, GW, NUM_FG + 1).transpose(0, 3, 1, 2)
    seg_ref = seg_t.detach().numpy()
    if policy_name == "fp32":
        np.testing.assert_allclose(seg_ours, seg_ref, rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(np.asarray(out.attn_pred),
                                   attn_pred_t.detach().numpy(),
                                   rtol=5e-2, atol=5e-3)
        label_floor = 0.98
    else:
        # bf16 residual stream: pin decision-level agreement + a loose
        # numeric envelope (bf16 has an 8-bit mantissa)
        seg_argmax_agree = float(
            (seg_ours.argmax(1) == seg_ref.argmax(1)).mean())
        assert seg_argmax_agree >= 0.995, seg_argmax_agree
        np.testing.assert_allclose(np.asarray(out.attn_pred, np.float32),
                                   attn_pred_t.detach().numpy(),
                                   rtol=2e-1, atol=5e-2)
        label_floor = 0.985

    ours_labels = np.asarray(out.cam_labels)
    ref_labels = cam_labels_t.detach().numpy()
    # identical value vocabulary per image: {0} + present classes + 1
    for i in range(2):
        assert set(np.unique(ref_labels[i])) <= set(
            [0] + list(ci[i] + 1)), np.unique(ref_labels[i])
    agree = float((ours_labels == ref_labels).mean())
    # fp16 islands inside the reference attention (myAtt.py:321) mean tiny
    # drifts can flip near-tie pixels after walk+PAR+argmax
    assert agree >= label_floor, f"pseudo-label agreement {agree:.4f}"


def _coco_labels():
    lab0 = np.zeros((H, W), np.uint8)
    lab0[8:40, 8:48] = 31                       # -> class 30
    lab0[44:60, 52:76] = 46                     # -> class 45
    lab1 = np.zeros((H, W), np.uint8)
    lab1[10:50, 10:60] = 77                     # -> class 76
    lab1[:3, :] = 255
    return [("c0", lab0), ("c1", lab1)]


@pytest.mark.parametrize("gated", [False, True],
                         ids=["plain_fusion", "gated_fusion"])
def test_weclip_coco_forward_composite(cpu_cuda, tmp_path, gated):
    """model_attn_aff_coco.py train forward vs ours under coco_config:
    0.7 bbox threshold, 10-layer gated window, 40k iter gate."""
    torch = cpu_cuda
    iter_num = 50000 if gated else 0
    (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
        torch, tmp_path, iter_num=iter_num, labels=_coco_labels(),
        dataset="coco")
    assert cfg.cam.bbox_threshold == 0.7 and cfg.cam.seg_trans_layers == 10

    seg_t, cam_labels_t, attn_pred_t = m(torch.from_numpy(imgs), names,
                                         mode="train")
    out, ci = _our_forward(params, frozen, cfg, imgs, present,
                           require_seg_trans=gated)

    k = cfg.dataset.num_classes
    seg_ours = np.asarray(out.seg).reshape(2, GH, GW, k).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(seg_ours, seg_t.detach().numpy(),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.attn_pred),
                               attn_pred_t.detach().numpy(),
                               rtol=5e-2, atol=5e-3)
    agree = float((np.asarray(out.cam_labels)
                   == cam_labels_t.detach().numpy()).mean())
    assert agree >= 0.98, f"pseudo-label agreement {agree:.4f}"


def test_weclip_coco_val_short_circuit(cpu_cuda, tmp_path):
    """model_attn_aff_coco.py:131-132: val mode returns (seg, None,
    attn_pred) without the CAM chain — ours is forward_train(with_pseudo=
    False), the with_cam=False engine path (cli/eval_coco.py)."""
    torch = cpu_cuda
    (m, names, params, frozen, cfg, imgs, present) = build_tiny_pair(
        torch, tmp_path, labels=_coco_labels(), dataset="coco")

    seg_t, cam_t, attn_pred_t = m(torch.from_numpy(imgs), names, mode="val")
    assert cam_t is None

    from weclip_tpu.core import precision
    from weclip_tpu.models import weclip
    from weclip_tpu.models.clip import vit
    pe = vit.build_pos_emb(frozen["visual"], GH, GW)[None]
    batch = weclip.Batch(
        img=jnp.asarray(imgs), pos_emb=pe,
        valid=jnp.ones((2, GH * GW + 1), bool),
        gh=jnp.full((2,), GH, jnp.int32), gw=jnp.full((2,), GW, jnp.int32),
        present_mask=jnp.asarray(present))
    out = weclip.forward_train(params, frozen, batch, cfg,
                               require_seg_trans=jnp.bool_(True),
                               dropout_rng=None, policy=precision.FP32,
                               with_pseudo=False)
    k = cfg.dataset.num_classes
    seg_ours = np.asarray(out.seg).reshape(2, GH, GW, k).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(seg_ours, seg_t.detach().numpy(),
                               rtol=5e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.attn_pred),
                               attn_pred_t.detach().numpy(),
                               rtol=5e-2, atol=5e-3)
