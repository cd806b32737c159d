"""WeCLIP model assembly: frozen CLIP -> heads -> online pseudo-labels.

Re-designs ``WeCLIP_model/model_attn_aff_voc.py`` (and the _coco/_seg
variants) as one pure, jittable function per mode.  The reference's
per-image / per-class Python loops with GPU->CPU->GPU round-trips
(model_attn_aff_voc.py:139-171, clip_tool.py:106-197, base_cam.py:122-125)
become batch axes: every stage below runs on device, vmapped over images and
classes, inside a single XLA program.

Class-set derivation (reference-exact): the reference derives each image's
class set from the unique ids of its label PNG via ``unique(label) - 1`` in
**uint8**, then removes {254, 255} (clip_tool.py:111-118) — so background
(0 -> 255) and ignore (255 -> 254) are both dropped and only true foreground
ids remain.  The data pipeline computes this once per example and ships it
as ``present_mask`` (weclip_tpu/data/voc.py::class_set_from_label, executed
against the reference's exact lines in tests/test_data.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from weclip_tpu.cam.gradcam import gradcam_batch
from weclip_tpu.core import precision
from weclip_tpu.core.config import Config
from weclip_tpu.models import heads
from weclip_tpu.models.clip import vit
from weclip_tpu.ops.resize import resize_bilinear
from weclip_tpu.refine import affinity as aff
from weclip_tpu.refine.par import par_refine_auto


class Batch(NamedTuple):
    """One training/eval step's inputs (all device arrays)."""
    img: jax.Array            # (B, 3, H, W) normalized image, padded
    pos_emb: jax.Array        # (B or 1, L, D) per-image positional embedding
    valid: jax.Array          # (B, L) token validity (CLS first)
    gh: jax.Array             # (B,) valid grid heights
    gw: jax.Array             # (B,) valid grid widths
    present_mask: jax.Array   # (B, C_fg) bool image-level class set


class ForwardOutputs(NamedTuple):
    seg: jax.Array            # (B, P, num_classes) decoder logits (grid res)
    cam_labels: jax.Array     # (B, H, W) int32 pseudo labels (train path)
    attn_pred: jax.Array      # (B, P, P) learned Gram affinity
    cams_refined: jax.Array   # (B, C_fg, P) refined CAMs (pre-PAR, diagnostics)


def _lut_select(lut: jax.Array, idx: jax.Array) -> jax.Array:
    """lut[b, idx[b, ...]] as a select-sum over the (tiny) class bucket.

    XLA lowers the equivalent batched gather to a ~12 ms scalar loop at
    canvas shapes; MC+1 vectorized compares are ~free."""
    out = jnp.zeros(idx.shape, jnp.int32)
    for c in range(lut.shape[1]):
        sel = lut[:, c].reshape((-1,) + (1,) * (idx.ndim - 1))
        out = jnp.where(idx == c, sel, out)
    return out


def backbone_and_heads(
    params: Dict[str, Any],
    frozen: Dict[str, Any],
    batch: Batch,
    cfg: Config,
    dropout_rng: Optional[jax.Array],
    policy: precision.Policy,
    with_attn: bool = True,
    attn_rows: Optional[int] = None,
    decoder_pallas: bool = False,
):
    """Frozen CLIP forward + fuse/decoder/affinity heads.

    ``with_attn=False`` for seg-only forwards (no CAM chain downstream):
    the frozen forward skips the attention-map export.  ``attn_rows``
    limits the export to the first k batch rows (msc-flip: the flipped
    half's maps are never consumed).  ``decoder_pallas`` opts the decoder
    attention into the fused Pallas kernel — ONLY gradient-free callers
    (the eval engine) may set it: the kernel defines no VJP, and
    "dropout_rng is None" does NOT imply gradient-free (deterministic
    training differentiates this forward with rng=None — conflating the
    two crashed on TPU, caught in the round-3 review).

    Returns (feats, head_out, attn_pred, valid_p)."""
    feats = vit.vision_forward_frozen(
        frozen["visual"], batch.img, batch.pos_emb, batch.valid,
        cfg.clip, policy=policy, with_attn=with_attn, attn_rows=attn_rows)
    # CLS dropped; the stream-padded tail (vit.VisionFeatures) excluded —
    # the patch block is [1:1+P] with P from the ORIGINAL batch valid
    layer_tokens = feats.layer_tokens[:, :, 1:batch.valid.shape[1], :]
    valid_p = batch.valid[:, 1:].astype(jnp.float32)

    # trainable heads run at their own (default fp32) precision — the
    # reference never converts them to fp16 (see PrecisionConfig.head_dtype)
    head_policy = precision.make_policy(cfg.precision.head_dtype,
                                        cfg.precision.param_dtype,
                                        cfg.precision.softmax_dtype)

    if "comer" in params and cfg.comer.enabled:
        # WeCLIP+ViT-CoMer config: the CTI branch's fusion features are added
        # to the SegFormer fusion ahead of the decoder (SURVEY §2.12)
        from weclip_tpu.models.comer import comer_forward
        fused = heads.fuse_forward(params["head"]["fuse"], layer_tokens,
                                   dropout_rng, policy=head_policy)
        # the CoMer branch runs at the BACKBONE compute policy (bf16 in
        # production), not the fp32 head policy: it is a paper-only branch
        # with no reference numerics to preserve, its zero-init gates keep
        # the step-0 signal exact in any dtype, and fp32 convs/CTI cost
        # ~2x on the MXU.  Norms/softmax stay fp32 islands inside.
        fused = fused + comer_forward(params["comer"], batch.img,
                                      layer_tokens, batch.valid[:, 1:],
                                      cfg.comer, policy)
        seg, dec_attn = heads.decoder_forward(params["head"]["decoder"], fused,
                                              valid_p=batch.valid[:, 1:],
                                              policy=head_policy,
                                              allow_pallas=decoder_pallas)
        head_out = heads.HeadOutputs(seg, fused, dec_attn)
    else:
        # gradient-free callers (decoder_pallas=True == eval engine) fuse
        # the decoder attention and drop its dead map export
        head_out = heads.head_forward(params["head"], layer_tokens,
                                      dropout_rng=dropout_rng,
                                      valid_p=batch.valid[:, 1:],
                                      policy=head_policy,
                                      allow_pallas=decoder_pallas)
    attn_pred = aff.gram_affinity(head_out.fused, valid_p)
    return feats, head_out, attn_pred, valid_p


def pseudo_label_chain(
    frozen: Dict[str, Any],
    feats: vit.VisionFeatures,
    batch_valid: jax.Array,            # (B, L) token validity (CLS first)
    present_mask: jax.Array,           # (B, C_fg)
    gh: jax.Array, gw: jax.Array,      # (B,) true grid extents
    grid_hw: Tuple[int, int],          # padded grid (g0, g1)
    cfg: Config,
    policy: precision.Policy,
    cls_idx: jax.Array,                # (B, MC) compacted class ids
    cls_active: jax.Array,             # (B, MC) validity
    fuse,                              # fn(attn_last) -> fused (B, P, P)
    upsample,                          # fn((B, MC, g0, g1)) -> (B, MC, H, W)
    imgs: jax.Array,                   # (B, 3, H, W) PAR guidance pixels
    mesh=None,                         # data mesh for sharded PAR
) -> Tuple[jax.Array, jax.Array]:
    """The CAM -> walk -> PAR chain shared by training (pseudo_labels) and
    the msc-flip evaluator (evalx/engine.make_eval_scale1) — the reference
    runs the identical code for both (clip_tool.py:139-216,
    model_attn_aff_voc.py:140-171); only the attention-fusion gating
    (``fuse``: train gates on the iter threshold, val always gates) and the
    grid -> output upsample (``upsample``: square resize on train crops,
    per-image clamp operators on eval canvases) differ.

    Returns (cam_labels (B, H, W) int32, cams_refined (B, MC, P))."""
    b = batch_valid.shape[0]
    g0, g1 = grid_hw
    num_fg = cfg.dataset.num_classes - 1
    num_bg = frozen["bg_text"].shape[0]
    mc = cls_idx.shape[1]

    # ---- GradCAM over the class bucket (cam/gradcam.py) ------------------
    text_features = jnp.concatenate([frozen["fg_text"], frozen["bg_text"]], axis=0)
    text_mask = jnp.concatenate(
        [present_mask.astype(bool),
         jnp.ones((b, num_bg), bool)], axis=1)
    x11 = feats.layer_tokens[-1]           # input to block 11, stream length
    cam_out = gradcam_batch(frozen["visual"], frozen["logit_scale"], x11,
                            text_features, text_mask, feats.valid,
                            num_fg, cfg.clip, policy, class_idx=cls_idx,
                            num_patches=batch_valid.shape[1] - 1)

    # ---- attention fusion (plain vs learned-affinity-gated) --------------
    fused_attn = fuse(cam_out.attn_last)

    # ---- Sinkhorn transition + box-masked random walk --------------------
    valid_pb = batch_valid[:, 1:]

    def walk_one(cams_i, fused_i, valid_i, gh_i, gw_i):
        trans = aff.sinkhorn_transition(fused_i, valid_i,
                                        rounds=cfg.cam.sinkhorn_iters)
        vg = valid_i.reshape(g0, g1)
        return aff.random_walk_cams(cams_i, trans, vg, gh_i, gw_i,
                                    cfg.cam.bbox_threshold)

    refined = jax.vmap(walk_one)(cam_out.cams, fused_attn, valid_pb,
                                 gh, gw)                      # (B, MC, P)
    refined = jax.lax.stop_gradient(refined)

    # ---- normalize + upsample + bg + PAR + argmax -------------------------
    # (clip_tool.py:202-216, model_attn_aff_voc.py:160-171)
    from weclip_tpu.cam.gradcam import _minmax_valid

    def norm_one(c, v):
        return _minmax_valid(c, v.astype(bool))

    normed = jax.vmap(jax.vmap(norm_one, in_axes=(0, None)))(refined, valid_pb)
    cam_hw = upsample(normed.reshape(b, mc, g0, g1))

    active = cls_active.astype(jnp.float32)[:, :, None, None]
    fg_scores = jnp.where(active > 0, cam_hw, -1.0)
    max_present = jnp.max(jnp.where(active > 0, cam_hw, 0.0), axis=1, keepdims=True)
    bg_score = jnp.power(1.0 - max_present, cfg.cam.bg_exponent)
    stack = jnp.concatenate([bg_score, fg_scores], axis=1)    # (B, 1+MC, H, W)

    par_out = par_refine_auto(imgs, stack, cfg.par, mesh=mesh)
    idx = jnp.argmax(par_out, axis=1).astype(jnp.int32)
    lut = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), cls_idx.astype(jnp.int32) + 1], axis=1)
    cam_labels = _lut_select(lut, idx)
    return cam_labels, refined


def pseudo_labels(
    frozen: Dict[str, Any],
    feats: vit.VisionFeatures,
    attn_pred: jax.Array,
    batch: Batch,
    cfg: Config,
    require_seg_trans: jax.Array,      # bool scalar (iter > threshold or val)
    out_hw: Tuple[int, int],
    policy: precision.Policy,
    cls_idx: Optional[jax.Array] = None,     # (B, MC) compacted class ids
    cls_active: Optional[jax.Array] = None,  # (B, MC) validity
    mesh=None,                               # data mesh for sharded PAR
) -> Tuple[jax.Array, jax.Array]:
    """On-device CAM -> walk -> PAR pseudo-label chain (train-crop shapes).

    With ``cls_idx``/``cls_active`` the per-class work runs only on a static
    bucket of present classes (core/compaction.py), exactly like the
    reference's loop over present classes.

    Returns (cam_labels (B, H, W) int32, cams_refined (B, MC, P)).
    """
    b = batch.img.shape[0]
    h, w = out_hw
    g0, g1 = h // cfg.clip.patch_size, w // cfg.clip.patch_size
    num_fg = cfg.dataset.num_classes - 1
    if cls_idx is None:
        cls_idx = jnp.broadcast_to(jnp.arange(num_fg, dtype=jnp.int32),
                                   (b, num_fg))
        cls_active = batch.present_mask.astype(bool)

    valid_p = batch.valid[:, 1:].astype(jnp.float32)
    seg_attn = jax.lax.stop_gradient(attn_pred)

    def fuse(attn_last):
        # train-time gating: learned affinity only after the seg-trans
        # threshold (model_attn_aff_voc.py:146)
        return jax.lax.cond(
            require_seg_trans,
            lambda: aff.fuse_attention_gated(feats.layer_attn, attn_last,
                                             seg_attn,
                                             cfg.cam.seg_trans_layers,
                                             valid_p),
            lambda: aff.fuse_attention_plain(
                feats.layer_attn, attn_last, cfg.cam.attn_fuse_layers,
                num_patches=batch.valid.shape[1] - 1))

    return pseudo_label_chain(
        frozen, feats, batch.valid, batch.present_mask, batch.gh, batch.gw,
        (g0, g1), cfg, policy, cls_idx, cls_active, fuse,
        lambda grid: resize_bilinear(grid, h, w), batch.img, mesh=mesh)


def forward_train(
    params: Dict[str, Any],
    frozen: Dict[str, Any],
    batch: Batch,
    cfg: Config,
    require_seg_trans: jax.Array,
    dropout_rng: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
    with_pseudo: bool = True,
    cls_idx: Optional[jax.Array] = None,
    cls_active: Optional[jax.Array] = None,
    mesh=None,
) -> ForwardOutputs:
    """Full training-mode forward (model_attn_aff_voc.py:107-175).

    Fixed crop shapes: H = W = crop_size, no padding (valid all-true).
    """
    feats, head_out, attn_pred, _ = backbone_and_heads(
        params, frozen, batch, cfg, dropout_rng, policy,
        with_attn=with_pseudo)
    h, w = batch.img.shape[-2:]
    if with_pseudo:
        cam_labels, refined = pseudo_labels(
            frozen, feats, attn_pred, batch, cfg, require_seg_trans,
            (h, w), policy, cls_idx=cls_idx, cls_active=cls_active,
            mesh=mesh)
    else:
        b = batch.img.shape[0]
        cam_labels = jnp.zeros((b, h, w), jnp.int32)
        refined = jnp.zeros((b, cfg.dataset.num_classes - 1,
                             batch.valid.shape[1] - 1), jnp.float32)
    return ForwardOutputs(head_out.seg, cam_labels, attn_pred, refined)


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------

def init_trainable_params(rng: jax.Array, cfg: Config) -> Dict[str, Any]:
    """Only fuse + decoder train (model_attn_aff_voc.py:94-103); CLIP stays
    frozen and block-11 grads exist solely for CAM.  With cfg.comer.enabled
    the CTI branch parameters train alongside the heads."""
    params = {
        "head": heads.init_head_params(
            rng,
            n_layers=cfg.clip.vision_layers - 1,
            in_dim=cfg.clip.vision_width,
            embed=cfg.clip.embedding_dim,
            dec_layers=3,
            num_classes=cfg.dataset.num_classes,
        )
    }
    if cfg.comer.enabled:
        from weclip_tpu.models.comer import init_comer_params
        params["comer"] = init_comer_params(
            jax.random.fold_in(rng, 99), cfg.comer,
            vit_width=cfg.clip.vision_width, embed=cfg.clip.embedding_dim)
    return params


def build_frozen_state(clip_params: Dict[str, Any], fg_text, bg_text) -> Dict[str, Any]:
    """Frozen constants: CLIP weights + precomputed class text embeddings."""
    return {
        "visual": clip_params["visual"],
        "logit_scale": jnp.asarray(clip_params["logit_scale"]),
        "fg_text": jnp.asarray(fg_text),
        "bg_text": jnp.asarray(bg_text),
    }
