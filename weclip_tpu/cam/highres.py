"""High-resolution per-class CAM program (shared builder).

One batched jitted program: frozen CLIP forward -> CAM engine (GradCAM by
default, any of the implemented pytorch_grad_cam method surface) ->
attention-affinity random walk -> min-max normalize -> resize to the
original resolution.  This is the computation the reference's offline
generators run per image (clip/generate_cams_voc12.py:139-216 via
perform_single_voc_cam, clip_tool.py:106-197) and the heatmap surface a
`pytorch_grad_cam.GradCAM(model, ...)` user consumes.

Used by both `cli/generate_cams.py` (offline npy generation) and
`api.WeCLIPPipeline.cam()` (interactive heatmaps) so the two stay one
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_cam_program(cfg, prep, policy, method: str = "grad_cam",
                     mesh=None):
    """Returns jitted ``fn(frozen, sb, presents, sizes) -> (B, num_fg, Co,
    Co)`` refined min-max-normalized CAMs at the output-canvas resolution
    (slice ``[:, :, :oh, :ow]`` for per-image originals).

    ``sb``/``sizes`` come from ``Evaluator.build_batch`` (scale-1 batch);
    ``method`` selects the CAM engine (cam/variants.py surface; the
    reference's live path is grad_cam).  On a dp-only ``mesh`` (the
    generate_cams CLI's data-parallel sharding) the whole per-image
    program runs as one full-manual shard_map over ``data`` so the Pallas
    kernels dispatch per device (parallel/mesh.per_device_map).
    """
    from weclip_tpu.cam.gradcam import _minmax_valid, gradcam_batch
    from weclip_tpu.evalx.engine import _dev_ops_cam, prepare_scale1_images
    from weclip_tpu.models import weclip as weclip_mod
    from weclip_tpu.models.clip import vit as vit_mod
    from weclip_tpu.refine import affinity as aff

    num_fg = cfg.dataset.num_classes - 1

    def cams_for_batch(fz, sb, presents, sizes):
        # ``fz`` (the frozen CLIP tree) MUST be an argument, not a closure
        # capture — closure-captured arrays become HLO constants and the
        # ~340MB program overflows remote-compile request limits.
        g = prep.canvas_in1 // cfg.clip.patch_size
        # shipped uint8 originals -> normalized resize-long canvases
        imgs1 = prepare_scale1_images(sb.img, sizes, cfg, prep.canvas_in1)
        batch = weclip_mod.Batch(imgs1, sb.pos_emb, sb.valid, sb.gh, sb.gw,
                                 presents)
        feats = vit_mod.vision_forward_frozen(
            fz["visual"], batch.img, batch.pos_emb, batch.valid, cfg.clip,
            policy=policy)
        # slice the stream-padded features (vit.VisionFeatures) back to the
        # grid length: the CAM engines accept stream-padded inputs via
        # num_patches= (cam/variants.py, cam/gradcam.py), but the walk
        # consumers below (fuse_attention_plain, sinkhorn) want the
        # unpadded attention stack anyway, so one up-front slice is
        # simplest (offline/interactive path — the copy is not on the
        # headline path)
        l0 = sb.valid.shape[1]
        feats = vit_mod.VisionFeatures(feats.layer_tokens[:, :, :l0],
                                       feats.layer_attn[:, :, :l0, :l0],
                                       feats.valid[:, :l0])
        text = jnp.concatenate([fz["fg_text"], fz["bg_text"]], 0)
        tmask = jnp.concatenate(
            [presents.astype(bool),
             jnp.ones((sb.img.shape[0], fz["bg_text"].shape[0]), bool)], 1)
        cam_out = gradcam_batch(fz["visual"], fz["logit_scale"],
                                feats.layer_tokens[-1], text, tmask,
                                sb.valid, num_fg, cfg.clip, policy)
        if method == "grad_cam":
            cams = cam_out.cams
        else:
            from weclip_tpu.cam import variants
            ci = jnp.arange(num_fg, dtype=jnp.int32)
            cams = jax.vmap(lambda x, tm, v: variants.cam_single(
                method, fz["visual"], fz["logit_scale"],
                x, text, tm, v, ci, cfg.clip, policy))(
                    feats.layer_tokens[-1], tmask, sb.valid)
        fused = aff.fuse_attention_plain(feats.layer_attn, cam_out.attn_last,
                                         cfg.cam.attn_fuse_layers)

        def walk_one(cams_i, fused_i, valid_i, gh_i, gw_i):
            trans = aff.sinkhorn_transition(fused_i, valid_i,
                                            cfg.cam.sinkhorn_iters)
            return aff.random_walk_cams(cams_i, trans, valid_i.reshape(g, g),
                                        gh_i, gw_i, cfg.cam.bbox_threshold)

        refined = jax.vmap(walk_one)(cams, fused, sb.valid[:, 1:],
                                     sb.gh, sb.gw)
        normed = jax.vmap(jax.vmap(
            lambda c, v: _minmax_valid(c, v.astype(bool)),
            in_axes=(0, None)))(refined, sb.valid[:, 1:])
        # grid -> original resolution
        mh_cam, mw_cam = _dev_ops_cam(sizes, prep.canvas_out, prep.grid1,
                                      cfg.clip.patch_size)
        grid = normed.reshape(normed.shape[0], num_fg, g, g)
        y = jnp.einsum("bog,bcgh->bcoh", mh_cam, grid)
        return jnp.einsum("bph,bcoh->bcop", mw_cam, y)

    from weclip_tpu.parallel import mesh as meshlib
    if meshlib.dp_only(mesh):
        from jax.sharding import PartitionSpec as P
        d, r = P(mesh.axis_names[0]), P()
        return jax.jit(meshlib.per_device_map(
            cams_for_batch, mesh, in_specs=(r, d, d, d), out_specs=d))
    return jax.jit(cams_for_batch)
