"""ViT-CoMer branch: CNN multi-scale pyramid + MRFP + CTI bidirectional
fusion, TPU-native.

The reference repo contains NO CoMer code — only the paper
(/root/reference/ViT_CoMer.pdf) and the driver's BASELINE.json config
"WeCLIP+ViT-CoMer backbone: CTI multi-scale conv-interaction fused with
frozen CLIP features" (SURVEY §2.12).  This module implements the paper's
three components, re-designed for XLA:

- **CNN stem -> pyramid**: strided convolutions producing C3/C4/C5 at
  1/8, 1/16, 1/32 resolution ("pyramid C3, C4, C5 with resolutions of
  1/8, 1/16, 1/32").
- **MRFP** (Multi-Receptive-Field Feature Pyramid): per-level parallel
  dilated 3x3 convolutions + pointwise fuse, residual ("MRFP can supplement
  ViT with more abundant multi-scale spatial information").  Deformable
  convs in the paper become multi-dilation convs — static-shape,
  MXU-lowered, and the standard TPU substitute for data-dependent sampling.
- **CTI** (CNN-Transformer bidirectional Interaction): at selected frozen
  ViT blocks, cross-attention injects ViT semantics into the pyramid tokens
  and pyramid detail back into a trainable token stream aligned with the
  ViT grid ("CTI can fuse multi-scale features from CNN and Transformer",
  "operates at the beginning and end of each stage").

The branch runs *alongside* the frozen CLIP ViT (which stays byte-frozen —
its exported per-layer tokens are the interaction inputs), and its C4-level
output is added to the SegFormer fusion features ahead of the decoder.
All of it trains with the head parameters.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision
from weclip_tpu.core.config import ComerConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, dilation: int = 1,
           policy: precision.Policy = precision.DEFAULT) -> jax.Array:
    """NCHW conv with SAME padding.

    No ``preferred_element_type``: the conv vjp rejects the fp32 cotangent
    against bf16 operands ("requires arguments to have the same dtypes").
    The MXU still accumulates fp32 internally for bf16 convs — only the
    output store rounds to bf16 — and every consumer (group_norm, residual
    adds) immediately upcasts to fp32."""
    cd = policy.compute_dtype
    return jax.lax.conv_general_dilated(
        x.astype(cd), w.astype(cd), (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def group_norm(x: jax.Array, g: jax.Array, b: jax.Array,
               groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """fp32 statistics, output back in the input dtype (the branch's
    activation streams live in the compute dtype end-to-end — r3 xprof: the
    fp32 streams cost ~9.5 ms/round of unfused bf16<->fp32 converts at the
    kernel boundaries plus double HBM traffic)."""
    n, c, h, w = x.shape
    groups = min(groups, c)
    xf = x.astype(jnp.float32).reshape(n, groups, c // groups, h, w)
    mu = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, c, h, w)
    y = xf * g[None, :, None, None] + b[None, :, None, None]
    return y.astype(x.dtype)


def _xla_cross_core(qp: jax.Array, kp: jax.Array, vp: jax.Array,
                    kvmask: jax.Array, cd) -> jax.Array:
    """(B, Lq, H, hd) x (B, Lk, H, hd) -> (B, Lq, H, hd); kvmask (B, Lk)
    float {0,1}.  qp is pre-scaled."""
    s = jnp.einsum("bqhe,bkhe->bhqk", qp.astype(cd), kp.astype(cd),
                   preferred_element_type=jnp.float32)
    s = jnp.where(kvmask[:, None, None, :] > 0, s, -jnp.inf)
    smax = jnp.max(s, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(s - smax)
    ex = jnp.where(kvmask[:, None, None, :] > 0, ex, 0.0)
    attn = ex / jnp.maximum(ex.sum(-1, keepdims=True), 1e-30)
    return jnp.einsum("bhqk,bkhe->bqhe", attn.astype(cd), vp.astype(cd),
                      preferred_element_type=jnp.float32)


def _pallas_cross(qp, kp, vp, kvmask, cd):
    # fused flash-style attention: the XLA formulation materializes fp32
    # (B, H, Lq, Lk) score tensors three times — at CTI eval shapes
    # (Lq up to ~5.4k pyramid tokens) that was ~131 ms/round of HBM traffic
    from weclip_tpu.ops.pallas_attention import cross_attention_core_pallas
    out = cross_attention_core_pallas(
        qp.transpose(0, 2, 1, 3), kp.transpose(0, 2, 1, 3),
        vp.transpose(0, 2, 1, 3), kvmask, score_dtype=cd)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cross_core_fused(qp, kp, vp, kvmask, cd):
    # NOTE: the PRIMAL must be the Pallas path — custom_vjp only invokes
    # f_fwd under differentiation; plain (eval) traces run this body
    return _pallas_cross(qp, kp, vp, kvmask, cd)


def _cross_core_fwd(qp, kp, vp, kvmask, cd):
    return _pallas_cross(qp, kp, vp, kvmask, cd), (qp, kp, vp, kvmask)


def _cross_core_bwd(cd, res, g):
    # flash-style Pallas backward (qp arrives pre-scaled, so no extra chain
    # factor); measured: the r3 XLA-recompute backward cost the CoMer train
    # step 50.3 -> 55.9 ms, the fused backward avoids both the recompute's
    # and the vjp's (B, H, Lq, Lk) HBM score materializations
    from weclip_tpu.ops.pallas_attention import attention_bwd_pallas
    qp, kp, vp, kvmask = res
    t = lambda a: a.transpose(0, 2, 1, 3)
    dq, dk, dv = attention_bwd_pallas(t(qp), t(kp), t(vp), t(g), kvmask,
                                      interpret=jax.default_backend() != "tpu",
                                      score_dtype=cd)
    # cotangents must match the primal dtypes (the head tensors live in the
    # compute dtype)
    return (t(dq).astype(qp.dtype), t(dk).astype(kp.dtype),
            t(dv).astype(vp.dtype), jnp.zeros_like(kvmask))


_cross_core_fused.defvjp(_cross_core_fwd, _cross_core_bwd)


def cross_attention(q: jax.Array, kv: jax.Array, p: Params, n_heads: int,
                    kv_valid: Optional[jax.Array] = None,
                    policy: precision.Policy = precision.DEFAULT) -> jax.Array:
    """Multi-head cross-attention (B, Lq, C) x (B, Lk, C) -> (B, Lq, C).

    On TPU the score/softmax/value chain runs as a fused Pallas kernel
    (custom_vjp: Pallas forward, XLA-recompute backward — CoMer trains, so
    differentiability is required); elsewhere the plain XLA formulation."""
    cd = policy.compute_dtype
    b, lq, c = q.shape
    hd = c // n_heads
    # projections accumulate fp32 on the MXU; the materialized head tensors
    # live in the compute dtype (halves the custom_vjp residual + kernel
    # input HBM traffic; the kernel's softmax stays fp32 inside)
    qp = (jnp.einsum("blc,dc->bld", q.astype(cd), p["q_w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + p["q_b"]).astype(cd)
    kp = (jnp.einsum("blc,dc->bld", kv.astype(cd), p["k_w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + p["k_b"]).astype(cd)
    vp = (jnp.einsum("blc,dc->bld", kv.astype(cd), p["v_w"].astype(cd),
                     preferred_element_type=jnp.float32)
          + p["v_b"]).astype(cd)
    qp = qp.reshape(b, lq, n_heads, hd) * jnp.asarray(hd ** -0.5, cd)
    kp = kp.reshape(b, -1, n_heads, hd)
    vp = vp.reshape(b, -1, n_heads, hd)
    kvmask = (kv_valid.astype(jnp.float32) if kv_valid is not None
              else jnp.ones((b, kp.shape[1]), jnp.float32))
    from weclip_tpu.core.runtime import pallas_ok
    if pallas_ok():
        o = _cross_core_fused(qp, kp, vp, kvmask, cd)
    else:
        o = _xla_cross_core(qp, kp, vp, kvmask, cd)
    o = o.reshape(b, lq, c)
    # output in the compute dtype so the residual streams stay in it
    return (jnp.einsum("blc,dc->bld", o.astype(cd), p["o_w"].astype(cd),
                       preferred_element_type=jnp.float32)
            + p["o_b"]).astype(cd)


def layer_norm_1d(x, g, b, eps=1e-5):
    """fp32 statistics, output back in the input dtype."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * g + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(rng, out_c, in_c, k):
    fan_in = in_c * k * k
    bound = math.sqrt(2.0 / fan_in)
    return jax.random.normal(rng, (out_c, in_c, k, k)) * bound


def _lin_init(rng, out_c, in_c):
    bound = 1.0 / math.sqrt(in_c)
    return jax.random.uniform(rng, (out_c, in_c), minval=-bound, maxval=bound)


def _gn(c):
    return {"g": jnp.ones((c,)), "b": jnp.zeros((c,))}


def _xattn_init(rng, c):
    ks = jax.random.split(rng, 4)
    return {
        "q_w": _lin_init(ks[0], c, c), "q_b": jnp.zeros((c,)),
        "k_w": _lin_init(ks[1], c, c), "k_b": jnp.zeros((c,)),
        "v_w": _lin_init(ks[2], c, c), "v_b": jnp.zeros((c,)),
        # zero-init output projection: the branch starts as identity, so
        # enabling CoMer does not perturb the pretrained-CLIP signal at step 0
        "o_w": jnp.zeros((c, c)), "o_b": jnp.zeros((c,)),
    }


def init_comer_params(rng, cfg: ComerConfig, vit_width: int = 768,
                      embed: int = 256) -> Params:
    c3, c4, c5 = cfg.pyramid_dims
    sw = cfg.stem_width
    ks = jax.random.split(rng, 32)
    p: Params = {
        "stem": {
            "conv1_w": _conv_init(ks[0], sw, 3, 3), "gn1": _gn(sw),
            "conv2_w": _conv_init(ks[1], sw, sw, 3), "gn2": _gn(sw),
            "conv3_w": _conv_init(ks[2], c3, sw, 3), "gn3": _gn(c3),
            "conv4_w": _conv_init(ks[3], c4, c3, 3), "gn4": _gn(c4),
            "conv5_w": _conv_init(ks[4], c5, c4, 3), "gn5": _gn(c5),
        },
        "vit_proj_w": _lin_init(ks[5], embed, vit_width),
        "vit_proj_b": jnp.zeros((embed,)),
        "mrfp": [],
        "cti": [],
        "out_gn": _gn(embed),
        # zero-init: CoMer contribution to the fuse features starts at 0
        "out_w": jnp.zeros((embed, embed)),
        "out_b": jnp.zeros((embed,)),
    }
    dims = {"c3": c3, "c4": c4, "c5": c5}
    for li, (name, c) in enumerate(dims.items()):
        branch = {
            # fold the dilation into the key: the parallel branches exist to
            # learn DIFFERENT receptive fields and must not start identical
            f"d{d}_w": _conv_init(jax.random.fold_in(ks[6 + li * 4], d),
                                  c, c, 3)
            for d in cfg.mrfp_dilations
        }
        branch["fuse_w"] = _conv_init(ks[7 + li * 4], c, c * len(cfg.mrfp_dilations), 1)
        branch["gn"] = _gn(c)
        p["mrfp"].append(branch)
        p[f"lvl_proj_{name}_w"] = _lin_init(ks[8 + li * 4], embed, c)
        p[f"lvl_proj_{name}_b"] = jnp.zeros((embed,))
    for i, _ in enumerate(cfg.interaction_indexes):
        p["cti"].append({
            "inj": _xattn_init(ks[20 + 2 * i], embed),
            "ext": _xattn_init(ks[21 + 2 * i], embed),
            "ln_q": {"g": jnp.ones((embed,)), "b": jnp.zeros((embed,))},
            "ln_kv": {"g": jnp.ones((embed,)), "b": jnp.zeros((embed,))},
        })
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _mrfp(x: jax.Array, p: Params, dilations, policy) -> jax.Array:
    outs = [conv2d(x, p[f"d{d}_w"], dilation=d, policy=policy)
            for d in dilations]
    y = conv2d(jnp.concatenate(outs, axis=1), p["fuse_w"], policy=policy)
    y = group_norm(y, p["gn"]["g"], p["gn"]["b"])
    return x + jax.nn.gelu(y)


def comer_forward(
    p: Params,
    img: jax.Array,               # (B, 3, H, W) normalized (padded ok)
    vit_layer_tokens: jax.Array,  # (n_layers, B, P, D) frozen ViT patch tokens
    valid_p: jax.Array,           # (B, P) patch validity on the 1/16 grid
    cfg: ComerConfig,
    policy: precision.Policy = precision.DEFAULT,
) -> jax.Array:
    """Returns (B, P, embed) fusion features aligned to the ViT 1/16 grid."""
    s = p["stem"]
    x = jax.nn.gelu(group_norm(conv2d(img, s["conv1_w"], 2, policy=policy),
                               s["gn1"]["g"], s["gn1"]["b"]))
    x = jax.nn.gelu(group_norm(conv2d(x, s["conv2_w"], 2, policy=policy),
                               s["gn2"]["g"], s["gn2"]["b"]))
    c3 = jax.nn.gelu(group_norm(conv2d(x, s["conv3_w"], 2, policy=policy),
                                s["gn3"]["g"], s["gn3"]["b"]))   # 1/8
    c4 = jax.nn.gelu(group_norm(conv2d(c3, s["conv4_w"], 2, policy=policy),
                                s["gn4"]["g"], s["gn4"]["b"]))   # 1/16
    c5 = jax.nn.gelu(group_norm(conv2d(c4, s["conv5_w"], 2, policy=policy),
                                s["gn5"]["g"], s["gn5"]["b"]))   # 1/32

    c3 = _mrfp(c3, p["mrfp"][0], cfg.mrfp_dilations, policy)
    c4 = _mrfp(c4, p["mrfp"][1], cfg.mrfp_dilations, policy)
    c5 = _mrfp(c5, p["mrfp"][2], cfg.mrfp_dilations, policy)

    b = img.shape[0]
    cd = policy.compute_dtype
    embed = p["vit_proj_b"].shape[0]

    def tokens(level, name):
        t = level.reshape(b, level.shape[1], -1).transpose(0, 2, 1)
        return (jnp.einsum("bpc,ec->bpe", t.astype(cd),
                           p[f"lvl_proj_{name}_w"].astype(cd),
                           preferred_element_type=jnp.float32)
                + p[f"lvl_proj_{name}_b"]).astype(cd)

    # multi-scale token stream (B, P3+P4+P5 -> padded to 128, embed).  The
    # streams are zero-padded to lane-aligned lengths AT CONSTRUCTION (an
    # extra concat chunk / projected zero rows) so the CTI attention kernel
    # pads nothing: jnp.pad of the (B, ~5.4k, 256) streams inside the
    # kernel wrapper copied the full tensors (~8.5 ms/round, r3 xprof).
    # Padded rows are garbage-in-garbage-out: both attention directions
    # mask them as keys (padded kv_valid/ms_valid) and the final output
    # slices back to P.
    lvl = [tokens(c3, "c3"), tokens(c4, "c4"), tokens(c5, "c5")]
    lms = sum(t.shape[1] for t in lvl)
    lmsp = -(-lms // 128) * 128
    if lmsp != lms:
        lvl.append(jnp.zeros((b, lmsp - lms, embed), cd))
    ms = jnp.concatenate(lvl, axis=1)
    # validity per level from the 1/16 grid mask
    g = int(math.isqrt(valid_p.shape[1]))
    vg = valid_p.reshape(b, g, g)

    def level_valid(scale_num, scale_den):
        hh = c3.shape[-2] if scale_den == 8 else (
            c4.shape[-2] if scale_den == 16 else c5.shape[-2])
        m = jax.image.resize(vg.astype(jnp.float32), (b, hh, hh), "nearest")
        return m.reshape(b, -1) > 0.5

    ms_valid = jnp.concatenate([level_valid(1, 8), level_valid(1, 16),
                                level_valid(1, 32)], axis=1)
    ms_valid = jnp.pad(ms_valid, [(0, 0), (0, lmsp - lms)])

    # ViT-aligned trainable stream; each stage adds ITS interaction layer's
    # projected tokens exactly once (the stream starts at zero — a pre-loop
    # init from idxs[0] would double-count the first stage's tokens).
    # Padded to a lane-aligned length like ms.
    pp = valid_p.shape[1]
    ppp = -(-pp // 128) * 128
    vl_pad = jnp.pad(vit_layer_tokens, [(0, 0), (0, 0), (0, ppp - pp), (0, 0)])
    valid_pq = jnp.pad(valid_p, [(0, 0), (0, ppp - pp)])
    idxs = cfg.interaction_indexes

    def vit_tok(layer_idx):
        return (jnp.einsum("bpd,ed->bpe", vl_pad[layer_idx].astype(cd),
                           p["vit_proj_w"].astype(cd),
                           preferred_element_type=jnp.float32)
                + p["vit_proj_b"]).astype(cd)

    v = jnp.zeros((vl_pad.shape[1], ppp, p["vit_proj_b"].shape[0]), cd)

    for i, layer_idx in enumerate(idxs):
        cp = p["cti"][i]
        vt = vit_tok(min(layer_idx, vit_layer_tokens.shape[0] - 1))
        v = v + vt
        vq = layer_norm_1d(v, cp["ln_q"]["g"], cp["ln_q"]["b"])
        msn = layer_norm_1d(ms, cp["ln_kv"]["g"], cp["ln_kv"]["b"])
        # inject transformer semantics into the CNN pyramid ("beginning of
        # the stage"), THEN extract multi-scale detail from the UPDATED
        # pyramid back into the ViT-aligned stream ("end of the stage") —
        # extraction reading the pre-injection pyramid would make the last
        # stage's injector dead computation (caught by the grad-coverage
        # test in tests/test_comer.py)
        ms = ms + cross_attention(msn, vq, cp["inj"], cfg.cti_heads,
                                  kv_valid=valid_pq, policy=policy)
        msn = layer_norm_1d(ms, cp["ln_kv"]["g"], cp["ln_kv"]["b"])
        v = v + cross_attention(vq, msn, cp["ext"], cfg.cti_heads,
                                kv_valid=ms_valid, policy=policy)

    v = v[:, :pp]
    out = jnp.einsum("bpe,fe->bpf", v.astype(cd), p["out_w"].astype(cd),
                     preferred_element_type=jnp.float32) + p["out_b"]
    out = layer_norm_1d(out, p["out_gn"]["g"], p["out_gn"]["b"])
    return jnp.where(valid_p[..., None].astype(bool), out, 0.0)
