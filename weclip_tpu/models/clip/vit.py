"""Frozen CLIP ViT-B/16 + text encoder as pure JAX functions.

Re-designs the reference's modified CLIP runtime (clip/model.py) TPU-first:

- Parameters are plain pytrees; the 12 transformer blocks are *stacked*
  along a leading axis so the frozen 11-block forward is one ``lax.scan``
  (one compiled block body instead of 11 unrolled ones).
- Tokens live on a fixed *padded* grid with a validity mask, so arbitrary
  image sizes / msc-flip scales compile to a single XLA program and batch
  across TPU cores (reference loops images one-by-one,
  test_msc_flip_voc.py:48-90).
- Per-layer token tensors and head-averaged attention maps are returned
  exactly like the reference's ``require_all_fts=True`` path
  (clip/model.py:225-243), because downstream CAM refinement consumes them.
- Patchify is an explicit unfold+matmul (MXU-shaped) rather than a
  convolution.

Numerical fidelity notes (SURVEY §7 "determinism traps"):
- LayerNorm in fp32 (clip/model.py:177-183), QKV/softmax fp32 islands
  (clip/myAtt.py:199), QuickGELU (clip/model.py:186-188).
- Positional embeddings bilinearly upsampled with align_corners=False
  (clip/model.py:11-27).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weclip_tpu.core import precision
from weclip_tpu.core.config import ClipConfig
from weclip_tpu.ops.attention import MhaParams, mha_auto, mha_with_weights
from weclip_tpu.ops.resize import _linear_matrix, upsample_pos_emb

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    """fp32 LayerNorm, output cast back to input dtype (clip/model.py:177-183)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def mlp_forward(p: Params, x: jax.Array, policy: precision.Policy) -> jax.Array:
    cd = policy.compute_dtype
    # matmuls accumulate fp32 on the MXU (preferred_element_type); the
    # *materialized* hidden activations live in the compute dtype so the
    # gelu/bias VPU passes stream half the bytes under bf16 (the reference
    # runs this entire block in fp16, clip/model.py:186-188)
    # dots emit the compute dtype directly (fp32 MXU accumulation kept;
    # only the HBM store is rounded) with biases added in cd — under bf16
    # this removes the fp32 rounding read+write pass per matmul and matches
    # the reference's fp16 GEMM epilogue; under fp32 it is identical
    h = (jnp.einsum("bld,ed->ble", x.astype(cd), p["fc_w"].astype(cd),
                    preferred_element_type=cd)
         + p["fc_b"].astype(cd))
    h = quick_gelu(h)
    y = jnp.einsum("ble,de->bld", h, p["proj_w"].astype(cd),
                   preferred_element_type=cd) + p["proj_b"].astype(cd)
    return y.astype(x.dtype)


def block_forward(
    p: Params,
    x: jax.Array,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
    allow_pallas: bool = False,
    want_attn: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Pre-LN residual attention block (clip/model.py:191-214).

    Returns (x_out, head_mean_attn (B,L,L), ln1_out) — ln1_out is exposed
    because GradCAM hooks the reference at exactly this tensor
    (model_attn_aff_voc.py:84, activations_and_gradients.py:11-37).
    ``allow_pallas`` selects the fused Pallas attention for gradient-free
    callers (the frozen backbone); ``want_attn=False`` skips the map export
    (returns None in its place).
    """
    a = layer_norm(x, p["ln_1"]["g"], p["ln_1"]["b"])
    mha = MhaParams(p["attn"]["in_w"], p["attn"]["in_b"],
                    p["attn"]["out_w"], p["attn"]["out_b"])
    attn_out, attn_w = mha_auto(a, mha, n_heads, valid=valid,
                                attn_bias=attn_bias, policy=policy,
                                allow_pallas=allow_pallas,
                                want_weights=want_attn)
    x = x + attn_out
    x = x + mlp_forward(p["mlp"], layer_norm(x, p["ln_2"]["g"], p["ln_2"]["b"]), policy)
    return x, attn_w, a


def block_forward_from_ln1(
    p: Params,
    x_in: jax.Array,
    a: jax.Array,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
) -> Tuple[jax.Array, jax.Array]:
    """Block forward with the ln_1 output ``a`` supplied explicitly.

    This is the differentiable split used by vjp-GradCAM: gradients w.r.t.
    ``a`` reproduce the reference's register_hook tap on ln_1's output.
    """
    mha = MhaParams(p["attn"]["in_w"], p["attn"]["in_b"],
                    p["attn"]["out_w"], p["attn"]["out_b"])
    from weclip_tpu.core.runtime import pallas_ok
    if pallas_ok() and a.shape[1] >= 256:
        # fused Pallas forward + flash-style Pallas backward: the GradCAM
        # pullback through the XLA attention materialized multiple fp32
        # (B, H, L, L) HBM temporaries per class seed.  The exported map is
        # consumed under has_aux/stop_gradient only (a requirement of
        # attention_core_diff, which every caller here satisfies).
        from weclip_tpu.ops.pallas_attention import mha_with_weights_fused
        attn_out, attn_w = mha_with_weights_fused(a, mha, n_heads,
                                                  valid=valid, policy=policy)
    else:
        attn_out, attn_w = mha_with_weights(a, mha, n_heads, valid=valid,
                                            policy=policy)
    x = x_in + attn_out
    x = x + mlp_forward(p["mlp"], layer_norm(x, p["ln_2"]["g"], p["ln_2"]["b"]), policy)
    return x, attn_w


# ---------------------------------------------------------------------------
# patchify + embeddings
# ---------------------------------------------------------------------------

def patchify(img: jax.Array, conv_w: jax.Array, patch: int,
             policy: precision.Policy) -> jax.Array:
    """16x16/stride-16 patch embedding as unfold+matmul (clip/model.py:251,267-269).

    img: (B, 3, H, W) with 16 | H, W.  Returns (B, gh*gw, width).
    """
    b, c, h, w = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * patch * patch)
    wmat = conv_w.reshape(conv_w.shape[0], -1)               # (width, 3*p*p)
    cd = policy.compute_dtype
    y = jnp.einsum("bpe,de->bpd", x.astype(cd), wmat.astype(cd),
                   preferred_element_type=jnp.float32)
    return y


def build_pos_emb(params: Params, gh: int, gw: int,
                  pad_gh: Optional[int] = None, pad_gw: Optional[int] = None) -> jax.Array:
    """Upsampled positional embedding on the (padded) grid: (1+G*G, width)."""
    pe = upsample_pos_emb(params["positional_embedding"], gh, gw)
    if pad_gh is None:
        return pe
    d = pe.shape[-1]
    grid = jnp.zeros((pad_gh, pad_gw, d), pe.dtype)
    grid = grid.at[:gh, :gw].set(pe[1:].reshape(gh, gw, d))
    return jnp.concatenate([pe[:1], grid.reshape(pad_gh * pad_gw, d)], axis=0)


def pos_emb_host(pos_emb: np.ndarray, gh: int, gw: int,
                 pad_gh: int, pad_gw: int) -> np.ndarray:
    """Host (numpy) mirror of build_pos_emb for per-image variable sizes."""
    n = pos_emb.shape[0] - 1
    g = int(round(n ** 0.5))
    d = pos_emb.shape[-1]
    grid = pos_emb[1:].reshape(g, g, d).astype(np.float32)
    mh = _linear_matrix(g, gh, False)
    mw = _linear_matrix(g, gw, False)
    grid = np.einsum("oh,hwd->owd", mh, grid)
    grid = np.einsum("pw,owd->opd", mw, grid)
    out = np.zeros((pad_gh, pad_gw, d), np.float32)
    out[:gh, :gw] = grid
    return np.concatenate([pos_emb[:1].astype(np.float32),
                           out.reshape(pad_gh * pad_gw, d)], axis=0)


def grid_valid_mask(gh: jax.Array, gw: jax.Array, pad_gh: int, pad_gw: int) -> jax.Array:
    """(1+G*G,) token-validity mask for a (gh, gw) valid region (traced sizes ok)."""
    rows = jnp.arange(pad_gh)[:, None] < gh
    cols = jnp.arange(pad_gw)[None, :] < gw
    grid = (rows & cols).reshape(-1)
    return jnp.concatenate([jnp.ones((1,), bool), grid])


# ---------------------------------------------------------------------------
# frozen vision forward
# ---------------------------------------------------------------------------

class VisionFeatures(NamedTuple):
    """Per-layer products of the frozen 11-block forward
    (reference require_all_fts=True, clip/model.py:225-243).

    ``Ls`` is the STREAM length: the input L (1 + padded-grid tokens) rounded
    up once to the attention kernel's preferred alignment
    (ops/pallas_attention.py::stream_pad_len), so no per-layer pad/slice
    copies happen inside the scan.  Tokens beyond the input L are invalid
    exactly like padded-grid tokens (``valid`` marks them False); consumers
    slice the patch block as ``[1:1+P]`` with P from the ORIGINAL batch
    valid/grid, never ``[1:]``."""
    layer_tokens: jax.Array      # (11, B, Ls, D) policy compute dtype
    layer_attn: jax.Array        # (11 or 0, B, Ls, Ls) fp32 — full frozen
                                 # stack (0 when with_attn=False); consumers
                                 # tail-slice the layer axis
    valid: jax.Array             # (B, Ls) bool — stream-padded validity


def vision_forward_frozen(
    params: Params,
    img: jax.Array,
    pos_emb: jax.Array,
    valid: jax.Array,
    cfg: ClipConfig,
    policy: precision.Policy = precision.DEFAULT,
    with_attn: bool = True,
    attn_rows: int = None,
) -> VisionFeatures:
    """Frozen CLIP forward over blocks 0..10 with feature/attention export.

    img:     (B, 3, H, W) normalized, padded to a multiple of 16.
    pos_emb: (B or 1, L, D) per-image positional embedding on the padded grid.
    valid:   (B, L) token-validity mask (CLS first).

    ``with_attn=False`` (seg-only forwards: eval scale-2, the val
    short-circuit) skips the attention-map export entirely —
    ``VisionFeatures.layer_attn`` comes back with a zero-length leading
    axis.

    ``attn_rows=k`` exports maps only for the FIRST k batch rows (layer_attn
    has leading batch size k).  The msc-flip engine runs flip-concatenated
    batches but the pseudo-label chain only consumes the unflipped half's
    attention (test_msc_flip_voc.py:69-71 discards the flipped CAM) — the
    flipped half's 11x(L,L) fp32 maps are ~350 MB/round of dead HBM writes.

    Wrapped in stop_gradient by callers — the reference runs these blocks
    under torch.no_grad() (clip/model.py:228-233).
    """
    b = img.shape[0]
    x = patchify(img, params["conv1_w"], cfg.patch_size, policy)     # (B,P,D) fp32
    cls = params["class_embedding"].astype(jnp.float32)[None, None, :]
    x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, x.shape[-1])), x], axis=1)
    x = x + pos_emb.astype(jnp.float32)
    x = layer_norm(x, params["ln_pre"]["g"], params["ln_pre"]["b"])
    x = jnp.where(valid[..., None], x, 0.0)
    # the residual stream runs in the policy compute dtype: the reference
    # CLIP is end-to-end fp16 (clip.load model.half()), so a bf16 stream is
    # the faithful TPU equivalent and halves every LN/residual VPU pass and
    # the per-layer token export traffic.  FP32 policies are unchanged.
    x = x.astype(policy.compute_dtype)
    # pad the stream ONCE to the attention kernel's preferred alignment so
    # the 12 per-layer kernel calls (and the GradCAM pullback downstream)
    # skip their q/k/v pad copies and output slices entirely.  The extra
    # tokens are ordinary invalid tokens: zero-valued, masked everywhere the
    # padded-grid tokens already are.  See VisionFeatures docstring.
    from weclip_tpu.ops.pallas_attention import pad_stream
    x, valid, _ = pad_stream(x, valid)

    n_frozen = cfg.vision_layers - 1
    blocks = params["blocks"]
    frozen = jax.tree_util.tree_map(lambda a: a[:n_frozen], blocks)

    k = attn_rows if (with_attn and attn_rows is not None) else b

    def body(x, bp):
        # frozen region: the fused Pallas attention is safe here (no VJP)
        x, attn_w, _ = block_forward(bp, x, cfg.vision_heads, valid=valid,
                                     policy=policy, allow_pallas=True,
                                     want_attn=with_attn)
        return x, ((x, attn_w) if with_attn else (x,))

    if with_attn and k < b:
        # flip-half export skip: the halves are carried SEPARATELY — one
        # batch split before the loop and one merge after, instead of the
        # per-layer x[:k]/x[k:] slices + (B, L, D) concat a single scan
        # carry forced (the unrolled loop needs no joint carry).  Ops per
        # half are identical, so outputs are bit-equal to the old path.
        x1, x2, v1, v2 = x[:k], x[k:], valid[:k], valid[k:]
        xs1, xs2, attn_l = [], [], []
        for i in range(n_frozen):
            bp = jax.tree_util.tree_map(lambda a: a[i], frozen)
            x1, attn_w, _ = block_forward(bp, x1, cfg.vision_heads, valid=v1,
                                          policy=policy, allow_pallas=True,
                                          want_attn=True)
            x2, _, _ = block_forward(bp, x2, cfg.vision_heads, valid=v2,
                                     policy=policy, allow_pallas=True,
                                     want_attn=False)
            xs1.append(x1)
            xs2.append(x2)
            attn_l.append(attn_w)
        xs = jnp.concatenate([jnp.stack(xs1), jnp.stack(xs2)], axis=1)
        # NOTE: no keep_attn slicing here — every fusion consumer takes a
        # *tail* of this stack, and slicing it standalone materialized a
        # 7/11 copy (~2.3 ms/round at eval shapes) that XLA fuses for free
        # when the tail is taken at the consumption site.
        attns = jax.lax.stop_gradient(jnp.stack(attn_l))
    elif with_attn:
        _, (xs, attns) = jax.lax.scan(body, x, frozen, unroll=True)
        attns = jax.lax.stop_gradient(attns)
    else:
        _, (xs,) = jax.lax.scan(body, x, frozen, unroll=True)
        l = x.shape[1]
        attns = jnp.zeros((0, b, l, l), jnp.float32)
    xs = jax.lax.stop_gradient(xs)
    return VisionFeatures(xs, attns, valid)


# ---------------------------------------------------------------------------
# text encoder
# ---------------------------------------------------------------------------

def causal_bias(l: int) -> jax.Array:
    """Additive causal mask (clip/model.py:375-381)."""
    m = jnp.full((l, l), -jnp.inf)
    m = jnp.triu(m, 1)
    return m[None, None]


def encode_text(params: Params, tokens: jax.Array, cfg: ClipConfig,
                policy: precision.Policy = precision.FP32) -> jax.Array:
    """CLIP text encoder (clip/model.py:392-405). tokens: (N, 77) int32.

    Runs once at model init to build the class-prompt embedding table, so it
    defaults to fp32.
    """
    x = params["token_embedding"][tokens].astype(jnp.float32)
    x = x + params["positional_embedding"].astype(jnp.float32)[None]
    bias = causal_bias(cfg.context_length)

    def body(x, bp):
        x, _, _ = block_forward(bp, x, cfg.transformer_heads, attn_bias=bias,
                                policy=policy)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["ln_final"]["g"], params["ln_final"]["b"])
    eot = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot]
    return x @ params["text_projection"].astype(jnp.float32)


# ---------------------------------------------------------------------------
# initialization (CLIP's scheme, clip/model.py:346-373)
# ---------------------------------------------------------------------------

def _init_block(rng, width: int, n_layers: int) -> Params:
    ks = jax.random.split(rng, 4)
    attn_std = width ** -0.5
    # reference: proj_std scales with the tower's layer count
    # (clip/model.py:363, (2 * self.transformer.layers) ** -0.5)
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": {"g": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "attn": {
            "in_w": jax.random.normal(ks[0], (3 * width, width)) * attn_std,
            "in_b": jnp.zeros((3 * width,)),
            "out_w": jax.random.normal(ks[1], (width, width)) * proj_std,
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": {"g": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "mlp": {
            "fc_w": jax.random.normal(ks[2], (4 * width, width)) * fc_std,
            "fc_b": jnp.zeros((4 * width,)),
            "proj_w": jax.random.normal(ks[3], (width, 4 * width)) * proj_std,
            "proj_b": jnp.zeros((width,)),
        },
    }


def _stack_blocks(blocks) -> Params:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def init_vision_params(rng: jax.Array, cfg: ClipConfig) -> Params:
    w = cfg.vision_width
    scale = w ** -0.5
    g = 224 // cfg.patch_size
    ks = jax.random.split(rng, 5 + cfg.vision_layers)
    return {
        "conv1_w": jax.random.normal(ks[0], (w, 3, cfg.patch_size, cfg.patch_size)) * scale,
        "class_embedding": jax.random.normal(ks[1], (w,)) * scale,
        "positional_embedding": jax.random.normal(ks[2], (g * g + 1, w)) * scale,
        "ln_pre": {"g": jnp.ones((w,)), "b": jnp.zeros((w,))},
        "blocks": _stack_blocks([_init_block(ks[5 + i], w, cfg.vision_layers)
                                 for i in range(cfg.vision_layers)]),
        "ln_post": {"g": jnp.ones((w,)), "b": jnp.zeros((w,))},
        "proj": jax.random.normal(ks[3], (w, cfg.embed_dim)) * scale,
    }


def init_text_params(rng: jax.Array, cfg: ClipConfig) -> Params:
    w = cfg.transformer_width
    ks = jax.random.split(rng, 4 + cfg.transformer_layers)
    return {
        "token_embedding": jax.random.normal(ks[0], (cfg.vocab_size, w)) * 0.02,
        "positional_embedding": jax.random.normal(ks[1], (cfg.context_length, w)) * 0.01,
        "blocks": _stack_blocks([_init_block(ks[4 + i], w,
                                             cfg.transformer_layers)
                                 for i in range(cfg.transformer_layers)]),
        "ln_final": {"g": jnp.ones((w,)), "b": jnp.zeros((w,))},
        "text_projection": jax.random.normal(ks[2], (w, cfg.embed_dim)) * (w ** -0.5),
    }


def init_clip_params(rng: jax.Array, cfg: ClipConfig) -> Params:
    kv, kt = jax.random.split(rng)
    return {
        "visual": init_vision_params(kv, cfg),
        "text": init_text_params(kt, cfg),
        "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32),
    }
