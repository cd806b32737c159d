"""Trainable heads: per-layer MLP fusion + transformer decoder + class logits.

Reference components being re-designed:
- ``SegFormerHead`` (WeCLIP_model/segformer_head.py:49-80): 11 independent
  2-layer MLPs (768 -> 256 -> relu -> 256), channel-concat, 1x1-conv fuse to
  256, Dropout2d(0.1).
- ``DecoderTransformer`` (WeCLIP_model/Decoder/TransDecoder.py:104-125):
  3-layer / 8-head / width-256 pre-LN transformer over the fused tokens,
  1x1 conv to class logits; per-layer attention maps returned (unused by the
  live reference path but part of the API).

TPU-first: the 11 per-layer MLPs are stacked along a leading axis and
applied with a single einsum (one MXU matmul instead of 11), the decoder
blocks reuse the shared masked attention op, and dropout is functional
(explicit rng).  Tokens stay in (B, P, C) layout throughout; callers reshape
to grids only at the boundary.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision
from weclip_tpu.models.clip import vit

Params = Dict[str, Any]


class HeadOutputs(NamedTuple):
    seg: jax.Array          # (B, P, num_classes) logits
    fused: jax.Array        # (B, P, embed) fused features (input to Gram affinity)
    dec_attn: jax.Array     # (layers, B, P, P) decoder attention maps


# ---------------------------------------------------------------------------
# init (torch default schemes, for training-dynamics parity)
# ---------------------------------------------------------------------------

def _linear_init(rng, out_dim: int, in_dim: int):
    """torch.nn.Linear / 1x1 Conv2d default: kaiming-uniform(a=sqrt(5)) ->
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight and bias."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(in_dim)
    w = jax.random.uniform(k1, (out_dim, in_dim), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (out_dim,), minval=-bound, maxval=bound)
    return w, b


def _xavier_uniform(rng, shape):
    fan_out, fan_in = shape[0], shape[1]
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, minval=-a, maxval=a)


def init_fuse_params(rng, n_layers: int, in_dim: int, embed: int) -> Params:
    ks = jax.random.split(rng, 2 * n_layers + 1)
    w1s, b1s, w2s, b2s = [], [], [], []
    for i in range(n_layers):
        w, b = _linear_init(ks[2 * i], embed, in_dim)
        w1s.append(w); b1s.append(b)
        w, b = _linear_init(ks[2 * i + 1], embed, embed)
        w2s.append(w); b2s.append(b)
    fw, fb = _linear_init(ks[-1], embed, embed * n_layers)
    return {
        "proj1_w": jnp.stack(w1s), "proj1_b": jnp.stack(b1s),
        "proj2_w": jnp.stack(w2s), "proj2_b": jnp.stack(b2s),
        "fuse_w": fw, "fuse_b": fb,
    }


def _init_dec_block(rng, width: int) -> Params:
    ks = jax.random.split(rng, 4)
    out_w, _ = _linear_init(ks[1], width, width)
    fc_w, fc_b = _linear_init(ks[2], 4 * width, width)
    pj_w, pj_b = _linear_init(ks[3], width, 4 * width)
    return {
        "ln_1": {"g": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "attn": {
            # torch nn.MultiheadAttention: xavier-uniform in_proj, zero biases
            "in_w": _xavier_uniform(ks[0], (3 * width, width)),
            "in_b": jnp.zeros((3 * width,)),
            "out_w": out_w,
            "out_b": jnp.zeros((width,)),
        },
        "ln_2": {"g": jnp.ones((width,)), "b": jnp.zeros((width,))},
        "mlp": {"fc_w": fc_w, "fc_b": fc_b, "proj_w": pj_w, "proj_b": pj_b},
    }


def init_decoder_params(rng, width: int, layers: int, num_classes: int) -> Params:
    ks = jax.random.split(rng, layers + 1)
    blocks = [_init_dec_block(ks[i], width) for i in range(layers)]
    pw, pb = _linear_init(ks[-1], num_classes, width)
    return {
        "blocks": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks),
        "pred_w": pw, "pred_b": pb,
    }


def init_head_params(rng, n_layers: int = 11, in_dim: int = 768,
                     embed: int = 256, dec_layers: int = 3,
                     num_classes: int = 21) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fuse": init_fuse_params(k1, n_layers, in_dim, embed),
        "decoder": init_decoder_params(k2, embed, dec_layers, num_classes),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def fuse_forward(p: Params, layer_tokens: jax.Array,
                 dropout_rng: Optional[jax.Array] = None,
                 dropout_rate: float = 0.1,
                 policy: precision.Policy = precision.DEFAULT) -> jax.Array:
    """Stacked per-layer MLPs + concat + 1x1 fuse (+ channel dropout).

    layer_tokens: (N_layers, B, P, D) patch tokens (CLS already dropped).
    Returns fused (B, P, embed) fp32.
    """
    cd = policy.compute_dtype
    # tokens go straight into the cd einsum (no fp32 staging copy of the
    # full (L,B,P,D) stack); accumulation stays fp32 on the MXU
    h = jnp.einsum("lbpd,led->lbpe", layer_tokens.astype(cd),
                   p["proj1_w"].astype(cd),
                   preferred_element_type=jnp.float32) + p["proj1_b"][:, None, None]
    h = jax.nn.relu(h)
    h = jnp.einsum("lbpe,lfe->lbpf", h.astype(cd), p["proj2_w"].astype(cd),
                   preferred_element_type=jnp.float32) + p["proj2_b"][:, None, None]
    # channel-concat in layer order (segformer_head.py:76)
    nl, b, pp, e = h.shape
    h = jnp.transpose(h, (1, 2, 0, 3)).reshape(b, pp, nl * e)
    out = jnp.einsum("bpc,ec->bpe", h.astype(cd), p["fuse_w"].astype(cd),
                     preferred_element_type=jnp.float32) + p["fuse_b"]
    if dropout_rng is not None and dropout_rate > 0.0:
        # Dropout2d drops whole channels (segformer_head.py:66)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    (b, 1, out.shape[-1]))
        out = out * keep / (1.0 - dropout_rate)
    return out


def decoder_forward(p: Params, fts: jax.Array, n_heads: int = 8,
                    valid_p: Optional[jax.Array] = None,
                    policy: precision.Policy = precision.DEFAULT,
                    allow_pallas: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """3-block transformer + linear prediction (TransDecoder.py:104-125).

    fts: (B, P, C).  Returns (seg logits (B, P, num_classes),
    per-layer attention (layers, B, P, P)).

    ``allow_pallas`` (gradient-free callers, i.e. eval): use the fused
    export-free attention — the per-layer maps mirror the reference's
    ``seg_attn_weight_list``, which no consumer reads (dead output,
    SURVEY appendix), so eval skips materializing the (B, H, P, P) score
    tensors; the returned stack is then zero-length."""
    x = fts
    pp = fts.shape[1]
    valid = valid_p
    if allow_pallas:
        # align the stream ONCE to the attention kernel's preferred padded
        # length (same contract as vit.vision_forward_frozen): the
        # tile-count-first q-tile pick means e.g. P=1024 -> lp=1056, and
        # without this every one of the 3 blocks pays its own q/k/v pad +
        # output slice inside the kernel wrapper (~2 ms/round of HBM glue
        # in the round-4 trace).  The pad rows are masked-invalid tokens;
        # their garbage outputs are sliced off before the prediction head.
        from weclip_tpu.ops.pallas_attention import pad_stream
        x, valid, _ = pad_stream(x, valid)

    def body(x, bp):
        x, attn_w, _ = vit.block_forward(bp, x, n_heads, valid=valid,
                                         policy=policy,
                                         allow_pallas=allow_pallas,
                                         want_attn=not allow_pallas)
        return x, ((attn_w,) if not allow_pallas else ())

    x, attns = jax.lax.scan(body, x, p["blocks"])
    x = x[:, :pp]
    attns = (attns[0] if not allow_pallas
             else jnp.zeros((0,) + fts.shape[:2] + (fts.shape[1],),
                            jnp.float32))
    cd = policy.compute_dtype
    seg = jnp.einsum("bpc,kc->bpk", x.astype(cd), p["pred_w"].astype(cd),
                     preferred_element_type=jnp.float32) + p["pred_b"]
    return seg, attns


def head_forward(p: Params, layer_tokens: jax.Array,
                 dropout_rng: Optional[jax.Array] = None,
                 valid_p: Optional[jax.Array] = None,
                 policy: precision.Policy = precision.DEFAULT,
                 allow_pallas: bool = False) -> HeadOutputs:
    fused = fuse_forward(p["fuse"], layer_tokens, dropout_rng, policy=policy)
    seg, dec_attn = decoder_forward(p["decoder"], fused, valid_p=valid_p,
                                    policy=policy, allow_pallas=allow_pallas)
    return HeadOutputs(seg, fused, dec_attn)
