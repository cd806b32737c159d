"""Multi-head self-attention that also exports head-averaged attention maps.

This replaces the reference's vendored ``clip/myAtt.py`` (a modified
torch.nn.MultiheadAttention whose sole purpose is to return
``attn.sum(heads)/num_heads`` of shape (N, L, L) from every block,
myAtt.py:323-326).  The exported maps are load-bearing: pseudo-labels are
built from the mean of the last-k per-layer attention maps (clip_tool.py:
152-176).

TPU-first design notes:
- batch-first (B, L, D) layout; all matmuls carry
  ``preferred_element_type=float32`` so the MXU accumulates in fp32,
- softmax in fp32 (the reference computes the whole QKV block in fp32,
  myAtt.py:199),
- a key/query validity mask generalizes every caller to padded batched
  inputs (one compiled program for arbitrary image sizes),
- an additive attention bias supports the text encoder's causal mask
  (clip/model.py:375-381).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from weclip_tpu.core import precision


class MhaParams(NamedTuple):
    """torch-layout multihead attention parameters.

    in_w: (3D, D) packed q/k/v projection;  in_b: (3D,)
    out_w: (D, D);  out_b: (D,)
    """
    in_w: jax.Array
    in_b: jax.Array
    out_w: jax.Array
    out_b: jax.Array


def mha_with_weights(
    x: jax.Array,
    p: MhaParams,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
) -> Tuple[jax.Array, jax.Array]:
    """Self-attention returning (output (B,L,D), head-mean weights (B,L,L)).

    valid: optional (B, L) bool/float token-validity mask. Invalid keys get
    zero attention mass; rows of invalid queries are zeroed in both outputs.
    """
    b, l, d = x.shape
    hd = d // n_heads
    assert hd * n_heads == d

    cd = policy.compute_dtype
    xc = x.astype(cd)
    # qkv materializes in the compute dtype (fp32 MXU accumulation kept);
    # the fp32 islands below (softmax, score accumulation) are unchanged.
    # Leading-axis indexing of the packed projection instead of jnp.split
    # (the feature-axis split copied all three tensors).
    w3 = p.in_w.reshape(3, d, d)
    b3 = p.in_b.reshape(3, d)
    # the dot emits the compute dtype directly (the MXU still accumulates
    # fp32; only the HBM store is rounded) and the bias is added in cd —
    # under bf16 this removes a full fp32 read+write rounding pass per
    # projection and matches the reference's fp16 GEMM epilogue
    # (F.linear in half adds the bias in half); under fp32 it is identical.
    qkv = (jnp.einsum("bld,ted->tble", xc, w3.astype(cd),
                      preferred_element_type=cd)
           + b3[:, None, None, :].astype(cd))
    q, k, v = qkv[0], qkv[1], qkv[2]

    # scale q by 1/sqrt(head_dim) before the score matmul (myAtt.py:54)
    q = (q * jnp.asarray(hd ** -0.5, cd)).reshape(b, l, n_heads, hd)
    k = k.reshape(b, l, n_heads, hd)
    v = v.reshape(b, l, n_heads, hd)

    scores = jnp.einsum("bqhe,bkhe->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(jnp.float32)
    if valid is not None:
        kmask = valid.astype(bool)[:, None, None, :]          # (B,1,1,L)
        scores = jnp.where(kmask, scores, -jnp.inf)

    # fp32 masked softmax, NaN-safe for fully-masked rows
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(scores - smax)
    if valid is not None:
        ex = jnp.where(kmask, ex, 0.0)
    denom = jnp.sum(ex, axis=-1, keepdims=True)
    attn = ex / jnp.maximum(denom, 1e-30)                     # (B,h,L,L) fp32

    out = jnp.einsum("bhqk,bkhe->bqhe", attn.astype(cd), v.astype(cd),
                     preferred_element_type=cd)
    out = out.reshape(b, l, d)
    out = jnp.einsum("bld,ed->ble", out, p.out_w.astype(cd),
                     preferred_element_type=cd)
    out = out + p.out_b.astype(cd)

    attn_mean = jnp.mean(attn, axis=1)                        # (B,L,L)
    if valid is not None:
        qmask = valid.astype(bool)
        out = jnp.where(qmask[..., None], out, 0.0)
        attn_mean = jnp.where(qmask[:, :, None], attn_mean, 0.0)
    return out.astype(x.dtype), attn_mean


def mha_auto(
    x: jax.Array,
    p: MhaParams,
    n_heads: int,
    valid: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    policy: precision.Policy = precision.DEFAULT,
    allow_pallas: bool = False,
    want_weights: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatch to the Pallas fused kernel on TPU for gradient-free callers
    (the kernel defines no VJP), the XLA op otherwise.  ``want_weights=False``
    (seg-only forwards) skips the map export; the XLA path's unused
    attn_mean is DCE'd by XLA when the caller drops it."""
    from weclip_tpu.core.runtime import pallas_ok
    if (allow_pallas and attn_bias is None and x.shape[1] >= 256
            and pallas_ok()):
        from weclip_tpu.ops.pallas_attention import mha_with_weights_pallas
        return mha_with_weights_pallas(x, p, n_heads, valid=valid,
                                       policy=policy,
                                       want_weights=want_weights)
    out, attn = mha_with_weights(x, p, n_heads, valid=valid,
                                 attn_bias=attn_bias, policy=policy)
    return out, (attn if want_weights else None)
