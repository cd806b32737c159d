"""Attention + residual block vs a torch oracle reproducing the reference
math (clip/myAtt.py packed-QKV attention with head-averaged weight export;
clip/model.py:191-214 pre-LN block with QuickGELU)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tests import tiny
from weclip_tpu.core import precision
from weclip_tpu.models.clip import vit
from weclip_tpu.ops.attention import MhaParams, mha_with_weights


def torch_mha_oracle(x, in_w, in_b, out_w, out_b, n_heads):
    """fp32 packed-QKV self-attention returning (out, head-mean weights),
    batch-first. Mirrors myAtt._scaled_dot_product_attention (myAtt.py:21-66)
    and the head-averaging at myAtt.py:323-326."""
    b, l, d = x.shape
    hd = d // n_heads
    qkv = F.linear(x, in_w, in_b)
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):
        return t.reshape(b, l, n_heads, hd).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = (q / hd ** 0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    out = attn @ v
    out = out.permute(0, 2, 1, 3).reshape(b, l, d)
    out = F.linear(out, out_w, out_b)
    return out, attn.mean(dim=1)


def make_weights(rng, d):
    return (rng.standard_normal((3 * d, d)).astype(np.float32) * 0.1,
            rng.standard_normal((3 * d,)).astype(np.float32) * 0.1,
            rng.standard_normal((d, d)).astype(np.float32) * 0.1,
            rng.standard_normal((d,)).astype(np.float32) * 0.1)


def test_mha_matches_torch(rng):
    b, l, d, h = 2, 10, 16, 4
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    in_w, in_b, out_w, out_b = make_weights(rng, d)

    p = MhaParams(jnp.asarray(in_w), jnp.asarray(in_b),
                  jnp.asarray(out_w), jnp.asarray(out_b))
    out, attn = mha_with_weights(jnp.asarray(x), p, h, policy=precision.FP32)

    t_out, t_attn = torch_mha_oracle(
        torch.from_numpy(x), torch.from_numpy(in_w), torch.from_numpy(in_b),
        torch.from_numpy(out_w), torch.from_numpy(out_b), h)
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), t_attn.numpy(), rtol=2e-5, atol=2e-5)


def test_mha_mask_equals_compaction(rng):
    """A padded sequence with a validity mask must produce, on the valid
    slice, exactly what the unpadded sequence produces."""
    b, l, d, h = 1, 8, 16, 4
    lv = 5
    x = rng.standard_normal((b, l, d)).astype(np.float32)
    x[:, lv:] = 0.0
    valid = np.zeros((b, l), bool)
    valid[:, :lv] = True
    in_w, in_b, out_w, out_b = make_weights(rng, d)
    p = MhaParams(*(jnp.asarray(a) for a in (in_w, in_b, out_w, out_b)))

    out_pad, attn_pad = mha_with_weights(jnp.asarray(x), p, h,
                                         valid=jnp.asarray(valid),
                                         policy=precision.FP32)
    out_ref, attn_ref = mha_with_weights(jnp.asarray(x[:, :lv]), p, h,
                                         policy=precision.FP32)
    np.testing.assert_allclose(np.asarray(out_pad)[:, :lv],
                               np.asarray(out_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn_pad)[:, :lv, :lv],
                               np.asarray(attn_ref), rtol=2e-5, atol=2e-5)
    # invalid rows/cols zeroed
    assert np.all(np.asarray(attn_pad)[:, lv:] == 0)
    assert np.all(np.asarray(out_pad)[:, lv:] == 0)


class TorchBlock(torch.nn.Module):
    """Reference residual attention block semantics (clip/model.py:191-214)."""

    def __init__(self, params, n_heads):
        super().__init__()
        self.n_heads = n_heads
        self.p = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}

    def forward(self, x):
        p = self.p
        a = F.layer_norm(x, x.shape[-1:], p["ln1_g"], p["ln1_b"])
        attn_out, attn_w = torch_mha_oracle(a, p["in_w"], p["in_b"],
                                            p["out_w"], p["out_b"], self.n_heads)
        x = x + attn_out
        y = F.layer_norm(x, x.shape[-1:], p["ln2_g"], p["ln2_b"])
        y = F.linear(y, p["fc_w"], p["fc_b"])
        y = y * torch.sigmoid(1.702 * y)          # QuickGELU
        y = F.linear(y, p["pj_w"], p["pj_b"])
        return x + y, attn_w


def test_block_matches_torch(rng):
    d, h, l = 16, 4, 9
    x = rng.standard_normal((2, l, d)).astype(np.float32)
    in_w, in_b, out_w, out_b = make_weights(rng, d)
    fc_w = rng.standard_normal((4 * d, d)).astype(np.float32) * 0.1
    fc_b = rng.standard_normal((4 * d,)).astype(np.float32) * 0.1
    pj_w = rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.1
    pj_b = rng.standard_normal((d,)).astype(np.float32) * 0.1
    ln1_g = rng.standard_normal(d).astype(np.float32)
    ln1_b = rng.standard_normal(d).astype(np.float32)
    ln2_g = rng.standard_normal(d).astype(np.float32)
    ln2_b = rng.standard_normal(d).astype(np.float32)

    jp = {
        "ln_1": {"g": jnp.asarray(ln1_g), "b": jnp.asarray(ln1_b)},
        "attn": {"in_w": jnp.asarray(in_w), "in_b": jnp.asarray(in_b),
                 "out_w": jnp.asarray(out_w), "out_b": jnp.asarray(out_b)},
        "ln_2": {"g": jnp.asarray(ln2_g), "b": jnp.asarray(ln2_b)},
        "mlp": {"fc_w": jnp.asarray(fc_w), "fc_b": jnp.asarray(fc_b),
                "proj_w": jnp.asarray(pj_w), "proj_b": jnp.asarray(pj_b)},
    }
    out, attn_w, _ = vit.block_forward(jp, jnp.asarray(x), h,
                                       policy=precision.FP32)

    tb = TorchBlock({"ln1_g": ln1_g, "ln1_b": ln1_b, "in_w": in_w, "in_b": in_b,
                     "out_w": out_w, "out_b": out_b, "ln2_g": ln2_g,
                     "ln2_b": ln2_b, "fc_w": fc_w, "fc_b": fc_b,
                     "pj_w": pj_w, "pj_b": pj_b}, h)
    t_out, t_attn = tb(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), t_out.numpy(), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(attn_w), t_attn.numpy(), rtol=3e-5, atol=3e-5)
