"""Assembled frozen ViT forward (patchify + CLS + upsampled pos-emb + ln_pre
+ 11-block scan + attention export) vs a full torch oracle chain
(clip/model.py:246-287 semantics)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests import tiny
from tests.test_attention_block import TorchBlock
from weclip_tpu.core import precision
from weclip_tpu.models.clip import vit


def torch_vision_forward(params, img, n_heads, patch=16):
    """Reference VisionTransformer.forward with require_all_fts=True."""
    p = {k: torch.from_numpy(np.asarray(v)) for k, v in {
        "conv1_w": params["conv1_w"],
        "class_embedding": params["class_embedding"],
        "positional_embedding": params["positional_embedding"],
        "ln_pre_g": params["ln_pre"]["g"], "ln_pre_b": params["ln_pre"]["b"],
    }.items()}
    x = torch.from_numpy(img)
    b = x.shape[0]
    h, w = x.shape[-2:]
    gh, gw = h // patch, w // patch

    x = F.conv2d(x, p["conv1_w"], stride=patch)              # (B, D, gh, gw)
    d = x.shape[1]
    x = x.reshape(b, d, -1).permute(0, 2, 1)                 # (B, P, D)
    cls = p["class_embedding"].reshape(1, 1, d).expand(b, 1, d)
    x = torch.cat([cls, x], dim=1)

    # upsample_pos_emb (clip/model.py:11-27)
    emb = p["positional_embedding"]
    first, grid = emb[:1], emb[1:]
    g = int(np.sqrt(grid.shape[0]))
    grid = grid.permute(1, 0).view(1, d, g, g)
    grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
    grid = grid.view(d, -1).permute(1, 0)
    pos = torch.cat([first, grid], 0)
    x = x + pos[None]
    x = F.layer_norm(x, (d,), torch.from_numpy(np.asarray(params["ln_pre"]["g"])),
                     torch.from_numpy(np.asarray(params["ln_pre"]["b"])))

    xs, attns = [], []
    n_blocks = np.asarray(params["blocks"]["ln_1"]["g"]).shape[0]
    for i in range(n_blocks - 1):                           # 11 frozen blocks
        bp = jax.tree_util.tree_map(lambda a: np.asarray(a)[i],
                                    params["blocks"])
        tb = TorchBlock({"ln1_g": bp["ln_1"]["g"], "ln1_b": bp["ln_1"]["b"],
                         "in_w": bp["attn"]["in_w"], "in_b": bp["attn"]["in_b"],
                         "out_w": bp["attn"]["out_w"],
                         "out_b": bp["attn"]["out_b"],
                         "ln2_g": bp["ln_2"]["g"], "ln2_b": bp["ln_2"]["b"],
                         "fc_w": bp["mlp"]["fc_w"], "fc_b": bp["mlp"]["fc_b"],
                         "pj_w": bp["mlp"]["proj_w"],
                         "pj_b": bp["mlp"]["proj_b"]}, n_heads)
        x, aw = tb(x)
        xs.append(x.detach().numpy())
        attns.append(aw.detach().numpy())
    return np.stack(xs), np.stack(attns)


def test_full_vision_forward_matches_torch(rng):
    cfg = tiny.tiny_config()
    key = jax.random.PRNGKey(3)
    params = vit.init_vision_params(key, cfg.clip)
    params = jax.tree_util.tree_map(np.asarray, params)

    b, hw = 2, 64
    img = rng.standard_normal((b, 3, hw, hw)).astype(np.float32)
    g = hw // 16
    l = g * g + 1

    pe = vit.build_pos_emb(params, g, g)[None]
    feats = vit.vision_forward_frozen(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(img), pe,
        jnp.ones((b, l), bool), cfg.clip, policy=precision.FP32)

    t_xs, t_attns = torch_vision_forward(params, img, cfg.clip.vision_heads)
    # features come back at the stream-padded length — compare the valid L
    np.testing.assert_allclose(np.asarray(feats.layer_tokens[:, :, :l]), t_xs,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feats.layer_attn[:, :, :l, :l]),
                               t_attns, rtol=2e-4, atol=2e-4)


def test_vision_forward_no_attn_export():
    """with_attn=False must produce identical tokens and an empty
    (0, B, L, L) attention stack (the seg-only export-free path used by
    eval scale-2 and the val short-circuit)."""
    rng = np.random.default_rng(5)
    cfg = tiny.tiny_config()
    params = vit.init_vision_params(jax.random.PRNGKey(3), cfg.clip)

    b, hw = 2, 64
    img = jnp.asarray(rng.standard_normal((b, 3, hw, hw)), jnp.float32)
    g = hw // 16
    l = g * g + 1
    pe = vit.build_pos_emb(params, g, g)[None]
    valid = jnp.ones((b, l), bool)

    full = vit.vision_forward_frozen(params, img, pe, valid, cfg.clip,
                                     policy=precision.FP32)
    lean = vit.vision_forward_frozen(params, img, pe, valid, cfg.clip,
                                     policy=precision.FP32, with_attn=False)
    np.testing.assert_allclose(np.asarray(lean.layer_tokens),
                               np.asarray(full.layer_tokens),
                               rtol=1e-6, atol=1e-6)
    ls = lean.layer_tokens.shape[2]          # stream-padded length
    assert lean.layer_attn.shape == (0, b, ls, ls)


def test_padded_pos_emb_device_matches_host_mirror():
    """build_pos_emb(pad_gh, pad_gw) (device builder for variable-size
    batches) and pos_emb_host (the evaluator's numpy mirror,
    evalx/runner.py:74) must agree exactly: same bilinear upsample
    (clip/model.py:11-27), same zero pad layout, CLS first."""
    rng = np.random.default_rng(9)
    cfg = tiny.tiny_config()
    params = vit.init_vision_params(jax.random.PRNGKey(11), cfg.clip)
    for gh, gw, pg, pw in [(3, 5, 6, 6), (4, 4, 4, 4), (2, 6, 8, 8)]:
        dev = np.asarray(vit.build_pos_emb(params, gh, gw, pg, pw))
        host = vit.pos_emb_host(np.asarray(params["positional_embedding"]),
                                gh, gw, pg, pw)
        assert dev.shape == (1 + pg * pw, params["positional_embedding"].shape[-1])
        np.testing.assert_allclose(dev, host, rtol=1e-6, atol=1e-6,
                                   err_msg=f"({gh},{gw})->({pg},{pw})")


def test_grid_valid_mask_matches_numpy():
    """grid_valid_mask builds the (1+G*G,) CLS-first validity mask from
    traced gh/gw on device; pin it against a direct numpy construction
    (the mask the eval runner builds on host)."""
    for gh, gw, pg, pw in [(3, 5, 6, 7), (4, 4, 4, 4), (1, 2, 5, 3)]:
        got = np.asarray(vit.grid_valid_mask(jnp.asarray(gh), jnp.asarray(gw),
                                             pg, pw))
        grid = np.zeros((pg, pw), bool)
        grid[:gh, :gw] = True
        want = np.concatenate([[True], grid.reshape(-1)])
        np.testing.assert_array_equal(got, want, err_msg=f"{gh},{gw},{pg},{pw}")
