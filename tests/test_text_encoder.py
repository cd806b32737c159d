"""Text encoder vs a torch oracle (clip/model.py:392-405: token embed + pos
+ causal 12-block transformer + ln_final + argmax-EOT pick + projection)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests import tiny
from tests.test_attention_block import torch_mha_oracle
from weclip_tpu.models.clip import vit


def torch_encode_text(params, tokens, n_heads):
    p = jax.tree_util.tree_map(np.asarray, params)
    x = torch.from_numpy(p["token_embedding"])[torch.from_numpy(tokens)]
    x = x + torch.from_numpy(p["positional_embedding"])[None]
    l = tokens.shape[1]
    mask = torch.full((l, l), float("-inf")).triu(1)

    n_blocks = p["blocks"]["ln_1"]["g"].shape[0]
    for i in range(n_blocks):
        bp = jax.tree_util.tree_map(lambda a: a[i], p["blocks"])
        a = F.layer_norm(x, x.shape[-1:], torch.from_numpy(bp["ln_1"]["g"]),
                         torch.from_numpy(bp["ln_1"]["b"]))
        # causal masked attention (reference adds the mask to the scores)
        b, ln, d = a.shape
        hd = d // n_heads
        qkv = F.linear(a, torch.from_numpy(bp["attn"]["in_w"]),
                       torch.from_numpy(bp["attn"]["in_b"]))
        q, k, v = qkv.chunk(3, -1)
        def split(t):
            return t.reshape(b, ln, n_heads, hd).permute(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = (q / hd ** 0.5) @ k.transpose(-2, -1) + mask
        attn = attn.softmax(-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, ln, d)
        o = F.linear(o, torch.from_numpy(bp["attn"]["out_w"]),
                     torch.from_numpy(bp["attn"]["out_b"]))
        x = x + o
        y = F.layer_norm(x, x.shape[-1:], torch.from_numpy(bp["ln_2"]["g"]),
                         torch.from_numpy(bp["ln_2"]["b"]))
        y = F.linear(y, torch.from_numpy(bp["mlp"]["fc_w"]),
                     torch.from_numpy(bp["mlp"]["fc_b"]))
        y = y * torch.sigmoid(1.702 * y)
        y = F.linear(y, torch.from_numpy(bp["mlp"]["proj_w"]),
                     torch.from_numpy(bp["mlp"]["proj_b"]))
        x = x + y

    x = F.layer_norm(x, x.shape[-1:], torch.from_numpy(p["ln_final"]["g"]),
                     torch.from_numpy(p["ln_final"]["b"]))
    eot = tokens.argmax(axis=-1)
    feats = x[torch.arange(x.shape[0]), torch.from_numpy(eot)]
    return (feats @ torch.from_numpy(p["text_projection"])).numpy()


def test_encode_text_matches_torch(rng):
    cfg = tiny.tiny_config()
    params = vit.init_text_params(jax.random.PRNGKey(9), cfg.clip)
    tokens = np.zeros((3, cfg.clip.context_length), np.int32)
    for i in range(3):
        n = rng.integers(3, cfg.clip.context_length)
        tokens[i, 0] = cfg.clip.vocab_size - 2          # sot
        tokens[i, 1:n - 1] = rng.integers(1, cfg.clip.vocab_size - 2, n - 2)
        tokens[i, n - 1] = cfg.clip.vocab_size - 1      # eot (max id)

    ours = np.asarray(vit.encode_text(params, jnp.asarray(tokens), cfg.clip))
    ref = torch_encode_text(params, tokens, cfg.clip.transformer_heads)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_build_text_features_zeroshot_tables(tmp_path):
    """build_text_features runs the prompt tables through the text encoder
    (model_attn_aff_voc.py:34-46,81-82): per-class unit-norm rows whose
    single-template value equals the normalized encode_text embedding of
    'a clean origami {name}.'."""
    import dataclasses
    from tests.test_tokenizer import make_tiny_vocab
    from weclip_tpu.models.clip import prompts
    from weclip_tpu.models.clip.tokenizer import Tokenizer, tokenize

    tok = Tokenizer(make_tiny_vocab(tmp_path), n_merges=7)
    cfg = dataclasses.replace(tiny.tiny_clip_config(),
                              vocab_size=tok.eot + 1, context_length=77)
    tp = vit.init_text_params(jax.random.PRNGKey(3), cfg)

    fg, bg = prompts.build_text_features("voc", tp, cfg, tok)
    assert fg.shape == (20, cfg.embed_dim) and fg.dtype == np.float32
    assert bg.shape == (25, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(fg, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(bg, axis=-1), 1.0, atol=1e-5)

    # single-template oracle for one class row
    name = prompts.NEW_CLASS_NAMES_VOC[7]          # 'cat'
    toks = tokenize([f"a clean origami {name}."], tok, cfg.context_length)
    emb = np.asarray(vit.encode_text(tp, jnp.asarray(toks), cfg))[0]
    emb = emb / np.linalg.norm(emb)
    np.testing.assert_allclose(fg[7], emb, atol=1e-5)

    fgc, bgc = prompts.build_text_features("coco", tp, cfg, tok)
    assert fgc.shape == (80, cfg.embed_dim) and bgc.shape == (23, cfg.embed_dim)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        prompts.class_tables("cityscapes")
