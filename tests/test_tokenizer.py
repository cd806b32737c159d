"""BPE tokenizer tests: synthetic merges plus (when the OpenAI vocab file is
available at WECLIP_BPE_PATH or the reference checkout) known-token checks."""

import gzip
import os

import numpy as np
import pytest

from weclip_tpu.models.clip.tokenizer import Tokenizer, bytes_to_unicode, tokenize

REF_VOCAB = "/root/reference/clip/bpe_simple_vocab_16e6.txt.gz"


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def make_tiny_vocab(tmp_path):
    merges = ["#version: 0.2", "h e", "he l", "hel l", "hell o</w>", "l o",
              "lo w</w>", "e r</w>"]
    p = tmp_path / "vocab.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("\n".join(merges) + "\n" * 2)
    return str(p)


def test_tiny_bpe_roundtrip(tmp_path):
    tok = Tokenizer(make_tiny_vocab(tmp_path), n_merges=7)
    ids = tok.encode("hello lower")
    assert tok.decode(ids).strip() == "hello lower"
    # 'hello' fully merges into one token
    assert tok.decode([ids[0]]).strip() == "hello"


def test_tokenize_fixed_context(tmp_path):
    tok = Tokenizer(make_tiny_vocab(tmp_path), n_merges=7)
    out = tokenize(["hello", "lower hello"], tok, context_length=8)
    assert out.shape == (2, 8)
    assert (out[:, 0] == tok.sot).all()
    # eot is the max id in each row (clip/clip.py picks features at argmax)
    assert out[0].max() == tok.eot


@pytest.mark.skipif(not os.path.exists(REF_VOCAB)
                    and "WECLIP_BPE_PATH" not in os.environ,
                    reason="no CLIP vocab file available")
def test_real_vocab_known_tokens():
    path = os.environ.get("WECLIP_BPE_PATH", REF_VOCAB)
    tok = Tokenizer(path)
    assert len(tok.encoder) == 49408
    assert tok.sot == 49406 and tok.eot == 49407
    # known CLIP tokenization: "a photo of a cat" -> specific ids
    ids = tok.encode("a photo of a cat")
    assert ids == [320, 1125, 539, 320, 2368], ids
    ids2 = tok.encode("a clean origami aeroplane.")
    assert tok.decode(ids2).strip() == "a clean origami aeroplane ."


def test_clip_preprocess_shape_and_stats():
    """clip_preprocess (_transform surface, clip/clip.py:79-86): bicubic
    short-side resize + center crop + CLIP-stats normalization."""
    import numpy as np
    from weclip_tpu.models.clip.loader import (CLIP_MEAN, CLIP_STD,
                                               clip_preprocess)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (375, 500, 3), dtype=np.uint8)
    out = clip_preprocess(img)
    assert out.shape == (3, 224, 224) and out.dtype == np.float32
    # a uniform gray image maps to the exact normalized constant
    gray = np.full((300, 300, 3), 128, np.uint8)
    out = clip_preprocess(gray)
    expect = (128 / 255.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[:, 0, 0], expect, atol=1e-6)
