"""load_clip file path: torch .pt -> state dict -> inferred config + params
(clip/clip.py:120-143 load semantics incl. the `module.` prefix strip)."""

import os

import numpy as np
import pytest

from tests.test_reference_golden import REF, _install_reference

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


def _tiny_reference_sd(context_length=16, vocab_size=64,
                       transformer_width=32, transformer_heads=2):
    _install_reference()
    import torch
    from clip.model import CLIP
    torch.manual_seed(0)
    model = CLIP(embed_dim=32, image_resolution=224, vision_layers=3,
                 vision_width=64, vision_patch_size=16,
                 context_length=context_length, vocab_size=vocab_size,
                 transformer_width=transformer_width,
                 transformer_heads=transformer_heads,
                 transformer_layers=2).float().eval()
    return model.state_dict()


def test_load_clip_from_pt_file_with_module_prefix(tmp_path):
    import torch
    from weclip_tpu.core.config import ClipConfig
    from weclip_tpu.models.clip.loader import (infer_config, load_clip,
                                               params_from_state_dict)

    sd = _tiny_reference_sd()
    # DDP-style prefixes, as clip.load tolerates (clip/clip.py:140-143)
    torch.save({"module." + k: v for k, v in sd.items()},
               tmp_path / "tiny.pt")

    params, cfg = load_clip(str(tmp_path / "tiny.pt"))
    assert cfg.vision_width == 64 and cfg.vision_layers == 3
    assert cfg.patch_size == 16 and cfg.embed_dim == 32
    assert cfg.transformer_layers == 2 and cfg.vocab_size == 64

    # the transplant must equal the direct state-dict path
    np_sd = {k: v.float().numpy() for k, v in sd.items()}
    direct = params_from_state_dict(np_sd, infer_config(np_sd, ClipConfig()))
    flat_a, _ = _flatten(params)
    flat_b, _ = _flatten(direct)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def _flatten(tree, prefix=""):
    import jax
    leaves = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        leaves[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return leaves, None


def test_load_clip_missing_file_raises(tmp_path):
    from weclip_tpu.models.clip.loader import load_clip
    with pytest.raises(FileNotFoundError, match="not found"):
        load_clip(str(tmp_path / "nope.pt"))


def test_build_frozen_real_checkpoint_branch(tmp_path, monkeypatch):
    """trainer.build_frozen's checkpoint branch end-to-end: .pt file ->
    shape-inferred config -> real BPE tokenizer -> prompt tables -> text
    encoder -> normalized fg/bg feature tables (the init-time
    zeroshot_classifier, model_attn_aff_voc.py:34-46,81-82).  Needs the
    OpenAI vocab (real token ids), so the tiny checkpoint is built at the
    real context_length/vocab_size."""
    import dataclasses

    import torch

    from tests.test_tokenizer import REF_VOCAB
    from weclip_tpu.core.config import Config
    from weclip_tpu.train.trainer import build_frozen

    if not os.path.exists(REF_VOCAB):
        pytest.skip("OpenAI BPE vocab not present")
    # transformer_width 64 with 1 head: loaders (ours and the reference's
    # build_model, clip/model.py:506) infer heads = width // 64, so a
    # narrower text tower is unloadable for BOTH
    sd = _tiny_reference_sd(context_length=77, vocab_size=49408,
                            transformer_width=64, transformer_heads=1)
    pt = tmp_path / "tiny_vitb.pt"
    torch.save(sd, str(pt))
    monkeypatch.setenv("WECLIP_BPE_PATH", REF_VOCAB)

    cfg = Config()      # VOC: 20 fg classes, 25 bg concepts
    cfg = dataclasses.replace(
        cfg, clip=dataclasses.replace(cfg.clip, pretrained_path=str(pt)))
    frozen, clip_params, out_cfg = build_frozen(cfg)

    # config was inferred from the state dict, not taken from defaults
    assert out_cfg.clip.vision_width == 64
    assert out_cfg.clip.transformer_layers == 2
    assert out_cfg.clip.embed_dim == 32
    fg = np.asarray(frozen["fg_text"])
    bg = np.asarray(frozen["bg_text"])
    assert fg.shape == (20, 32) and bg.shape == (25, 32)
    # zeroshot_classifier L2-normalizes each class embedding
    np.testing.assert_allclose(np.linalg.norm(fg, axis=-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(bg, axis=-1), 1.0, rtol=1e-4)
    assert np.isfinite(float(frozen["logit_scale"]))


def test_load_clip_from_torchscript_archive(tmp_path):
    """The actual OpenAI ViT-B-16.pt is a TorchScript JIT archive
    (clip/clip.py:120-127 tries torch.jit.load first); pin that branch:
    a traced archive of the tiny reference CLIP must load to the same
    params as its raw state dict."""
    import torch

    from weclip_tpu.core.config import ClipConfig
    from weclip_tpu.models.clip.loader import (infer_config, load_clip,
                                               params_from_state_dict)

    _install_reference()
    from clip.model import CLIP
    torch.manual_seed(0)
    m = CLIP(embed_dim=32, image_resolution=224, vision_layers=3,
             vision_width=64, vision_patch_size=16, context_length=16,
             vocab_size=64, transformer_width=64, transformer_heads=1,
             transformer_layers=2).float().eval()
    toks = torch.randint(0, 64, (2, 16))
    toks[:, -1] = 63
    with torch.no_grad():
        traced = torch.jit.trace_module(m, {"encode_text": (toks,)},
                                        strict=False)
    pt = str(tmp_path / "tiny_ts.pt")
    torch.jit.save(traced, pt)

    params, cfg = load_clip(pt, ClipConfig())
    assert cfg.vision_width == 64 and cfg.transformer_layers == 2

    np_sd = {k: np.asarray(v.detach().numpy(), np.float32)
             for k, v in m.state_dict().items()}
    direct = params_from_state_dict(np_sd, infer_config(np_sd, ClipConfig()))
    got, _ = _flatten(params)
    want, _ = _flatten(direct)
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
