"""N/A proofs for the upstream CAM exports that cannot run against the
reference's own CLIP model (PARITY.md CAM-variant table).

The reference vendors 11 pytorch_grad_cam exports but its live path uses
GradCAM only.  Four of them are structurally incompatible with the CLIP
wrapper the reference feeds them (`forward_last_layer` takes a LIST input
[image_features, text_features, h, w] — activations_and_gradients.py:43-45):

- ScoreCAM      — score_cam.py:30-31 calls input_tensor.shape[-2:] on a list
- AblationCAM   — ablation_cam.py:88 calls self.model(input_tensor), i.e.
                  CLIP.forward(image) without the required text argument
- FullGrad      — needs Conv2d/BatchNorm2d layers WITH bias for its bias
                  gradients; CLIP's only conv has bias=False so the target
                  set is empty, and compute_input_gradient crashes on lists
- GuidedBackprop— guided_backprop.py:82 calls input_img.requires_grad_ on a
                  list; CLIP also contains no ReLU modules, so the guided
                  rectification would never even engage

Each test EXECUTES the upstream class against the reference CLIP to prove
the incompatibility, then (for score/ablation) checks our TPU-native
adaptation runs full-channel.  ablation_cam_multilayer.py is the same
AblationCAM recipe against multiple layers and shares AblationCAM's proof.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_reference_golden import REF, _install_reference

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def tiny_ref():
    _install_reference()
    import torch
    torch.manual_seed(0)
    from clip.model import CLIP
    model = CLIP(embed_dim=32, image_resolution=224, vision_layers=12,
                 vision_width=128, vision_patch_size=16, context_length=16,
                 vocab_size=64, transformer_width=64, transformer_heads=1,
                 transformer_layers=2).float().eval()
    rng = np.random.default_rng(4)
    l = 21
    x11 = rng.standard_normal((l, 1, 128)).astype(np.float32)
    text = rng.standard_normal((5, 32)).astype(np.float32)
    input_tensor = [torch.from_numpy(x11), torch.from_numpy(text), 64, 80]
    return torch, model, input_tensor


def _reshape_transform(tensor, height=4, width=5):
    tensor = tensor.permute(1, 0, 2)
    result = tensor[:, 1:, :].reshape(tensor.size(0), height, width,
                                      tensor.size(2))
    return result.transpose(2, 3).transpose(1, 2)


class _Target:
    def __init__(self, c):
        self.c = c

    def __call__(self, out):
        return out[self.c] if out.ndim == 1 else out[:, self.c]


def test_upstream_scorecam_cannot_run_on_clip(tiny_ref):
    torch, model, input_tensor = tiny_ref
    from pytorch_grad_cam import ScoreCAM
    cam = ScoreCAM(model=model,
                   target_layers=[model.visual.transformer.resblocks[-1].ln_1],
                   reshape_transform=_reshape_transform)
    with pytest.raises((AttributeError, TypeError)):
        cam(input_tensor=input_tensor, targets=[_Target(0)], target_size=None)


def test_upstream_ablationcam_cannot_run_on_clip(tiny_ref):
    torch, model, input_tensor = tiny_ref
    from pytorch_grad_cam import AblationCAM
    cam = AblationCAM(
        model=model,
        target_layers=[model.visual.transformer.resblocks[-1].ln_1],
        reshape_transform=_reshape_transform)
    with pytest.raises((AttributeError, TypeError)):
        cam(input_tensor=input_tensor, targets=[_Target(0)], target_size=None)


def test_upstream_fullgrad_cannot_run_on_clip(tiny_ref):
    torch, model, input_tensor = tiny_ref
    from pytorch_grad_cam import FullGrad
    import torch.nn as nn
    # the premise: CLIP exposes NO 2D-bias layers for FullGrad to hook
    biased = [m for m in model.modules()
              if isinstance(m, (nn.Conv2d, nn.BatchNorm2d))
              and m.bias is not None]
    assert biased == []
    with pytest.raises((AttributeError, TypeError, IndexError, ValueError)):
        cam = FullGrad(model=model, target_layers=[],
                       reshape_transform=_reshape_transform)
        cam(input_tensor=input_tensor, targets=[_Target(0)],
            target_size=None)


def test_upstream_guided_backprop_cannot_run_on_clip(tiny_ref):
    torch, model, input_tensor = tiny_ref
    from pytorch_grad_cam import GuidedBackpropReLUModel
    import torch.nn as nn
    # no ReLU modules anywhere in CLIP: the guided rectification is vacuous
    assert not any(isinstance(m, nn.ReLU) for m in model.modules())
    gb = GuidedBackpropReLUModel(model=model, use_cuda=False)
    with pytest.raises((AttributeError, TypeError)):
        gb(input_tensor, target_category=0)


def test_our_perturbation_cams_run_full_channel(tiny_ref):
    """Our TPU-native score/ablation adaptations DO run, over every channel
    like the upstream loop would, and top-k is a consistent subset mode."""
    torch, model, input_tensor = tiny_ref
    from weclip_tpu.cam import variants
    from weclip_tpu.core import precision
    from weclip_tpu.core.config import ClipConfig
    from weclip_tpu.models.clip.loader import infer_config, params_from_state_dict

    sd = {k: v.float().numpy() for k, v in model.state_dict().items()}
    cfg = infer_config(sd, ClipConfig())
    params = params_from_state_dict(sd, cfg)
    x11 = jnp.asarray(np.asarray(input_tensor[0])[:, 0, :])
    text = jnp.asarray(np.asarray(input_tensor[1]))
    l = x11.shape[0]
    tmask = jnp.ones((text.shape[0],), bool)
    valid = jnp.ones((l,), bool)
    ci = jnp.arange(3, dtype=jnp.int32)
    vp = jax.tree_util.tree_map(jnp.asarray, params["visual"])
    ls = jnp.asarray(params["logit_scale"])

    for method in (variants.score_cam, variants.ablation_cam):
        full = np.asarray(method(vp, ls, x11, text, tmask, valid, ci, cfg,
                                 precision.FP32, top_channels=None))
        assert full.shape == (3, l - 1)
        assert np.isfinite(full).all()
        # top_channels=D must equal the full-channel result (up to channel
        # summation order)
        allk = np.asarray(method(vp, ls, x11, text, tmask, valid, ci, cfg,
                                 precision.FP32,
                                 top_channels=x11.shape[1]))
        np.testing.assert_allclose(allk, full, atol=1e-4)
        # top-k fast mode runs and stays in range
        topk = np.asarray(method(vp, ls, x11, text, tmask, valid, ci, cfg,
                                 precision.FP32, top_channels=16))
        assert topk.shape == full.shape and np.isfinite(topk).all()
