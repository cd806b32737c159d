"""Pin the real-asset contingency runbook (VERDICT r4 #5).

`tools/validate_real.py` is the one-command acquire→zeroshot→agreement→
train→eval harness that must work the day real CLIP weights / VOC data
become available on a box with egress.  Nothing else exercises it on
commit, so a refactor of the loader / trainer / evaluator surfaces it
drives could silently rot it.  This (full-tier, non-smoke) test runs its
first three stages exactly as ``--selftest`` wires them — generated tiny
checkpoint, no external assets — and asserts each returns rather than
raising: stage 1 resolves the checkpoint path, stage 2 loads it through
the real `build_frozen` path and checks unit-norm text features, stage 3
executes the reference (read-only) and our model around the SAME weights
and reports their agreement.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")
def test_selftest_stages_1_to_3(tmp_path):
    from tools import validate_real as vr

    bpe = os.path.join(REF, "clip", "bpe_simple_vocab_16e6.txt.gz")
    if os.path.exists(bpe):
        os.environ.setdefault("WECLIP_BPE_PATH", bpe)

    # stage 1 (acquire, local-path mode: the selftest checkpoint stands in
    # for the downloaded ViT-B/16)
    ckpt = vr._make_selftest_ckpt(str(tmp_path))
    class Args:
        pass
    a = Args(); a.ckpt = ckpt
    out1 = vr.stage_acquire(a)
    assert out1["path"] == ckpt and out1["source"] == "local"

    # stage 2 (loader + zeroshot text features through build_frozen)
    out2, (frozen, clip_params, cfg) = vr.stage_zeroshot(
        ckpt, expect_vitb16=False)
    assert out2["fg_features"][0] == 20          # VOC foreground classes
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(frozen["fg_text"]), axis=-1), 1.0,
        rtol=1e-4)

    # stage 3 (executed-reference agreement on synthetic images at tiny px)
    out3 = vr.stage_agreement(ckpt, REF, voc_root=None, image_px=64)
    assert out3["images"] == "synthetic"
    # tiny-model synthetic agreement won't hit real-weight levels; the
    # stage contract is that it MEASURES both precision rows and reports
    # finite numbers
    for pol in ("fp32", "bf16"):
        row = out3[pol]
        assert set(row) == {"seg_argmax_agreement", "attn_pred_max_abs_err",
                            "pseudo_label_agreement"}, row
        for k, v in row.items():
            assert np.isfinite(v), (pol, k, v)
    # the shared-checkpoint zero-shot features must agree to float noise
    assert out3["zeroshot_fg_max_abs_err"] < 1e-3, out3
