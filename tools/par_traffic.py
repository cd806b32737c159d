"""Exact HBM traffic accounting for the reference PAR module on A100.

Why this exists (VERDICT r4 ask #2): the A100 baseline band's pessimistic
edge rests on per-stage effective-rate guesses.  PAR is the dominant stage
(30.7 of 38.8 measured CPU seconds, BASELINE_cpu_measurement.json), and —
unlike the backbone, whose effective FLOP rate on an eager batch-2 ViT is
genuinely uncertain — PAR's cost on a GPU is a *provable* function of the
shipped op sequence: eager PyTorch cannot fuse, so every elementwise /
pad / conv op in `/root/reference/WeCLIP_model/PAR.py:40-96` must read its
inputs from and write its outputs to HBM.  Counting those bytes gives a
hard lower bound on PAR wall time at any assumed bandwidth, including the
theoretical peak, with zero launch / scheduling overhead assumed.

This script walks that op sequence symbolically (shape arithmetic only, no
torch) and prints per-call and per-image traffic for the msc-flip VOC val
protocol (test_msc_flip_voc.py: 4 model forwards per image -> 4 PAR calls,
two at scale 1.0 and two at 0.75; model_attn_aff_voc.py:53 casts to fp32).

Assumptions, each chosen to UNDERCOUNT traffic (so the floor is safe):
 - reductions (std/mean/sum/softmax-reduce) are single-pass and read each
   input element exactly once;
 - replicate-pad halo bytes are ignored (pads counted at unpadded size);
 - intermediate reuse from L2 is NOT credited - but the big tensors here
   (e.g. the (1,3,48,H,W) neighbor stack = 113 MB at scale 1) exceed
   A100's 40 MB L2 several times over, so inter-op reuse cannot hide them;
 - conv2d reads its input once, writes its output once (weight is 8x1x3x3,
   negligible).

Run: python -m tools.par_traffic
"""
from __future__ import annotations

D = 6          # dilations [1, 2, 4, 8, 12, 24] (model_attn_aff_voc.py:33)
K = 8          # directions per dilation (PAR.get_kernel)
ND = D * K     # 48 neighbors
FP = 4         # fp32: model_attn_aff_voc.py:53 casts imgs/cams to .float()


def neighbors_bytes(c: int, n: int) -> tuple[float, float]:
    """(read, write) bytes for get_dilated_neighbors on a (1,c,H,W) input.

    Per dilation: F.pad replicate (R c*n, W c*n), conv2d with the 8-dir
    one-hot kernel (R c*n padded input, W 8c*n); torch.cat at the end is a
    copy of the full stack (R+W 48c*n) — cat of 6 non-contiguous results
    cannot alias in eager mode."""
    r = D * (c * n + c * n)            # pad read + conv read
    w = D * (c * n + K * c * n)        # pad write + conv write
    r += ND * c * n                    # cat read
    w += ND * c * n                    # cat write
    return r * FP, w * FP


def par_call_bytes(h: int, w: int, c_mask: int, iters: int = 10):
    """Exact (read, write) bytes of one PAR.forward at fp32.

    Follows /root/reference/WeCLIP_model/PAR.py:63-96 op by op."""
    n = h * w
    stack = ND * 3 * n                 # (1,3,48,H,W) element count
    aff1 = ND * n                      # (1,1,48,H,W)
    r = w_ = 0.0
    # F.interpolate(imgs, masks.size): same size in the val path (masks are
    # built at image resolution) -> still materializes a copy in eager mode
    r += 3 * n * FP; w_ += 3 * n * FP
    # _imgs = get_dilated_neighbors(imgs)
    nr, nw = neighbors_bytes(3, n); r += nr; w_ += nw
    # _imgs_rep = imgs.unsqueeze(2).repeat(...)
    r += 3 * n * FP; w_ += stack * FP
    # _imgs_abs = (_imgs - _imgs_rep).abs(): sub then abs, two eager ops
    r += 2 * stack * FP + stack * FP; w_ += 2 * stack * FP
    # _imgs_std = std(_imgs, dim=2) (single-pass credit)
    r += stack * FP; w_ += 3 * n * FP
    # aff = -((_imgs_abs / (std+eps) / w1) ** 2): add-eps(3n), div, div, pow,
    # neg — five eager ops over the (1,3,48,H,W) stack
    r += 3 * n * FP + 4 * stack * FP + 3 * n * FP; w_ += 3 * n * FP + 4 * stack * FP
    # aff.mean(dim=1): (1,3,48,H,W) -> (1,1,48,H,W)
    r += stack * FP; w_ += aff1 * FP
    # _pos_rep = pos.repeat(b,1,1,h,w): (1,1,48,H,W)
    w_ += aff1 * FP
    # pos_aff = -((_pos_rep / (pos_std+eps) / w1) ** 2): std + 4 eager ops
    r += aff1 * FP            # std read
    r += 4 * aff1 * FP; w_ += 4 * aff1 * FP
    # two softmaxes over dim=2 (48): max, sub+exp (2 ops), sum, div
    for _ in range(2):
        r += 4 * aff1 * FP; w_ += 3 * aff1 * FP
    # aff = s1 + w2 * s2: scalar-mul + add
    r += 3 * aff1 * FP; w_ += 2 * aff1 * FP
    # iterations: _masks = neighbors(masks); masks = (_masks * aff).sum(2)
    mask_stack = ND * c_mask * n
    for _ in range(iters):
        nr, nw = neighbors_bytes(c_mask, n); r += nr; w_ += nw
        r += (mask_stack + aff1) * FP; w_ += mask_stack * FP   # mul
        r += mask_stack * FP; w_ += c_mask * n * FP            # sum(2)
    return r, w_


def main():
    # protocol shapes: 375x500 val image (the BASELINE_cpu_measurement
    # image), long side resized to 512 -> 384x512; 0.75 scale -> 288x384
    # (test_msc_flip_voc.py:26,81).  4 model forwards per image (2 scales x
    # 2 flips) and each forward calls PAR once on its CAM stack
    # (model_attn_aff_voc.py:53).  c_mask = fg-classes-present + bg; VOC
    # val averages ~1.5 present classes -> c=2..3; use 3 (typical 2-class
    # image) and also print c=2 as the undercount edge.
    scales = [(384, 512), (384, 512), (288, 384), (288, 384)]
    for c in (2, 3):
        tot = 0.0
        for h, w in scales:
            r, wr = par_call_bytes(h, w, c)
            tot += r + wr
        gb = tot / 1e9
        # floors: theoretical peak HBM of A100-80GB-SXM (2.039 TB/s) and
        # A100-40GB-PCIe (1.555 TB/s); nothing sustains peak, so these are
        # strict under-estimates of real PAR time
        # gb [GB] / bw [TB/s] = gb / (bw*1000) s = gb / bw ms
        print(f"c_mask={c}: {gb:6.1f} GB/image -> floor "
              f"{gb / 2.039:5.1f} ms @2.04TB/s peak, "
              f"{gb / 1.555:5.1f} ms @1.56TB/s peak, "
              f"{gb / 1.4:5.1f} ms @1.4TB/s (measured-class eff.)")


if __name__ == "__main__":
    main()
