"""weclip_tpu — a TPU-native framework for frozen-CLIP weakly-supervised
semantic segmentation.

Re-implements, TPU-first (JAX / XLA / Pallas / pjit), the full capability
surface of the WeCLIP / WeCLIP-ViT-CoMer reference (CVPR'24):

- frozen CLIP ViT-B/16 backbone with per-layer attention-map export
- online GradCAM via jax.vjp (no hooks), batched over images x classes
- attention-affinity random walk (Sinkhorn transition matrix) + box masking
- PAR pixel-adaptive refinement
- SegFormer-style multi-layer fusion head + transformer decoder + Gram
  affinity head
- iteration-based trainer (optax poly-warmup AdamW), batched msc-flip TTA
  evaluation, dense-CRF post-processing
- ViT-CoMer multi-scale CNN/transformer interaction branch

Everything in the hot path runs on device under jit with static shapes; a
token-validity mask generalizes every stage to padded, batched inputs so
arbitrary image sizes compile to one XLA program.
"""

__version__ = "0.1.0"
