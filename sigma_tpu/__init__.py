"""sigma_tpu — a TPU-native JAX/XLA/Pallas framework for multi-modal (RGB-X)
semantic segmentation with Siamese Mamba (VMamba) encoders.

Re-designed from scratch for TPU with the capabilities of the reference
implementation of "Sigma: Siamese Mamba Network for Multi-Modal Semantic
Segmentation" (see /root/reference; arXiv 2404.04256).

Layout:
  ops/       pure functional compute ops (selective scan kernels, 2-D scan
             layout transforms, resize primitives)
  models/    flax.linen model zoo (VSSM backbone, fusion blocks, decoders,
             EncoderDecoder)
  data/      host-side data pipeline (RGB-X datasets, augmentations, loaders)
  engine/    training/eval runtime (train loop, sliding-window evaluator,
             checkpointing)
  parallel/  device-mesh / sharding utilities
  utils/     metrics, LR schedules, visualization, checkpoint conversion
"""

__version__ = "0.1.0"
