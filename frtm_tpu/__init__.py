"""frtm_tpu — a TPU-native (JAX/XLA/Pallas) video object segmentation framework.

Provides the full capabilities of FRTM ("Learning Fast and Robust Target Models
for Video Object Segmentation", CVPR 2020; reference: andr345/frtm-vos), built
TPU-first: functional param pytrees, NHWC layouts, MXU-batched feature
extraction, a jvp/vjp Gauss-Newton/CG target-model solver, and sequence-level
data parallelism over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, re-architected for TPU):
  ops/       — numeric kernels: parity resizes, affine warp, conv helpers, Pallas
  models/    — ResNet feature extractor, SegNetwork decoder, discriminator, GN-CG
  runtime/   — inference tracker + offline trainer runtimes
  data/      — image IO, inference & training datasets
  eval/      — DAVIS J/F measures + dataset evaluation driver
  parallel/  — mesh construction, sharded multi-sequence inference, DP training
  utils/     — checkpoint conversion/saving, meters, profiling
"""

__version__ = "0.1.0"
