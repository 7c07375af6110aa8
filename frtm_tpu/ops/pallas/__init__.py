"""Pallas TPU kernels.

Where they pay off here: after the stencil reduction of the solver
(models/lsq_stencil.py) the framework's device time is almost entirely
XLA-fused convs, so only ops with fusion-resistant data movement warrant
hand-written kernels. The 2x bicubic pyramid upsampler is one: its four-phase
separable filtering + pixel interleave round-trips large intermediates
through HBM when expressed as XLA ops; the fused kernel keeps a row-block
pipeline in VMEM. The affine warp, by contrast, is gather-shaped — a TPU
anti-pattern — and deliberately stays on the XLA/host paths (see
models/device_augmenter.py docstring for the measurement)."""
from .pyrup import pyr_up_bicubic_pallas

__all__ = ["pyr_up_bicubic_pallas"]
