"""Pallas TPU kernels.

Where kernels pay off here: after the stencil reduction of the solver
(models/lsq_stencil.py) removed the label-resolution HBM round trips
algebraically, the framework's device time is almost entirely XLA-fused
convs, so only ops with fusion-resistant data movement warrant hand-written
kernels. The 2x bicubic pyramid upsampler is the remaining case: its
four-phase separable filtering materialises intermediates in HBM under XLA;
the fused kernel (pyrup.py) computes each output tile on-chip.

Status notes (measured in this environment):
  * pyr_up_bicubic_pallas is numerically exact vs the XLA formulation
    (interpret-mode parity tests + compiled check at decoder score-map
    shapes). The axon remote-compile helper rejects the kernel at larger
    shapes (opaque HTTP 500 after the in-kernel constructs were already
    validated individually), so the decoder keeps the XLA path wired by
    default; flip to the kernel on toolchains with a current Mosaic.
  * Mosaic lowering constraints found while building it: offset slices of
    interleaved (stack+reshape) values lower to unsupported >2D gathers —
    crop before interleaving; manual ANY+DMA kernels are rejected by this
    helper — express halos by pre-stacking blocks instead.
  * the affine warp is gather-shaped — a TPU anti-pattern (measured 2.5 s
    for a 19-spec augmentation batch vs 56 ms on host cv2) — and
    deliberately stays on the XLA/host paths.
"""
from .pyrup import pyr_up_bicubic_pallas

__all__ = ["pyr_up_bicubic_pallas"]
