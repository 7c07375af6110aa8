"""Pallas VPU kernel for the decoder's final full-resolution conv (3x3,
small Cin -> 1 channel).

Why a kernel was tried: the decoder head ends with `conv2:
(B, 480, 854, 16) -> 1` (reference BackwardCompatibleUpsampler,
model/seg_network.py:129-146). On the MXU every conv output pixel costs one
systolic row regardless of how few output channels it has, so XLA's conv
lowering runs this op at ~170 GFLOP/s — 5.5 ms per 8-frame decode window on
v5e, the single largest device op in the tracker. A cout=1 conv is per-pixel
vector work, so this kernel lays channel planes out with W on the 128-lane
axis and accumulates the 9*Cin scalar-weighted shifted planes on the VPU.

STATUS — measured on v5e (round 2), NOT in the production path: the kernel
compiles, is exact (6e-7 vs the direct conv in f32), and runs 6.1-6.4 ms —
SLOWER than XLA's 5.5 ms. The compute is not the problem; the data movement
is: the NHWC->channel-planes transpose + halo'd row-block stack the kernel
needs costs 2.8 ms alone (measured prep-only), and a kernel body stripped to
a bare 16-way channel sum still measures 5.6 ms, so HBM->VMEM streaming of
the rearranged layout dominates end to end. row_block in {16, 48},
bf16-vs-f32 accumulate, and dimension_semantics overrides all land within
6.0-6.4 ms; row_block=96 exceeds scoped VMEM (HTTP 500 = Mosaic OOM, same
failure class as pyrup row_block=30). The production fix is algebraic
instead: ops/conv.py::_conv3x3_wfold packs 8 horizontal pixels into channels
via a FREE contiguous reshape (no transpose) and measures 3.76 ms — that
path is the default; this kernel is kept as the measured record.

Mosaic constraints honoured (see ops/pallas/pyrup.py, same toolchain): halos
cannot be expressed as overlapping BlockSpec windows and manual ANY+DMA is
rejected, so halo'd row blocks are pre-stacked host-side; all in-kernel
slices are static.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, x_ref, out_ref, *, th, W, C):
    """x_ref: (1, C, th+2, W+2) halo'd channel-plane block; w_ref: (9, C) taps
    in SMEM; out_ref: (1, th, W). Accumulates f32 on the VPU."""
    acc = None
    for c in range(C):
        plane = x_ref[0, c].astype(jnp.float32)   # (th+2, W+2)
        for di in range(3):
            for dj in range(3):
                t = w_ref[3 * di + dj, c] * plane[di:di + th, dj:dj + W]
                acc = t if acc is None else acc + t
    out_ref[0] = acc


def conv3x3_cout1_pallas(x: jnp.ndarray, w: jnp.ndarray, b=None,
                         row_block: int = 16, interpret: bool = False):
    """3x3 stride-1 conv with a single output channel, VPU-fused.

    :param x: (N, H, W, C) activations (bf16 or f32)
    :param w: (3, 3, C, 1) kernel
    :param b: optional (1,) bias
    :return: (N, H, W, 1) in x.dtype, f32-accumulated like the MXU path
    """
    N, H, W, C = x.shape
    th = min(row_block, H)
    while H % th:
        th -= 1
    nb = H // th

    # channel planes with W on the lane axis, zero conv padding, pre-stacked
    # halo'd row blocks: (N*nb, C, th+2, W+2)
    xt = jnp.pad(x.transpose(0, 3, 1, 2), ((0, 0), (0, 0), (1, 1), (1, 1)))
    xs = jnp.stack([xt[:, :, i * th:i * th + th + 2] for i in range(nb)],
                   axis=1).reshape(N * nb, C, th + 2, W + 2)
    wf = w[..., 0].reshape(9, C).astype(jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, th=th, W=W, C=C),
        grid=(N * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, th + 2, W + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * nb, th, W), jnp.float32),
        interpret=interpret,
    )(wf, xs)
    y = out.reshape(N, H, W, 1).astype(x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y
