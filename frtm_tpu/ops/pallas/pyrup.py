"""Fused Pallas kernel for the decoder's 2x bicubic pyramid upsampler.

Numerics identical to models/seg_network.pyr_up_bicubic (the reference's
PyrUpBicubic2d, model/seg_network.py:75-126): replicate-pad 2, four-phase
Keys(A=-0.75) separable filtering at offsets -0.25/-0.75, pixel interleave,
crop 1. The XLA formulation materialises the row-filtered intermediates and
four phase maps in HBM; this kernel computes each output tile entirely
on-chip — the only HBM traffic is one read of the (slightly duplicated)
input and one write of the output.

Filter row-blocks need 4-row halos, which BlockSpec tiling cannot express as
overlapping windows — and this environment's remote Mosaic helper rejects
manual ANY+DMA kernels — so the halo'd blocks are pre-stacked on the host
side ((th+4)/th ~ 1.1x input duplication, far below the intermediate traffic
saved)."""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..resize import _cubic_kernel


def _taps(phase):
    x = phase + np.arange(-1, 3, dtype=np.float64)
    return [float(v) for v in _cubic_kernel(x)]

_WE = _taps(-0.25)
_WO = _taps(-0.75)


def _filt4_val(x, taps, axis):
    n = x.shape[axis] - 3
    idx = [slice(None)] * x.ndim

    def take(off):
        s = list(idx)
        s[axis] = slice(off, off + n)
        return x[tuple(s)]

    return (taps[0] * take(0) + taps[1] * take(1)
            + taps[2] * take(2) + taps[3] * take(3))


def _kernel(x_ref, even_ref, odd_ref, *, th):
    """W-interleave happens in-kernel (a supported sublane relayout); the
    H-interleave would lower to an unsupported gather, so the kernel emits
    even/odd output-row planes and the caller interleaves them (one cheap
    XLA pass instead of four materialised phase maps)."""
    a = x_ref[0]                  # (th + 4, W + 4, C) halo'd row block

    re = _filt4_val(a, _WE, 0)    # (th + 1, W + 4, C) row pairs, even phase
    ro = _filt4_val(a, _WO, 0)
    i00 = _filt4_val(re, _WE, 1)  # (th + 1, W + 1, C)
    i01 = _filt4_val(re, _WO, 1)
    i10 = _filt4_val(ro, _WE, 1)
    i11 = _filt4_val(ro, _WO, 1)

    h1, w1, c = i00.shape
    W = w1 - 1
    # the global crop-by-1 is applied BEFORE interleaving (an offset slice of
    # the interleaved value lowers to an unsupported gather): cropped columns
    # are the odd phase at pairs [0, W) interleaved with the even phase at
    # [1, W+1), and likewise rows split into even/odd output planes
    even_ref[...] = jnp.stack(
        [i11[0:th, 0:W], i10[0:th, 1:W + 1]], axis=2).reshape(th, 2 * W, c)[None]
    odd_ref[...] = jnp.stack(
        [i01[1:th + 1, 0:W], i00[1:th + 1, 1:W + 1]], axis=2).reshape(th, 2 * W, c)[None]


def pyr_up_bicubic_pallas(x: jnp.ndarray, row_block: int = 8) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C), fused on TPU.

    row_block=8 keeps the kernel's scoped VMEM under the 16 MB limit at
    decoder shapes (row_block=30 OOMs: ~50 MB scoped; measured on v5e,
    round 2). At (1,120,214,32) f32 the compiled kernel is bit-exact vs the
    XLA formulation and measures 1.24 ms vs XLA's 0.75 ms standalone — and
    inside the tracker's scan XLA fuses the slice-sum formulation into the
    surrounding ops (~4 ms total for 128 pyrups of a 64-frame pass), so the
    XLA path stays the production default. This kernel remains for
    toolchains/shapes where the fusion doesn't materialise."""
    N, H, W, C = x.shape
    th = min(row_block, H)
    while H % th:
        th -= 1
    nb = H // th
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    # halo'd row-block stack: (N * nb, th + 4, W + 4, C)
    xs = jnp.stack([xp[:, i * th:i * th + th + 4] for i in range(nb)], axis=1)
    xs = xs.reshape(N * nb, th + 4, W + 4, C)

    spec = pl.BlockSpec((1, th, 2 * W, C), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    even, odd = pl.pallas_call(
        partial(_kernel, th=th),
        grid=(N * nb,),
        in_specs=[pl.BlockSpec((1, th + 4, W + 4, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((N * nb, th, 2 * W, C), x.dtype),
                   jax.ShapeDtypeStruct((N * nb, th, 2 * W, C), x.dtype)),
    )(xs)
    out = jnp.stack([even, odd], axis=2).reshape(N * nb, 2 * th, 2 * W, C)
    return out.reshape(N, 2 * H, 2 * W, C)
