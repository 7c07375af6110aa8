"""Image resizing with exact PyTorch `F.interpolate(align_corners=False)` parity,
expressed as dense separable matmuls so XLA maps them onto the MXU.

The reference relies on torch bilinear resizes in its numerically-critical paths
(e.g. the discriminator loss upsamples scores to label resolution inside the
residual, /root/reference/model/discriminator.py:48, and `lib/utils.py:33-35`
`interpolate`), plus bicubic A=-0.75 kernels in the decoder upsampler
(/root/reference/model/seg_network.py:75-126). `jax.image.resize` does NOT match
torch: its cubic kernel uses A=-0.5 and it antialiases by default. Instead we
materialise the exact 1-D interpolation weights as an (out, in) matrix per axis
and contract — for VOS-scale images these matrices are tiny (<1 MB) and the
contraction is a matmul, which is the fastest possible formulation on TPU.

Matrices are cached per (in_size, out_size, mode) — shapes are static under jit.
"""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _source_coords(in_size: int, out_size: int) -> np.ndarray:
    """Half-pixel source coordinates (torch/TF align_corners=False)."""
    scale = in_size / out_size
    return (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5


@lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear weights matching torch's upsample_bilinear2d.

    torch clamps the source coordinate at 0 (not at in-1); upper overflow is
    handled by clamping the gather indices, which we fold into the matrix.
    """
    src = np.maximum(_source_coords(in_size, out_size), 0.0)
    i0 = np.floor(src).astype(np.int64)
    w1 = src - i0
    W = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(W, (rows, np.clip(i0, 0, in_size - 1)), 1.0 - w1)
    np.add.at(W, (rows, np.clip(i0 + 1, 0, in_size - 1)), w1)
    return W.astype(np.float32)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with A=-0.75 (torch / OpenCV convention)."""
    x = np.abs(x)
    f = np.where(
        x < 1.0,
        (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
        np.where(x < 2.0, a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return f


@lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bicubic weights matching torch's upsample_bicubic2d
    (unclamped source coordinate; 4 taps at floor-1..floor+2, indices clamped)."""
    src = _source_coords(in_size, out_size)
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    W = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    for tap in range(-1, 3):
        w = _cubic_kernel(tap - t)
        np.add.at(W, (rows, np.clip(i0 + tap, 0, in_size - 1)), w)
    return W.astype(np.float32)


_MATRICES = {"bilinear": _linear_matrix, "bicubic": _cubic_matrix}


def resize(x: jnp.ndarray, size, mode: str = "bilinear") -> jnp.ndarray:
    """Resize the two trailing-but-one spatial dims of an NHWC tensor.

    :param x:    (..., H, W, C) array
    :param size: (out_h, out_w)
    :param mode: 'bilinear' | 'bicubic'
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    make = _MATRICES[mode]
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if in_h != out_h:
        Wh = jnp.asarray(make(in_h, out_h))
        xf = jnp.einsum("oh,...hwc->...owc", Wh, xf)
    if in_w != out_w:
        Ww = jnp.asarray(make(in_w, out_w))
        xf = jnp.einsum("ow,...hwc->...hoc", Ww, xf)
    return xf.astype(dtype)


def resize_bilinear(x, size):
    return resize(x, size, "bilinear")


def resize_bicubic(x, size):
    return resize(x, size, "bicubic")


def interpolate(x: jnp.ndarray, size) -> jnp.ndarray:
    """Size-guarded bilinear resize (capability of /root/reference/lib/utils.py:33-35)."""
    return resize_bilinear(x, size)


def adaptive_cat(tensors, ref_index: int = 0) -> jnp.ndarray:
    """Resize every NHWC tensor to the ref tensor's spatial size, concat on C
    (capability of /root/reference/lib/utils.py:38-41)."""
    size = tensors[ref_index].shape[-3:-1]
    return jnp.concatenate([interpolate(t, size) for t in tensors], axis=-1)
