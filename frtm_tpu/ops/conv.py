"""Convolution / pooling / norm primitives in NHWC with torch-parity padding.

TPU-first choices:
  * NHWC activations, HWIO kernels — the native XLA:TPU layout (channels on the
    128-lane axis), so convs tile straight onto the MXU without transposes.
  * explicit symmetric padding (k//2) to match torch's Conv2d(padding=k//2)
    semantics exactly — XLA 'SAME' pads asymmetrically for stride>1 which would
    break parity with the reference backbones.
"""
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def conv2d(x, w, b=None, stride: int = 1, dilation: int = 1, precision=None):
    """2-D convolution. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout), torch-style k//2 pad."""
    kh, kw = w.shape[0], w.shape[1]
    pad = [(dilation * (kh // 2),) * 2, (dilation * (kw // 2),) * 2]
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DN,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv2d_t(x, w, precision=None):
    """Correlation with the flipped kernel (the transpose of conv2d for
    stride=1); used by hand-written adjoints."""
    wf = w[::-1, ::-1].swapaxes(2, 3)
    return conv2d(x, wf, precision=precision)


def max_pool_3x3_s2(x):
    """3x3/stride-2 max pool with padding 1 (torch ResNet stem pooling)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def batch_norm(x, params, eps: float = 1e-5):
    """Inference-mode batch norm using running statistics.

    params: dict(scale, bias, mean, var), each shape (C,). Folded into a single
    multiply-add so XLA fuses it into the neighbouring conv.
    """
    inv = params["scale"] * lax.rsqrt(params["var"] + eps)
    return x * inv + (params["bias"] - params["mean"] * inv)


def leaky_relu(x, negative_slope: float = 0.0):
    """The reference's `relu()` is LeakyReLU(0.0) (/root/reference/lib/utils.py:29-30);
    keep the slope parameter so behavior stays identical if configured non-zero."""
    if negative_slope == 0.0:
        return jnp.maximum(x, 0)
    return jnp.where(x >= 0, x, negative_slope * x)


def relu(x):
    return jnp.maximum(x, 0)
