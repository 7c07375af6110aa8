"""Convolution / pooling / norm primitives in NHWC with torch-parity padding.

TPU-first choices:
  * NHWC activations, HWIO kernels — the native XLA:TPU layout (channels on the
    128-lane axis), so convs tile straight onto the MXU without transposes.
  * explicit symmetric padding (k//2) to match torch's Conv2d(padding=k//2)
    semantics exactly — XLA 'SAME' pads asymmetrically for stride>1 which would
    break parity with the reference backbones.
"""
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Below this channel count a stride-1 3x3 conv runs as 9 shifted-slice matmuls
# instead of one conv op: with <=48 in/out channels the conv's 128x128 MXU
# tiles are mostly padding, and the tap-sum form measures 1.8x faster on v5e
# (33ch @ 8x120x214: 132 us vs 243 us; see CLAUDE.md perf log). The decoder's
# 16-33 channel convs take this path; backbone/solver convs (>=64ch) keep the
# native conv lowering, which wins once the contraction fills the MXU.
_TAPSUM_MAX_CH = 48
_WFOLD_MAX_CIN = 32


@lru_cache(maxsize=8)
def _wfold_scatter(k):
    """Constant scatter mapping a (3,3) tap of a cout=1 kernel onto the
    W-folded kernel layout: (9 taps) -> (3, 3_folded_cols, k phases, k outs).
    For output phase b and tap dj: the source column lands at folded column
    s = floor((b+dj)/k) with intra-group phase q = (b+dj) mod k."""
    M = np.zeros((9, 3, 3, k, k), np.float32)
    for b in range(k):
        for di in range(-1, 2):
            for dj in range(-1, 2):
                s, q = divmod(b + dj, k)
                M[(di + 1) * 3 + (dj + 1), di + 1, s + 1, q, b] = 1.0
    return M


def _conv3x3_wfold(x, w, k: int = 8, precision=None):
    """Stride-1 3x3 conv with ONE output channel, W-folded for the MXU.

    A cout=1 conv costs one systolic row per output pixel (two passes at
    K=9*Cin>128) no matter how empty the output tile is — measured 5.5 ms for
    (8,480,854,16)->1 on v5e, the tracker's single largest device op. Packing
    k horizontal pixels into channels is a FREE contiguous reshape (unlike
    space-to-depth, which transposes); the folded conv computes k output
    pixels per MXU row: measured 3.76 ms at k=8. The folded kernel is the
    original one scattered by a constant 0/1 map, so products are identical
    and only summation order differs."""
    n, h, wd, ci = x.shape
    wp = -(-wd // k) * k
    if wp != wd:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wp - wd), (0, 0)))
    u = x.reshape(n, h, wp // k, k * ci)
    wflat = w[..., 0].reshape(9, ci)
    kj = jnp.einsum("tc,tsSqb->sSqcb", wflat.astype(jnp.float32),
                    jnp.asarray(_wfold_scatter(k)))
    kj = kj.reshape(3, 3, k * ci, k).astype(w.dtype)
    v = lax.conv_general_dilated(u, kj, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=_DN, precision=precision)
    return v.reshape(n, h, wp, 1)[:, :, :wd]


def _conv3x3_tapsum(x, w, precision=None):
    """Stride-1 3x3 conv as 9 shifted-slice dot_generals accumulated in f32.
    Numerically equivalent to the direct conv (same products, f32 accumulation
    like the MXU's; summation order differs in the last ulp)."""
    n, h, wd, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for i in range(3):
        for j in range(3):
            t = lax.dot_general(
                xp[:, i:i + h, j:j + wd, :], w[i, j],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def conv2d(x, w, b=None, stride: int = 1, dilation: int = 1, precision=None,
           tapsum=None):
    """2-D convolution. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout), torch-style k//2 pad.

    tapsum: None (default) enables the tap-sum/W-fold fast paths only on TPU,
    where they beat the conv lowering (on CPU they measure 1.5-2.3x SLOWER —
    eigen's direct conv wins there). True forces the fast paths (tests);
    False pins the direct lowering regardless of shape — the GN-CG solver
    passes it so its numerics never depend on channel-count dispatch (its CG
    trajectory is pinned bit-close against reference mirrors at arbitrary
    test sizes).

    Known limitation of the auto-gate: it keys on jax.default_backend(), not
    the device the op is committed to, so a CPU-committed computation in a
    TPU-default process would take the TPU fast paths (correct results,
    1.5-2.3x slower). This codebase never mixes backends in one process;
    gate on the committed device's platform if that ever changes."""
    if tapsum is None:
        # the axon remote-TPU platform reports its own name, hence not-cpu
        tapsum = jax.default_backend() != "cpu"
    kh, kw = w.shape[0], w.shape[1]
    if (tapsum and kh == 3 and kw == 3 and stride == 1 and dilation == 1
            and x.ndim == 4):
        if w.shape[3] == 1 and w.shape[2] <= _WFOLD_MAX_CIN:
            y = _conv3x3_wfold(x, w, precision=precision)
            return y if b is None else y + b
        if max(w.shape[2], w.shape[3]) <= _TAPSUM_MAX_CH:
            y = _conv3x3_tapsum(x, w, precision=precision)
            return y if b is None else y + b
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
