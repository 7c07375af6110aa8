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


@lru_cache(maxsize=4)
def _s2d_stem_map(ci):
    """Constant 0/1 map folding a 7x7/stride-2 kernel into the equivalent
    4x4/stride-1 kernel over the space-to-depth(2) input: tap (a, b) of the
    original kernel lands at folded tap (alpha+2, beta+2) and channel slot
    (u, v, c), where a - 3 = 2*alpha + u and b - 3 = 2*beta + v."""
    M = np.zeros((7, 7, 4, 4, 2, 2), np.float32)
    for a in range(7):
        al, u = divmod(a - 3, 2)
        for b in range(7):
            be, v = divmod(b - 3, 2)
            M[a, b, al + 2, be + 2, u, v] = 1.0
    return M


def _conv7x7_s2_s2d(x, w, precision=None):
    """7x7/stride-2/pad-3 conv (the ResNet stem) via space-to-depth(2) —
    MEASURED AND REJECTED; conv2d keeps the direct lowering for the stem.

    The hypothesis: a cin=3 conv uses 3 of the MXU's 128 contraction lanes
    (~7% utilisation at 2.24 ms for (16,480,854,3)->(16,240,427,64) on v5e,
    scripts/bench_extract_breakdown.py), so regrouping 2x2 pixel blocks into
    channels should quadruple the occupied lanes: out[i,j] = sum_{a,b}
    k[a,b] x[2i+a-3, 2j+b-3] with a-3 = 2*alpha+u becomes a 4x4/stride-1
    conv over y[p,q,(u,v,c)] = x[2p+u, 2q+v, c] with asymmetric pad (2,1)
    (the (alpha=-2, u=0) slot maps to a=-1 and stays zero). Products are
    identical to the direct lowering (test_ops.py pins exactness).

    The v5e measurement killed it (scripts/bench_stem_variants.py, B=16
    marginal): the folded conv alone is faster (1.36 vs 2.24 ms trace) but
    the NHWC space-to-depth transpose costs ~1.1 ms on top — net 3.37 vs
    2.29 ms direct. Width-only folds whose reshapes ARE free (contiguous)
    also lose: wfold2 (cin=6, kernel 7x4) 2.53 ms, wfold4 (pad W to 856,
    cin=12, output phase folded into channels, free both ways) 2.92 ms —
    XLA's own cin=3 conv lowering already packs the stem efficiently.
    Kept as the measurement record."""
    n, h, wd, ci = x.shape
    y = x.reshape(n, h // 2, 2, wd // 2, 2, ci)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, wd // 2, 4 * ci)
    co = w.shape[3]
    k4 = jnp.einsum("abcd,abABuv->ABuvcd", w.astype(jnp.float32),
                    jnp.asarray(_s2d_stem_map(ci)))
    k4 = k4.reshape(4, 4, 4 * ci, co).astype(w.dtype)
    return lax.conv_general_dilated(y, k4, (1, 1), [(2, 1), (2, 1)],
                                    dimension_numbers=_DN, precision=precision)


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
