"""Pallas TPU kernel for the affine bicubic warp — SURVEY §2.1's directive to
rebuild the reference's native warp surface (/root/reference/lib/_npp/
nppig.cpp:48-104, the NPP CUDA bicubic warp) "as a real kernel-level
component", attempted and measured on v5e.

Why a gather translation cannot work here: the CUDA kernel is one thread per
output pixel doing 16 random-access texture reads — the TPU has no texture
unit and no fast vector gather, and the XLA gather formulation of the same
math was measured at ~2.5 s for a batch of augmenter warps (CLAUDE.md,
round 2 anti-lessons). The TPU-native formulation used here exploits the one
structural fact a gather translation throws away: under an affine map the
source coordinates are LINEAR along each output row. The kernel therefore
processes one output row per grid step and

  * builds the bicubic y-interpolation as a generated selection matrix
    Sy[x, h] = sum_dy wy(x, dy) * [h == iy0(x) + dy]   (broadcasted_iota
    compares on the VPU — never materialised in HBM), then contracts it with
    the resident source plane on the MXU:   rowmix = Sy @ src  (OW,H)@(H,W);
    rowmix[x, :] is the y-resampled source row for output pixel x;
  * applies the four x-taps as one-hot mask-multiply-reduces of rowmix on
    the VPU:   out[x] = sum_dx wx(x, dx) * rowmix[x, ix0(x) + dx].

Out-of-bounds taps need no clipping or masking: an out-of-range index simply
matches no iota value, so its tap contributes zero — exactly the reference's
constant-zero border (cv2 BORDER_CONSTANT semantics, lib/image.py:38-59).
Numerics match ops/warp.py::warp_affine up to f32 reassociation (the matmul
sums the y-taps before the x-taps; the XLA path sums x first).

STATUS — measured on v5e (round 4, scripts/bench_pallas_warp.py), NOT in
the production path. 3-channel 480x854 bicubic warp, marginal in-program
cost:

    pallas (this kernel)   37.5 ms   exact to 8e-5 rel vs the gather warp
    onehot_xla (same math) 38.6 ms   exact to 3e-7 rel
    XLA gather (ops/warp)  49.5 ms   (the round-2 anti-lesson path)
    host cv2               7.8 ms    (full-frame, standalone)

The kernel WORKS and beats every device alternative (1.3x over the gather
lowering), but the formulation's arithmetic is MXU-shaped with 99.6% of it
multiplying zeros — the selection matrix is 4-sparse per row, so it performs
OW*H*W useful-plus-padding MACs to move 4 taps — and host cv2 remains 4.8x
faster still. The production augmenter path therefore remains host cv2
(augment_backend='host'): bbox-restricted host warps cost ~3 ms per object
(CLAUDE.md round-3 augment settlement), and the DeviceAugmenter experiment
already showed device-side warping loses end-to-end (28.9 vs 167.4 fps).
These numbers also close the hybrid-augmenter idea (upload one background,
warp K samples on device): K=4 device warps per object cost ~150 ms against
the ~8 MB/object upload they would replace. This kernel is the
measured-rejection record SURVEY §2.1 calls for, alongside
`warp_affine_onehot` — the same formulation expressed in pure XLA (lax.map
over row chunks) — which gives the no-Pallas baseline of the same idea.

Mosaic constraints honoured (same toolchain as pyrup.py/conv_small.py): the
source plane rides a constant-index BlockSpec (whole-array block, resident
across row steps); scalars (the six affine coefficients) ride SMEM; all
shapes static; grid = (C, OH).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cubic_w(t, a=-0.75):
    """Keys cubic weight at distance t (vector-safe, matches ops/warp.py)."""
    x = jnp.abs(t)
    return jnp.where(
        x < 1.0,
        (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
        jnp.where(x < 2.0,
                  a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a, 0.0),
    )


def _tap_table(mode):
    """(offsets, weight_fn(frac) -> list of per-tap weights)."""
    if mode == "bicubic":
        offs = (-1, 0, 1, 2)
        return offs, lambda f: [_cubic_w(o - f) for o in offs]
    if mode == "bilinear":
        offs = (0, 1)
        return offs, lambda f: [1.0 - f, f]
    if mode == "nearest":
        # one tap at floor(coord + 0.5), weight 1 (ops/warp.py:103-106)
        return (0,), lambda f: [jnp.ones_like(f)]
    raise ValueError(f"unknown warp mode: {mode}")


def _kernel(coef_ref, src_ref, out_ref, *, H, W, OW, mode, rows):
    """One grid step = `rows` output rows of one channel plane (Mosaic needs
    the output block's second-to-last dim 8-aligned, so rows=8; the row loop
    is unrolled in-kernel and Mosaic reuses the Sy/rowmix buffers across
    iterations — each row's liveness ends before the next begins)."""
    a, b, c0 = coef_ref[0, 0], coef_ref[0, 1], coef_ref[0, 2]
    d, e, f0 = coef_ref[0, 3], coef_ref[0, 4], coef_ref[0, 5]
    offs, weight_fn = _tap_table(mode)
    # Mosaic's tpu.iota is integer-only; cast for the coordinate math
    x = jax.lax.broadcasted_iota(jnp.int32, (OW, 1), 0).astype(jnp.float32)
    h_iota = jax.lax.broadcasted_iota(jnp.int32, (OW, H), 1)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (OW, W), 1)

    y_base = pl.program_id(1) * rows
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, OW), 0)

    def one_row(r, carry):
        y = (y_base + r).astype(jnp.float32)
        xs = a * x + (b * y + c0)      # source coords, linear along the row
        ys = d * x + (e * y + f0)
        if mode == "nearest":
            xs, ys = jnp.floor(xs + 0.5), jnp.floor(ys + 0.5)

        y0 = jnp.floor(ys)
        iy0 = y0.astype(jnp.int32)                      # (OW, 1)
        wys = weight_fn(ys - y0)
        x0 = jnp.floor(xs)
        ix0 = x0.astype(jnp.int32)
        wxs = weight_fn(xs - x0)

        # Sy[x, h] = sum_dy wy * [h == iy0 + dy]; OOB rows match nothing -> 0
        sy = None
        for dy, wy in zip(offs, wys):
            t = wy * (h_iota == iy0 + dy).astype(jnp.float32)
            sy = t if sy is None else sy + t

        # MXU: y-resampled source row per output pixel. HIGHEST precision —
        # the TPU default is one bf16 pass (~4.7e-3 rel error measured at
        # uint8 scale), unacceptable for a cv2-parity warp; the f32
        # decomposition costs extra MXU passes and is part of the recorded
        # cost of this formulation.
        rowmix = jnp.dot(sy, src_ref[0], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)

        # VPU: 4 x-taps as one-hot mask-multiply-reduce along lanes
        acc = None
        for dx, wx in zip(offs, wxs):
            t = jnp.sum(
                rowmix * (wx * (w_iota == ix0 + dx).astype(jnp.float32)),
                axis=1)
            acc = t if acc is None else acc + t
        # select-insert instead of a dynamic sublane store (r is traced);
        # the carry is (rows, OW) f32 — tiny next to the loop temps
        return jnp.where(r_iota == r, acc[None, :], carry)

    # a REAL loop, not a Python unroll: Mosaic allocates the big per-row
    # temps (sy/rowmix/x-tap masks, ~2.9 MB each at 480x854) once on the
    # kernel stack and reuses them every iteration — the unrolled form kept
    # all 8 iterations' temps live and overflowed the 16 MB scoped-vmem
    # stack by 1.24 MB (measured v5e compile failure, round 4)
    out_ref[0] = jax.lax.fori_loop(
        0, rows, one_row, jnp.zeros((rows, OW), jnp.float32))


def _affine_coefs(H_mat):
    """Forward 3x3/2x3 affine -> the six inverse-map coefficients
    (xs = a*x + b*y + c; ys = d*x + e*y + f), shaped (1, 6) for SMEM."""
    Hm = jnp.asarray(H_mat, jnp.float32)
    if Hm.shape[0] == 2:
        Hm = jnp.concatenate(
            [Hm, jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    Hi = jnp.linalg.inv(Hm)
    return jnp.stack([Hi[0, 0], Hi[0, 1], Hi[0, 2],
                      Hi[1, 0], Hi[1, 1], Hi[1, 2]]).reshape(1, 6)


def warp_affine_pallas(src: jnp.ndarray, H_mat, size,
                       mode: str = "bicubic",
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas warp of an (H, W, C) image by a forward affine matrix.

    Same contract as ops/warp.py::warp_affine (cv2 semantics: the forward
    map is inverted internally; constant-zero border). Affine only — the
    homogeneous division of `warp_perspective` would make the per-row
    coordinate progression non-linear and the formulation inapplicable.
    """
    out_h, out_w = int(size[0]), int(size[1])
    h, w, c = src.shape
    dtype = src.dtype
    planes = jnp.transpose(src.astype(jnp.float32), (2, 0, 1))  # (C, H, W)

    rows = 8                       # Mosaic sublane alignment for the output
    oh_pad = -(-out_h // rows) * rows
    out = pl.pallas_call(
        partial(_kernel, H=h, W=w, OW=out_w, mode=mode, rows=rows),
        grid=(c, oh_pad // rows),
        in_specs=[
            pl.BlockSpec((1, 6), lambda ci, yi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda ci, yi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, out_w), lambda ci, yi: (ci, yi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, oh_pad, out_w), jnp.float32),
        interpret=interpret,
    )(_affine_coefs(H_mat), planes)
    return jnp.transpose(out[:, :out_h], (1, 2, 0)).astype(dtype)


def warp_affine_onehot(src: jnp.ndarray, H_mat, size, mode: str = "bicubic",
                       row_chunk: int = 8) -> jnp.ndarray:
    """The same selection-matrix formulation in pure XLA — the no-Pallas
    control for the kernel above (and itself an alternative to the measured
    ~2.5 s XLA gather warp): lax.map over chunks of output rows; per chunk
    the y-selection matrices contract with the source on the MXU and the
    x-taps reduce as masked dots. Everything static-shape and jit-safe."""
    out_h, out_w = int(size[0]), int(size[1])
    h, w, _ = src.shape
    dtype = src.dtype
    srcf = src.astype(jnp.float32)
    coef = _affine_coefs(H_mat)[0]

    pad = (-out_h) % row_chunk
    rows = jnp.arange(out_h + pad, dtype=jnp.float32)
    offs, weight_fn = _tap_table(mode)

    def one_chunk(ys_rows):
        x = jnp.arange(out_w, dtype=jnp.float32)[None, :, None]   # (1, OW, 1)
        yy = ys_rows[:, None, None]                               # (R, 1, 1)
        xs = coef[0] * x + coef[1] * yy + coef[2]                 # (R, OW, 1)
        ys = coef[3] * x + coef[4] * yy + coef[5]
        if mode == "nearest":
            xs, ys = jnp.floor(xs + 0.5), jnp.floor(ys + 0.5)
        iy0 = jnp.floor(ys).astype(jnp.int32)
        wys = weight_fn(ys - jnp.floor(ys))
        ix0 = jnp.floor(xs).astype(jnp.int32)
        wxs = weight_fn(xs - jnp.floor(xs))

        h_iota = jnp.arange(h, dtype=jnp.int32)[None, None, :]
        sy = sum(wy * (h_iota == iy0 + dy) for dy, wy in zip(offs, wys))
        rowmix = jnp.einsum("rxh,hwc->rxwc", sy, srcf,            # MXU
                            precision=jax.lax.Precision.HIGHEST)
        w_iota = jnp.arange(w, dtype=jnp.int32)[None, None, :]
        acc = sum(jnp.einsum(
            "rxw,rxwc->rxc",
            wx[..., 0][:, :, None] * (w_iota == ix0 + dx), rowmix)
            for dx, wx in zip(offs, wxs))
        return acc                                                 # (R, OW, C)

    out = jax.lax.map(one_chunk, rows.reshape(-1, row_chunk))
    out = out.reshape(-1, out_w, src.shape[2])[:out_h]
    return out.astype(dtype)
