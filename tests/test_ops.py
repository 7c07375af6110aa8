"""Parity tests for the numeric kernels against torch (CPU) and cv2 —
the reference's numerics are torch/cv2, so agreement here is what makes
mask-level parity with the reference possible (SURVEY.md §7 'hard parts')."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from frtm_tpu.ops import (
    resize_bilinear, resize_bicubic, adaptive_cat,
    conv2d, max_pool_3x3_s2, batch_norm, warp_affine,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def _to_nhwc(t):
    return np.moveaxis(t.numpy(), 1, -1)


@pytest.mark.parametrize("in_size,out_size", [
    ((30, 54), (480, 854)),   # score -> label upsample (discriminator loss)
    ((480, 854), (30, 54)),   # downsample
    ((17, 23), (34, 46)),     # 2x
    ((8, 8), (11, 13)),       # odd
])
def test_bilinear_matches_torch(rng, in_size, out_size):
    x = rng.randn(2, *in_size, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_size))
    want = _to_nhwc(F.interpolate(_nchw(x), out_size, mode="bilinear", align_corners=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


@pytest.mark.parametrize("in_size,out_size", [
    ((16, 16), (32, 32)),
    ((15, 21), (480, 854)),
    ((64, 64), (23, 31)),
])
def test_bicubic_matches_torch(rng, in_size, out_size):
    x = rng.randn(1, *in_size, 2).astype(np.float32)
    got = np.asarray(resize_bicubic(jnp.asarray(x), out_size))
    want = _to_nhwc(F.interpolate(_nchw(x), out_size, mode="bicubic", align_corners=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_adaptive_cat(rng):
    a = rng.randn(1, 16, 16, 4).astype(np.float32)
    b = rng.randn(1, 8, 8, 2).astype(np.float32)
    out = adaptive_cat([jnp.asarray(a), jnp.asarray(b)], ref_index=0)
    assert out.shape == (1, 16, 16, 6)
    np.testing.assert_allclose(np.asarray(out[..., :4]), a, atol=1e-6)


@pytest.mark.parametrize("k,stride,cin,cout", [(1, 1, 8, 4), (3, 1, 4, 6), (3, 2, 4, 4), (7, 2, 3, 8)])
def test_conv2d_matches_torch(rng, k, stride, cin, cout):
    x = rng.randn(2, 17, 19, cin).astype(np.float32)
    w = (rng.randn(k, k, cin, cout).astype(np.float32) * 0.1)
    b = rng.randn(cout).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride))
    wt = torch.from_numpy(np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1))))
    want = _to_nhwc(F.conv2d(_nchw(x), wt, torch.from_numpy(b), stride=stride, padding=k // 2))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


def test_max_pool_matches_torch(rng):
    x = rng.randn(1, 20, 23, 5).astype(np.float32)
    got = np.asarray(max_pool_3x3_s2(jnp.asarray(x)))
    want = _to_nhwc(F.max_pool2d(_nchw(x), 3, stride=2, padding=1))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batch_norm_matches_torch(rng):
    c = 6
    x = rng.randn(2, 9, 9, c).astype(np.float32)
    p = dict(scale=rng.rand(c).astype(np.float32) + 0.5,
             bias=rng.randn(c).astype(np.float32),
             mean=rng.randn(c).astype(np.float32),
             var=rng.rand(c).astype(np.float32) + 0.1)
    got = np.asarray(batch_norm(jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()}))
    want = _to_nhwc(F.batch_norm(
        _nchw(x), torch.from_numpy(p["mean"]), torch.from_numpy(p["var"]),
        torch.from_numpy(p["scale"]), torch.from_numpy(p["bias"]), training=False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=0)


# ---------------------------------------------------------------------------
# warp_affine vs cv2 (the reference's CPU dispatch path, lib/image.py:47-50)

def _cv2_warp(x_hwc, H, size, mode):
    import cv2
    flags = dict(nearest=cv2.INTER_NEAREST, bilinear=cv2.INTER_LINEAR, bicubic=cv2.INTER_CUBIC)[mode]
    out = np.stack([
        cv2.warpAffine(x_hwc[..., c], H[:2].astype(np.float32), (size[1], size[0]), flags=flags)
        for c in range(x_hwc.shape[-1])
    ], axis=-1)
    return out


def _random_affine(rng):
    a = rng.uniform(-0.4, 0.4)
    s = rng.uniform(0.7, 1.4)
    ca, sa = np.cos(a) * s, np.sin(a) * s
    tx, ty = rng.uniform(-5, 5, 2)
    return np.array([[ca, sa, tx], [-sa, ca, ty], [0, 0, 1.0]])


@pytest.mark.parametrize("mode,tol", [("nearest", 0.0), ("bilinear", 2e-2), ("bicubic", 5e-2)])
def test_warp_affine_matches_cv2(rng, mode, tol):
    x = rng.rand(37, 45, 3).astype(np.float32) * 255
    H = _random_affine(rng)
    size = (31, 40)
    got = np.asarray(warp_affine(jnp.asarray(x), H, size, mode))
    want = _cv2_warp(x, H, size, mode)
    if mode == "nearest":
        # nearest can disagree on exact .5 boundaries; demand almost-everywhere match
        frac_diff = np.mean(got != want)
        assert frac_diff < 0.02, frac_diff
    else:
        # cv2 uses fixed-point arithmetic internally: allow small abs tolerance
        err = np.abs(got - want)
        assert np.percentile(err, 99) < 255 * tol, np.percentile(err, 99)


def test_warp_identity(rng):
    x = rng.rand(16, 16, 1).astype(np.float32)
    H = np.eye(3)
    for mode in ("nearest", "bilinear", "bicubic"):
        got = np.asarray(warp_affine(jnp.asarray(x), H, (16, 16), mode))
        np.testing.assert_allclose(got, x, atol=1e-4, err_msg=mode)


def test_remap_matches_cv2(rng):
    """Coordinate-map warp parity with cv2.remap (the reference native
    extension exposes `remap`, nppig.cpp:119-169, though its Python never
    calls it — the capability exists here with tested semantics)."""
    import cv2
    from frtm_tpu.ops.warp import remap
    x = rng.rand(29, 35, 2).astype(np.float32) * 255
    map_x = (rng.rand(21, 26) * 40 - 3).astype(np.float32)  # incl. out-of-bounds
    map_y = (rng.rand(21, 26) * 34 - 3).astype(np.float32)
    got = np.asarray(remap(jnp.asarray(x), map_x, map_y, "bilinear"))

    # exact float bilinear reference (cv2.remap quantizes weights to 5-bit
    # fixed point, so it is only a loose sanity anchor below)
    x0 = np.floor(map_x).astype(int)
    y0 = np.floor(map_y).astype(int)
    fx, fy = map_x - x0, map_y - y0
    acc = np.zeros(got.shape, np.float32)
    for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
            xi, yi = x0 + dx, y0 + dy
            val = x[np.clip(yi, 0, 28), np.clip(xi, 0, 34)]
            inb = (xi >= 0) & (xi <= 34) & (yi >= 0) & (yi <= 28)
            acc += (wx * wy * inb)[..., None] * val
    np.testing.assert_allclose(got, acc, atol=1e-2)

    want = cv2.remap(x, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    inb = (map_x >= 1) & (map_x < 34) & (map_y >= 1) & (map_y < 28)
    err = np.abs(got - want)[inb]
    assert np.percentile(err, 99) < 255 / 32, np.percentile(err, 99)


def test_warp_perspective_division(rng):
    """warp_perspective must honor the homogeneous division: a pure
    perspective row must NOT behave like its affine truncation."""
    from frtm_tpu.ops.warp import warp_perspective
    x = rng.rand(24, 24, 1).astype(np.float32)
    H = np.array([[1.0, 0, 0], [0, 1.0, 0], [0.01, 0.005, 1.0]])
    got = np.asarray(warp_perspective(jnp.asarray(x), H, (24, 24), "bilinear"))
    # reference sampling through an explicit inverse-map remap
    import cv2
    Hinv = np.linalg.inv(H).astype(np.float32)
    ys, xs = np.mgrid[0:24, 0:24].astype(np.float32)
    w = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    mx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / w
    my = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / w
    want = cv2.remap(x[..., 0], mx, my, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    err = np.abs(got[..., 0] - want)
    assert np.percentile(err, 99) < 0.05, np.percentile(err, 99)
    # and it must differ from the affine truncation (the division matters)
    Haff = H.copy()
    Haff[2] = [0, 0, 1]
    aff = np.asarray(warp_perspective(jnp.asarray(x), Haff, (24, 24), "bilinear"))
    assert np.abs(got - aff).max() > 0.05


def test_conv2d_tapsum_matches_direct_lowering(rng):
    """The small-channel 3x3 fast path (9 shifted-slice matmuls, ops/conv.py
    _conv3x3_tapsum) must agree with the direct conv lowering at the decoder's
    real channel counts — same products, f32 accumulation, only summation
    order differs."""
    from jax import lax
    from frtm_tpu.ops.conv import _conv3x3_tapsum
    for cin, cout, h, w in [(33, 33, 15, 27), (32, 16, 24, 43), (48, 2, 48, 86)]:
        x = rng.randn(2, h, w, cin).astype(np.float32)
        k = (rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1)
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(k), tapsum=True))
        fast = np.asarray(_conv3x3_tapsum(jnp.asarray(x), jnp.asarray(k)))
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        direct = np.asarray(lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn))
        np.testing.assert_array_equal(got, fast)  # dispatch picked the fast path
        np.testing.assert_allclose(fast, direct, atol=1e-5, rtol=1e-5)


def test_conv2d_wfold_matches_direct_lowering(rng):
    """The cout=1 W-folded fast path (8 horizontal pixels packed into channels
    by a free reshape, ops/conv.py _conv3x3_wfold) must agree with the direct
    conv at the decoder-head shapes, including widths that need fold padding."""
    from jax import lax
    from frtm_tpu.ops.conv import _conv3x3_wfold
    for cin, h, w in [(16, 24, 86), (16, 9, 53), (32, 7, 8), (1, 5, 21)]:
        x = rng.randn(2, h, w, cin).astype(np.float32)
        k = (rng.randn(3, 3, cin, 1).astype(np.float32) * 0.1)
        got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(k), tapsum=True))
        fast = np.asarray(_conv3x3_wfold(jnp.asarray(x), jnp.asarray(k)))
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        direct = np.asarray(lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn))
        np.testing.assert_array_equal(got, fast)  # dispatch picked the fold path
        np.testing.assert_allclose(fast, direct, atol=1e-5, rtol=1e-5)


def test_conv2d_stem_s2d_matches_direct_lowering(rng):
    """The measured-and-rejected stem lowering (space-to-depth(2) + folded
    4x4 kernel, ops/conv.py _conv7x7_s2_s2d — see its docstring for the v5e
    numbers that keep it out of conv2d's dispatch) stays numerically exact
    vs the direct conv so the measurement record remains reproducible."""
    from jax import lax
    from frtm_tpu.ops.conv import _conv7x7_s2_s2d
    for cin, cout, h, w in [(3, 64, 48, 86), (3, 8, 32, 46), (4, 5, 16, 20)]:
        x = rng.randn(2, h, w, cin).astype(np.float32)
        k = (rng.randn(7, 7, cin, cout).astype(np.float32) * 0.1)
        fast = np.asarray(_conv7x7_s2_s2d(jnp.asarray(x), jnp.asarray(k)))
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
        direct = np.asarray(lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn))
        np.testing.assert_allclose(fast, direct, atol=1e-4, rtol=1e-4)


def test_pallas_conv_small_interpret_parity(rng):
    """The measured-and-rejected VPU kernel (ops/pallas/conv_small.py) stays
    exact — it is kept as the recorded experiment for the cout=1 decoder conv."""
    from jax import lax
    from frtm_tpu.ops.pallas.conv_small import conv3x3_cout1_pallas
    x = rng.randn(2, 32, 54, 16).astype(np.float32)
    k = (rng.randn(3, 3, 16, 1).astype(np.float32) * 0.1)
    b = rng.randn(1).astype(np.float32)
    got = np.asarray(conv3x3_cout1_pallas(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), interpret=True))
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    want = np.asarray(lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)) + b
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-6)
