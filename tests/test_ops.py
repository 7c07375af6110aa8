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
