"""Pallas/one-hot warp parity vs the XLA gather warp (ops/warp.py, itself
pinned against cv2 semantics in test_ops.py). The selection-matrix
formulation reassociates the f32 tap sums (y-taps contract before x-taps),
so parity is allclose at f32 tolerance, not bit-exact."""
import numpy as np
import pytest
import jax.numpy as jnp

from frtm_tpu.ops.warp import warp_affine


def _mats():
    rot = np.asarray([[0.94, -0.34, 3.2], [0.34, 0.94, -2.1],
                      [0.0, 0.0, 1.0]], np.float32)       # rotate + translate
    scale = np.asarray([[1.3, 0.0, -1.5], [0.0, 0.8, 2.0],
                        [0.0, 0.0, 1.0]], np.float32)     # anisotropic scale
    shift = np.asarray([[1.0, 0.0, 14.0], [0.0, 1.0, -11.0],
                        [0.0, 0.0, 1.0]], np.float32)     # mostly off-canvas
    return {"rot": rot, "scale": scale, "oob": shift}


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("mat", ["rot", "scale", "oob"])
def test_onehot_warp_matches_gather_warp(rng, mode, mat):
    from frtm_tpu.ops.pallas.warp import warp_affine_onehot
    src = jnp.asarray(rng.rand(20, 26, 3).astype(np.float32) * 255.0)
    H = _mats()[mat]
    want = np.asarray(warp_affine(src, H, (18, 24), mode=mode))
    got = np.asarray(warp_affine_onehot(src, H, (18, 24), mode=mode,
                                        row_chunk=5))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
def test_pallas_warp_matches_gather_warp(rng, mode):
    from jax.experimental.pallas import tpu as pltpu
    from frtm_tpu.ops.pallas.warp import warp_affine_pallas
    src = jnp.asarray(rng.rand(16, 20, 2).astype(np.float32) * 255.0)
    H = _mats()["rot"]
    want = np.asarray(warp_affine(src, H, (14, 18), mode=mode))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_affine_pallas(src, H, (14, 18), mode=mode))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)


def test_pallas_warp_zero_border(rng):
    """A translation that maps every output pixel out of bounds must produce
    exactly zero everywhere (the unmatched-iota border path)."""
    from jax.experimental.pallas import tpu as pltpu
    from frtm_tpu.ops.pallas.warp import warp_affine_pallas
    src = jnp.asarray(rng.rand(10, 12, 1).astype(np.float32))
    H = np.asarray([[1.0, 0.0, 100.0], [0.0, 1.0, 100.0], [0.0, 0.0, 1.0]],
                   np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(warp_affine_pallas(src, H, (10, 12), mode="bicubic"))
    assert np.all(got == 0.0)
