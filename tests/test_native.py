"""Native C++ library tests: warp parity vs cv2, PNG/JPEG IO round trips,
and the threaded batch decoder. Skipped when the toolchain can't build it."""
import numpy as np
import pytest

from frtm_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="frtm_native not built")


@pytest.mark.parametrize("mode,tol", [("nearest", 0.5), ("bilinear", 0.01),
                                      ("bicubic", 0.01)])
def test_native_warp_matches_cv2(rng, mode, tol):
    import cv2
    x = (rng.rand(37, 45, 3) * 255).astype(np.float32)
    H = np.array([[0.9, 0.1, 5], [-0.1, 0.95, -2], [0, 0, 1.0]])
    got = native.warp_affine(x, H, (31, 40), mode)
    flags = dict(nearest=cv2.INTER_NEAREST, bilinear=cv2.INTER_LINEAR,
                 bicubic=cv2.INTER_CUBIC)[mode]
    want = np.atleast_3d(cv2.warpAffine(x, H[:2].astype(np.float32), (40, 31),
                                        flags=flags))
    if mode == "nearest":
        assert np.mean(got != want) < 0.02
    else:
        assert np.percentile(np.abs(got - want), 99) < tol


def test_native_warp_rgba_and_single_channel(rng):
    x4 = (rng.rand(16, 16, 4) * 255).astype(np.float32)
    out = native.warp_affine(x4, np.eye(3), (16, 16), "bicubic")
    np.testing.assert_allclose(out, x4, atol=1e-3)
    x1 = (rng.rand(16, 16) * 255).astype(np.float32)
    out1 = native.warp_affine(x1, np.eye(3), (16, 16), "nearest")
    np.testing.assert_array_equal(out1[..., 0], x1)


def test_png_roundtrip_and_pil_compat(rng, tmp_path):
    from frtm_tpu.data.image import davis_palette, imwrite_indexed, imread
    lbl = rng.randint(0, 6, (20, 30)).astype(np.uint8)
    p = tmp_path / "x.png"
    imwrite_indexed(p, lbl)
    assert np.array_equal(imread(p)[..., 0], lbl)
    from PIL import Image
    assert np.array_equal(np.array(Image.open(p)), lbl)


def test_batch_jpeg_decode(rng, tmp_path):
    from PIL import Image
    paths = []
    for i in range(4):
        img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
        p = tmp_path / f"f{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    arr = native.batch_decode_jpeg_files(paths, 24, 32, n_threads=4)
    assert arr.shape == (4, 24, 32, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(arr[i], np.array(Image.open(p)))


def test_augmenter_native_backend_matches_cv2(rng):
    from frtm_tpu.models.augmenter import ImageAugmenter
    from frtm_tpu.config import eval_aug_params
    im = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    mask = np.zeros((96, 128, 1), np.float32)
    mask[30:60, 40:90] = 1
    outs = {}
    for backend in ("native", "cv2"):
        aug = ImageAugmenter(eval_aug_params(3), backend=backend)
        r = np.random.RandomState(0)
        ims, lbs = aug.augment_first_frame(im, mask, r)
        outs[backend] = (ims, lbs)
    a, b = outs["native"], outs["cv2"]
    assert a[0].shape == b[0].shape
    # same specs (same rng), near-identical pixels (int cast: uint8 wraps)
    diff = np.abs(a[0].astype(np.int16) - b[0].astype(np.int16))
    assert np.percentile(diff, 99) < 2.0
    assert np.mean(a[1] != b[1]) < 0.02


def test_native_filter2d_matches_cv2(rng):
    import cv2
    from frtm_tpu.utils import native
    from frtm_tpu.models.augmenter import blur_kernel, _rotate
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    img = (rng.rand(60, 90, 3) * 255).astype(np.float32)
    for size, ang in [(5.0, 45), (5.0, 0), (2.0, 135)]:
        G = blur_kernel(size, 0.1, _rotate(np.deg2rad(ang))[:2, :2])
        want = cv2.filter2D(img, -1, G, borderType=cv2.BORDER_CONSTANT)
        got = native.filter2d(img, G)
        np.testing.assert_allclose(got, want, atol=1e-3)
    # edge zero-padding semantics: an impulse at the corner
    imp = np.zeros((8, 8, 1), np.float32)
    imp[0, 0] = 1.0
    G = np.arange(9, dtype=np.float32).reshape(3, 3) + 1
    want = cv2.filter2D(imp, -1, G, borderType=cv2.BORDER_CONSTANT)
    np.testing.assert_allclose(native.filter2d(imp, G).squeeze(),
                               np.asarray(want).squeeze(), atol=0)
