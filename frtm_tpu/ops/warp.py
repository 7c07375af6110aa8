"""Affine image warping — the TPU-native equivalent of the reference's only
native component, the NPP CUDA warp extension (/root/reference/lib/_npp/nppig.cpp
and the cv2 CPU path in /root/reference/lib/image.py:38-59).

Capability: warp an (H, W, C) image by a forward 3x3 affine matrix with
nearest / bilinear / bicubic (A=-0.75) interpolation and constant-zero borders,
matching cv2.warpAffine semantics (cv2 receives the forward map and inverts it
internally; we do the same).

Implementation: XLA-native gather math — output pixel coordinates are mapped
through H^-1 and the source is sampled with the interpolation taps expressed as
weighted clipped gathers. Everything is static-shape and jit-friendly. The warp
runs once per object initialisation over a handful of augmented frames, so the
gather formulation is already far off the critical path; a fused Pallas variant
lives in ops/pallas for the hot bicubic case.
"""
import jax.numpy as jnp


def _grid(out_h, out_w):
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    return xs, ys


def _inverse_map(H, out_h, out_w):
    """Map output (x, y) pixel coords through H^-1 to source coords."""
    H = jnp.asarray(H, dtype=jnp.float32)
    if H.shape[0] == 2:  # 2x3 affine -> full 3x3
        H = jnp.concatenate([H, jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)], axis=0)
    Hinv = jnp.linalg.inv(H)
    xo, yo = _grid(out_h, out_w)
    xs = Hinv[0, 0] * xo + Hinv[0, 1] * yo + Hinv[0, 2]
    ys = Hinv[1, 0] * xo + Hinv[1, 1] * yo + Hinv[1, 2]
    w = Hinv[2, 0] * xo + Hinv[2, 1] * yo + Hinv[2, 2]
    return xs / w, ys / w


def _sample(src, ix, iy):
    """Gather src[iy, ix] with clipped indices and a zero out-of-bounds mask."""
    h, w = src.shape[0], src.shape[1]
    inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = src[iyc, ixc]
    return vals * inb[..., None].astype(src.dtype)


def warp_affine(src: jnp.ndarray, H, size, mode: str = "bicubic") -> jnp.ndarray:
    """Warp an (H, W, C) image with a forward affine transform.

    :param src:  (H, W, C) array (any float dtype; promoted to f32 internally)
    :param H:    3x3 (or 2x3) forward affine matrix in (x, y) pixel coords
    :param size: output (height, width)
    :param mode: 'nearest' | 'bilinear' | 'bicubic'
    """
    out_h, out_w = int(size[0]), int(size[1])
    xs, ys = _inverse_map(H, out_h, out_w)
    return _resample(src, xs, ys, mode)


def warp_perspective(src: jnp.ndarray, H, size,
                     mode: str = "bicubic") -> jnp.ndarray:
    """Warp an (H, W, C) image with a forward 3x3 perspective transform —
    explicit counterpart of the reference native extension's
    `warp_perspective` (/root/reference/lib/_npp/nppig.cpp:106-117; exposed
    but never called from its Python code). The homogeneous division is the
    same one `warp_affine` performs; this entry point just requires the full
    3x3 matrix."""
    H = jnp.asarray(H, jnp.float32)
    assert H.shape == (3, 3), f"perspective transform must be 3x3, got {H.shape}"
    return warp_affine(src, H, size, mode)


def remap(src: jnp.ndarray, map_x, map_y, mode: str = "bilinear") -> jnp.ndarray:
    """Coordinate-map warp: out[y, x] = src sampled at (map_x[y,x], map_y[y,x])
    — the capability of the reference native extension's `remap`
    (/root/reference/lib/_npp/nppig.cpp:119-169; exposed but never called
    from its Python code) and of cv2.remap. Out-of-bounds samples are zero,
    matching the affine warp's constant border.

    :param src:   (H, W, C) array
    :param map_x: (out_h, out_w) float source x-coordinates
    :param map_y: (out_h, out_w) float source y-coordinates
    :param mode:  'nearest' | 'bilinear' | 'bicubic'
    """
    xs = jnp.asarray(map_x, jnp.float32)
    ys = jnp.asarray(map_y, jnp.float32)
    assert xs.shape == ys.shape and xs.ndim == 2
    return _resample(src, xs, ys, mode)


def _resample(src, xs, ys, mode):
    """Sample src at float coords (xs, ys) (both (out_h, out_w)) with the
    given interpolation; shared by warp_affine / warp_perspective / remap."""
    out_h, out_w = xs.shape
    dtype = src.dtype
    srcf = src.astype(jnp.float32)

    if mode == "nearest":
        ix = jnp.floor(xs + 0.5).astype(jnp.int32)
        iy = jnp.floor(ys + 0.5).astype(jnp.int32)
        out = _sample(srcf, ix, iy)
        return out.astype(dtype)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    if mode == "bilinear":
        taps = [(0, 1.0 - fx, 0, 1.0 - fy), (1, fx, 0, 1.0 - fy),
                (0, 1.0 - fx, 1, fy), (1, fx, 1, fy)]
        out = jnp.zeros((out_h, out_w, src.shape[-1]), jnp.float32)
        for dx, wx, dy, wy in taps:
            out = out + (wx * wy)[..., None] * _sample(srcf, ix0 + dx, iy0 + dy)
        return out.astype(dtype)

    if mode == "bicubic":
        # Keys cubic (A=-0.75), 4x4 taps; separable weights evaluated per pixel.
        wxs = [jnp.asarray(_w) for _w in _cubic_weights(fx)]
        wys = [jnp.asarray(_w) for _w in _cubic_weights(fy)]
        out = jnp.zeros((out_h, out_w, src.shape[-1]), jnp.float32)
        for dy in range(-1, 3):
            row = jnp.zeros_like(out)
            for dx in range(-1, 3):
                row = row + wxs[dx + 1][..., None] * _sample(srcf, ix0 + dx, iy0 + dy)
            out = out + wys[dy + 1][..., None] * row
        return out.astype(dtype)

    raise ValueError(f"unknown warp mode: {mode}")


def _cubic_weights(t):
    """Four Keys-cubic tap weights for fractional offset t (taps at -1..2)."""
    return [_cubic_jnp(tap - t) for tap in range(-1, 3)]


def _cubic_jnp(x, a: float = -0.75):
    x = jnp.abs(x)
    return jnp.where(
        x < 1.0,
        (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
        jnp.where(x < 2.0, a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
