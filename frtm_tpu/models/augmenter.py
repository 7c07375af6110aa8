"""First-frame augmentation: builds the discriminator's initial training set
by cutting out the target, inpainting the hole, and re-pasting the target
under random affine/blur transforms.

Capability parity with /root/reference/model/augmenter.py (ImageAugmenter,
augment_first_frame, lines 473-555): jittered grid of target centres,
independently-shuffled parameter lists combined into specs, scale-clamped
affine composition translate*skew*rotate*scale*translate(-target), rotated
Gaussian motion-blur kernels, bicubic image / nearest label warps with
alpha-feathered pasting, per-frame visibility verification with a retry loop,
and the original frame always inserted first.

Host/device split (SURVEY.md §7 'hard parts'): cv2 TELEA inpainting and the
morphology around it have no XLA analog and run once per object, so they stay
on host; the warps, blur filtering, and alpha pasting run through the
framework's XLA warp/conv ops (jit-cached per image size).

Randomness comes from an explicit numpy RandomState; the tracker reseeds it
to 0 per object like the reference's determinism hack (model/tracker.py:178-180).
"""
from dataclasses import dataclass

import numpy as np
import cv2
import jax.numpy as jnp

from ..ops.warp import warp_affine
from ..ops.conv import conv2d


# Default parameter selections (reference AugmentationParams2, lines 39-57).
_DEFAULT_SELECTIONS = dict(
    num_aug=20,
    location=[(0.5, 0.5)],
    rotation=[5, -5, 10, -10, 20, -20, 30, -30, 45, -45, 60, -60],
    fliplr=[False, False, True],
    scale=[0.7, 1.0, 1.5, 2.0, "0.25", "0.5", "1.0"],
    skew=[(0.0, 0.0), (0.0, 0.0), (0.1, 0.1)],
    blur_size=[0.0, 0.0, 0.0, 2.0, 5.0],
    blur_angle=[0, 45, 90, 135],
)


@dataclass
class CompactAugBatch:
    """Transfer-minimised encoding of one object's augment batch (round 5,
    VERDICT r4 #1): every augmented frame the dense path materialises is a
    memoized BACKGROUND plus a bbox-sized blended target PASTE (reference
    pipeline /root/reference/model/augmenter.py:371-404), so instead of
    ~4.9 MB of full augmented frames per object, the device receives the
    small pieces and composes the batch itself (models/aug_compose.py):

      * slot 0 is the real frame — device-resident already, never encoded;
      * the inpainted background differs from the real frame only inside the
        dilated target mask, so it rides as a bbox patch (`inpaint_*`);
      * identity-transform backgrounds ARE the inpainted frame; blur-only
        backgrounds are a small conv of it (kernel rides along, the device
        applies it); only scale-warped backgrounds upload a full frame —
        ONE pre-blur base per distinct transform (`warp_bases`; the eval/
        train bg parameter lists contain a single non-unit scale, so this is
        at most one frame per object);
      * each foreground paste is the final blended uint8 rectangle
        (bit-exact host math — the blend happens here against the host's
        f32 background) plus its box and the slot's background descriptor.

    Exactness vs the dense path: slot 0, labels, every paste rectangle, and
    identity-background slots are bit-exact. Blur-only backgrounds differ
    only by conv summation order (sub-LSB in f32; <=1 uint8 count after the
    cast) and scale-warped backgrounds additionally quantize the pre-blur
    base to uint8 (the no-blur scale slot is exactly the dense value, which
    IS that cast; a blurred scale slot sees <=1 count) — gated by
    tests/test_aug_compose.py."""
    image: object          # (H, W, 3) uint8 real frame (slot 0)
    mask: object           # (H, W) uint8 slot-0 label
    inpaint_patch: object  # (hi, wi, 3) uint8 — inpainted-minus-real region
    inpaint_box: tuple     # (y, x, hi, wi)
    warp_bases: list       # [(H, W, 3) uint8] pre-blur warped backgrounds
    bg_idx: list           # per slot: 0 = inpainted, i>=1 -> warp_bases[i-1]
    kernels: list          # per slot: (kh, kw) f32 blur kernel ((1,1) = none)
    patches: list          # per slot: (h, w, 3) uint8 blended fg rectangle
    boxes: list            # per slot: (y, x, h, w)
    lbl_patches: list      # per slot: (h, w) uint8 label rectangle


@dataclass
class AugSpec:
    """One augmentation: target centre (image fractions), rotation (deg),
    mirror, scale (number = factor, str = fraction of image height), skew,
    blur size/angle (reference AugmentationSpec, lines 63-92)."""
    location: tuple
    rotation: float = 0.0
    fliplr: bool = False
    scale: object = 1.0
    skew: tuple = (0.0, 0.0)
    blur_size: float = 0.0
    blur_angle: float = 0.0
    min_size: int = 10


def _translate(dx, dy):
    return np.array([[1, 0, dx], [0, 1, dy], [0, 0, 1]], np.float64)


def _rotate(a):
    ca, sa = np.cos(a), np.sin(a)
    return np.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1]], np.float64)


def _scale_m(sx, sy):
    return np.diag([sx, sy, 1.0])


def _skew_m(kx, ky):
    return np.array([[1, kx, 0], [ky, 1, 0], [0, 0, 1]], np.float64)


def blur_kernel(sx, sy, R):
    """Rotated anisotropic Gaussian (reference _blur_kernel, lines 120-138)."""
    cov = R @ np.diag((sx, sy)) @ R.T
    s = int(np.max((sx, sy)) / 2 + 0.5)
    s = s + (s + 1) % 2
    r = np.arange(-s, s + 1)
    X = np.stack(np.meshgrid(r, r))
    X = (X * np.tensordot(np.linalg.inv(cov), X, axes=[1, 0])).sum(0)
    G = np.exp(-0.5 * X)
    return (G / G.sum()).astype(np.float32)


def center_bbox_from_mask(mask) -> tuple:
    """(center_x, center_y, w, h) of the nonzero extent; w=h=0 when empty
    (reference lines 432-452)."""
    mask = np.asarray(mask).squeeze()
    ys = np.flatnonzero(mask.sum(axis=-1))
    xs = np.flatnonzero(mask.sum(axis=-2))
    if len(ys) == 0 or len(xs) == 0:
        return 0.0, 0.0, 0, 0
    w = xs[-1] - xs[0] + 1
    h = ys[-1] - ys[0] + 1
    return xs[0] + w / 2, ys[0] + h / 2, w, h


class ImageAugmenter:

    def __init__(self, params: dict, backend: str = "auto"):
        """:param params: dict with num_aug, min_px_count, fg_aug_params,
        and optional bg_aug_params (parameter-selection lists)
        :param backend: 'native' (frtm_native C++ warps, threaded),
        'cv2' (host warps matching the reference's CPU dispatch path,
        lib/image.py:47-50), 'xla' (device warps via ops/warp), or 'auto',
        which selects cv2: its SIMD warps measured faster than the scalar
        native kernel on few-core hosts (pass 'native' explicitly to use
        the C++ path). Host backends win when host<->device bandwidth is
        limited; init-time augmentation is host latency-bound."""
        self.params = params
        if backend == "auto":
            # cv2's SIMD warps beat the scalar native kernel on few-core
            # hosts; the native library still serves the IO data path
            backend = "cv2"
        self.backend = backend
        self.max_retries = 100

    # -- spec generation ----------------------------------------------------

    def generate_target_locations(self, N, im_size, rng):
        """Jittered shuffled grid of target centres (reference lines 171-194)."""
        h, w = im_size
        aspect = w / h
        nrows = int(np.ceil(np.sqrt(N / aspect)))
        ncols = int(np.ceil(aspect * nrows))
        co_max, ro_max = 0.5 / ncols, 0.5 / nrows
        centers = []
        for r in range(nrows):
            for c in range(ncols):
                x = (c + 0.5) / ncols + rng.normal(0, co_max / 4)
                y = (r + 0.5) / nrows + rng.normal(0, ro_max / 4)
                centers.append((round(x, 3), round(y, 3)))
        rng.shuffle(centers)
        return centers[:N]

    def generate_specs(self, selections: dict, rng):
        """Independently shuffle each parameter list and zip into specs
        (reference generate_specs2, lines 196-225). Produces num_aug-1 specs
        where num_aug defaults to 20 regardless of the requested output count
        — the reference over-generates and crops later."""
        sel = dict(_DEFAULT_SELECTIONS)
        sel.update(selections)
        N = sel.pop("num_aug") - 1
        chosen = {}
        for k, vals in sel.items():
            vals = list(vals) * ((N + len(vals) - 1) // len(vals))
            rng.shuffle(vals)
            chosen[k] = vals[:N]
        return [AugSpec(**{k: chosen[k][i] for k in chosen}) for i in range(N)]

    # -- geometry -----------------------------------------------------------

    def get_transform(self, spec: AugSpec, tg_bbox, im_size, limit_scale=True,
                      use_blur=True):
        """Affine 3x3 + blur kernel from a spec (reference lines 227-271)."""
        tg_x, tg_y, tg_w, tg_h = tg_bbox
        assert tg_w > 0 and tg_h > 0
        im_h, im_w = im_size
        t, a, s, k = spec.location, spec.rotation, spec.scale, spec.skew

        if isinstance(s, str):
            s = float(s) * im_h / tg_h
        if limit_scale:
            if s * tg_w > im_w or s * tg_h > im_h:
                s = min(im_w / tg_w, im_h / tg_h)
            if s * tg_w < spec.min_size or s * tg_h < spec.min_size:
                s = max(spec.min_size / tg_w, spec.min_size / tg_h)

        m = -1 if spec.fliplr else 1
        d2r = np.pi / 180
        T = (_translate(t[0] * im_w, t[1] * im_h) @ _skew_m(*k)
             @ _rotate(a * d2r) @ _scale_m(m * s, s) @ _translate(-tg_x, -tg_y))

        if use_blur and spec.blur_size > 0:
            R = _rotate(spec.blur_angle * d2r)[:2, :2]
            G = blur_kernel(spec.blur_size, 0.1, R)
        else:
            G = np.array([[1.0]], np.float32)
        return T, G

    # -- host-side cut & inpaint -------------------------------------------

    @staticmethod
    def cut_and_inpaint(image, mask, d=9, f=3):
        """Cut the target out (feathered alpha), TELEA-inpaint the hole, blur
        the inpainted border (reference lines 296-340). Host-side cv2.

        :param image: (H, W, 3) uint8
        :param mask:  (H, W) or (H, W, 1) nonzero = target
        :return: (target RGBA (H,W,4) uint8-range f32, inpainted RGB uint8)
        """
        image = np.asarray(image, np.uint8)
        mask = (np.asarray(mask).squeeze() > 0).astype(np.uint8)[..., None]

        target = mask * image
        if f == 1:
            # 1x1 erode and 1x1 blur are identities: alpha is just the mask.
            # (The reference calls with f=1, augmenter.py:502 — this skips two
            # full-frame cv2 passes with bit-identical output.)
            alpha = mask[..., 0] * 255
        else:
            k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (f, f))
            alpha = cv2.blur(cv2.erode(mask, k) * 255, (f, f))
        target = np.concatenate((target, alpha[..., None]), axis=-1)

        mask1 = cv2.dilate(mask, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (d * 2, d * 2)))
        # TELEA on a sub-window enclosing the hole: the FMM band only reads
        # known pixels within inpaintRadius of the (dilated) hole, so a
        # margin of d+4 reproduces the full-frame call bit-exactly at a
        # fraction of the cost (measured 5.5 -> ~0.5 ms at DAVIS size;
        # pinned by tests/test_aug_compose.py::test_subwindow_inpaint...)
        ys = np.flatnonzero(mask1.any(axis=1))
        xs = np.flatnonzero(mask1.any(axis=0))
        H, W = mask1.shape[:2]
        inpainted = image.copy()
        if len(ys):  # empty hole: nothing to inpaint
            m = d + 4
            y0, y1 = max(0, ys[0] - m), min(H, ys[-1] + 1 + m)
            x0, x1 = max(0, xs[0] - m), min(W, xs[-1] + 1 + m)
            inpainted[y0:y1, x0:x1] = cv2.inpaint(
                np.ascontiguousarray(image[y0:y1, x0:x1]),
                np.ascontiguousarray(mask1[y0:y1, x0:x1]),
                inpaintRadius=d, flags=cv2.INPAINT_TELEA)

        if d > 1:
            mask0 = cv2.erode(mask, cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (d, d)))
            m = ((1 - mask0) * mask1)[..., None] if mask0.ndim == 2 else (1 - mask0) * mask1
            m = (cv2.blur(m.squeeze() * 255, ksize=(d, d))[..., None] / 255.0).astype(np.float32)
            bim = cv2.blur(inpainted, ksize=(d, d))
            inpainted = (bim * m + (1.0 - m) * inpainted).astype(np.uint8)
        # d == 1: blur(x, (1,1)) is the identity, so bim == inpainted and the
        # blend bim*m + (1-m)*inpainted == inpainted exactly — skip it all.
        return target.astype(np.float32), inpainted

    # -- warp / filter / paste (host cv2 or device XLA backend) -------------

    def _warp(self, img, T, mode):
        return self._warp_sized(img, T, np.asarray(img).shape[:2], mode)

    def _warp_sized(self, img, T, size, mode):
        if self.backend == "native":
            from ..utils import native as _native
            img = np.asarray(img, np.float32)
            return _native.warp_affine(img, T, size, mode)
        if self.backend == "cv2":
            flags = dict(nearest=cv2.INTER_NEAREST, bilinear=cv2.INTER_LINEAR,
                         bicubic=cv2.INTER_CUBIC)[mode]
            img = np.ascontiguousarray(np.asarray(img, np.float32))
            out = cv2.warpAffine(img, np.asarray(T, np.float64)[:2],
                                 (size[1], size[0]), flags=flags)
            return np.atleast_3d(out)
        return np.asarray(warp_affine(jnp.asarray(img, jnp.float32), T,
                                      size, mode))

    def _filter_image(self, img, kernel):
        """Per-channel 2-D filtering (reference filter_image, lines 342-352)."""
        if kernel.shape == (1, 1):
            return img
        if self.backend in ("cv2", "native"):
            img = np.asarray(img, np.float32)
            # cv2's f32 filter2D is slow for the rotated (non-axis-aligned)
            # 7x7 motion-blur kernels (17-25 ms at DAVIS size on this host);
            # the native row-span filter measures 4-5 ms with the same
            # zero-padding semantics (diff ~2e-5, sub-LSB after the uint8
            # cast). 3x3 kernels stay on cv2 (faster there).
            if kernel.shape[0] > 3 and img.ndim == 3:
                from ..utils import native as _native
                if _native.available():
                    return _native.filter2d(img, kernel)
            return np.atleast_3d(cv2.filter2D(img, -1, kernel,
                                              borderType=cv2.BORDER_CONSTANT))
        k = jnp.asarray(kernel, jnp.float32)[..., None, None]  # (fh, fw, 1, 1)
        x = jnp.moveaxis(jnp.asarray(img, jnp.float32), -1, 0)[..., None]
        y = conv2d(x, k)
        return np.asarray(jnp.moveaxis(y[..., 0], 0, -1))

    def warp_and_filter_image(self, image, T, G):
        """Whole-image warp + blur (bg augmentation; reference lines 354-368).
        Identity transforms (the common bg spec: scale 1, rotation 0) skip the
        warp entirely — bitwise equivalent, large host-time saving."""
        if np.allclose(T, np.eye(3), atol=1e-12):
            out = np.asarray(np.atleast_3d(image), np.float32)
        else:
            out = np.clip(self._warp(image, T, "bicubic"), 0, 255)
        return self._filter_image(out, G)

    def _filter_region(self, img, kernel, y0, y1, x0, x1):
        """The [y0:y1, x0:x1] region of `_filter_image(img f32, kernel)`
        WITHOUT filtering the whole frame: the filter is local (kernel
        support) with BORDER_CONSTANT-zero semantics, so filtering a
        margin-padded sub-window — real frame values inside, zeros where the
        margin crosses the true frame border — reproduces the region
        bit-exactly. Compact mode uses this for the paste blend: the full
        blurred background is composed on DEVICE, so the host needs only the
        patch's worth (measured: the full-frame bg blurs were 11.2 ms each,
        the dominant standalone host-augment cost)."""
        if kernel.shape == (1, 1):
            return np.asarray(img[y0:y1, x0:x1], np.float32)
        H, W = img.shape[:2]
        my, mx = kernel.shape[0] // 2, kernel.shape[1] // 2
        yl, xl = max(0, y0 - my), max(0, x0 - mx)
        yh, xh = min(H, y1 + my), min(W, x1 + mx)
        sub = np.zeros((y1 - y0 + 2 * my, x1 - x0 + 2 * mx, img.shape[2]),
                       np.float32)
        sub[yl - (y0 - my):yh - (y0 - my),
            xl - (x0 - mx):xh - (x0 - mx)] = img[yl:yh, xl:xh]
        out = self._filter_image(sub, kernel)
        return out[my:my + (y1 - y0), mx:mx + (x1 - x0)]

    def warp_filter_and_paste(self, image, target, labels, T, G, src_bbox=None):
        """Warp target RGBA + labels, blur target, alpha-paste into image
        (reference lines 371-404).

        When the target's source bounding box is known, the warp is restricted
        to the axis-aligned box of its transformed corners (plus interpolation
        and blur margins) — outside that support the warped alpha and labels
        are exactly zero, so the result is identical to warping the full
        canvas at a fraction of the (single-core) host cost."""
        image = np.asarray(np.atleast_3d(image), np.float32)
        H, W = image.shape[:2]

        if src_bbox is None:
            tgt = np.clip(self._warp(target, T, "bicubic"), 0, 255)
            wlabels = self._warp(labels, T, "nearest")
            tgt = self._filter_image(tgt, G)
            alpha = tgt[..., 3:4] / 255.0
            out = tgt[..., :3] * alpha + image * (1.0 - alpha)
            return np.clip(out, 0, 255), wlabels

        tgt, (y0, y1, x0, x1), lbl = self._paste_bbox(target, labels, T, G,
                                                      src_bbox, (H, W))
        wlabels = np.zeros(labels.shape[:2] + (1,), np.float32)
        if tgt is None:  # target fully off-frame
            return image.copy(), wlabels

        alpha = tgt[..., 3:4] / 255.0
        out = image.copy()
        out[y0:y1, x0:x1] = np.clip(
            tgt[..., :3] * alpha + image[y0:y1, x0:x1] * (1.0 - alpha), 0, 255)
        wlabels[y0:y1, x0:x1] = np.atleast_3d(lbl)
        return out, wlabels

    def _paste_bbox(self, target, labels, T, G, src_bbox, im_size):
        """Warped/blurred target patch restricted to its transformed bbox.
        Returns (None, box, None) when the target lands fully off-frame, else
        (RGBA patch f32, (y0, y1, x0, x1), labels patch)."""
        H, W = im_size
        cx, cy, bw, bh = src_bbox
        margin = 3 + G.shape[0] // 2  # bicubic support + blur half-width
        corners = np.array([
            [cx - bw / 2, cy - bh / 2, 1], [cx + bw / 2, cy - bh / 2, 1],
            [cx - bw / 2, cy + bh / 2, 1], [cx + bw / 2, cy + bh / 2, 1],
        ]).T
        tc = np.asarray(T) @ corners
        tc = tc[:2] / tc[2]
        x0 = max(0, int(np.floor(tc[0].min())) - margin)
        x1 = min(W, int(np.ceil(tc[0].max())) + margin + 1)
        y0 = max(0, int(np.floor(tc[1].min())) - margin)
        y1 = min(H, int(np.ceil(tc[1].max())) + margin + 1)
        if x0 >= x1 or y0 >= y1:
            return None, (y0, y1, x0, x1), None

        Ts = _translate(-x0, -y0) @ np.asarray(T)
        sub_sz = (y1 - y0, x1 - x0)
        tgt = np.clip(self._warp_sized(target, Ts, sub_sz, "bicubic"), 0, 255)
        lbl = self._warp_sized(labels, Ts, sub_sz, "nearest")
        tgt = self._filter_image(tgt, G)
        return tgt, (y0, y1, x0, x1), lbl

    # -- verification -------------------------------------------------------

    def verify_frame(self, obj_ids, wlabels, have_no_background):
        """All objects visible with >= min_px_count pixels and background not
        fully hidden (reference lines 454-471)."""
        wlabels = np.asarray(wlabels)
        min_px = self.params["min_px_count"]
        max_px = wlabels.shape[0] * wlabels.shape[1] - min_px
        for oid in obj_ids:
            px = int((wlabels == oid).sum())
            if not (px >= min_px and (px < max_px or have_no_background)):
                return False
        return True

    # -- top level ----------------------------------------------------------

    def augment_first_frame(self, image, mask, rng: np.random.RandomState,
                            copy: bool = True, compact: bool = False):
        """Create num_aug augmented (image, label) pairs; slot 0 is the real
        frame (reference lines 473-555).

        :param image: (H, W, 3) uint8-range array
        :param mask:  (H, W, 1) binary object mask
        :param copy:  True (default) returns fresh arrays the caller owns.
                      False returns the augmenter's INTERNAL buffers, which
                      the NEXT augment_first_frame call overwrites — only
                      safe when this is the last augmentation before the
                      batch is fully consumed (the fused tracker passes it
                      for the final object to skip a multi-MB copy).
        :param compact: return a CompactAugBatch (background descriptors +
                      blended paste rectangles) instead of materialised
                      full-frame buffers — the transfer-minimised encoding
                      the device composes back (models/aug_compose.py). The
                      spec/RNG stream, accept decisions, and all patch math
                      are IDENTICAL to the dense path (the two modes share
                      this loop); only the full-frame buffer writes are
                      skipped. See CompactAugBatch for the exactness bound.
        :return: (images (K, H, W, 3) uint8 0-255, labels (K, H, W, 1)
                  uint8 0/1), or a CompactAugBatch when compact=True
        """
        p = self.params
        image = np.asarray(image)
        mask = np.asarray(mask).reshape(*image.shape[:2], 1)
        im_sz = image.shape[:2]

        px_count = int(mask.sum())
        no_background = px_count == mask.size
        if px_count < p["min_px_count"]:
            raise ValueError("Augmentation failed: Target object is too small.")
        tg_bbox = center_bbox_from_mask(mask)
        if tg_bbox[2] == 0 or tg_bbox[3] == 0:
            raise ValueError("Augmentation failed: No object to augment.")

        target, inpainted = self.cut_and_inpaint(image, mask, d=1, f=1)

        fg_sel = dict(p["fg_aug_params"])
        fg_sel["location"] = self.generate_target_locations(p["num_aug"], im_sz, rng)
        bg_sel = p.get("bg_aug_params")

        # Working batch buffers, REUSED across calls (cached per shape):
        # fresh multi-MB allocations page-fault on every call on this host,
        # and the copy-into-stack pattern was a measured hot spot. The
        # returned arrays are copies unless copy=False (see docstring) —
        # returning the live buffers to multi-object callers fed every
        # object's init from the LAST object's augmentation (round-2 bug).
        K = p["num_aug"]
        H, W = im_sz
        if not compact:
            key = (K, H, W)
            if getattr(self, "_buf_key", None) != key:
                self._buf_key = key
                self._buf_im = np.empty((K, H, W, 3), np.uint8)
                self._buf_lb = np.empty((K, H, W, 1), np.uint8)
            buf_im, buf_lb = self._buf_im, self._buf_lb
            buf_im[0] = image
            buf_lb[0] = mask

        # Background warps/blurs are fully deterministic per spec (no rng
        # inside), and the spec lists draw from small value sets — memoise
        # per spec tuple so repeated (scale, blur) combinations reuse one
        # full-frame warp+filter (f32 for compositing, uint8 for the buffer).
        # Each cache entry also carries the compact decomposition: the
        # pre-blur base index (0 = inpainted, >=1 = warp_bases) and the blur
        # kernel the device re-applies.
        bg_cache = {}
        warp_bases = []          # uint8 pre-blur warped backgrounds
        warp_bases_f32 = []      # their f32 forms (blend + host filter input)
        base_idx_of = {}         # transform bytes -> 1-based base index
        _ID_K = np.ones((1, 1), np.float32)

        inpainted3 = np.atleast_3d(inpainted)

        def bg_for(bg_spec):
            """(base index, blur kernel, f32 background or None, uint8
            background or None). A no-op spec (identity transform, no blur)
            returns the inpainted frame itself with NO full-frame
            conversions; the paste converts just its bbox slice. In COMPACT
            mode non-identity backgrounds return None fulls — the device
            composes the full frame, and the blend takes its region from
            `_filter_region` instead of a full-frame host filter (the
            full-frame bg blurs were the dominant standalone host-augment
            cost)."""
            if bg_spec is None:
                return 0, _ID_K, None, inpainted3
            bgkey = (tuple(bg_spec.location), bg_spec.rotation,
                     bg_spec.fliplr, bg_spec.scale, tuple(bg_spec.skew),
                     bg_spec.blur_size, bg_spec.blur_angle)
            hit = bg_cache.get(bgkey)
            if hit is None:
                T, G = self.get_transform(bg_spec, (W / 2, H / 2, W, H),
                                          im_sz, limit_scale=False)
                ident_T = np.allclose(T, np.eye(3), atol=1e-12)
                if ident_T and G.shape == (1, 1):
                    hit = (0, _ID_K, None, inpainted3)
                else:
                    bi = 0
                    if not ident_T:
                        tkey = T.tobytes()
                        bi = base_idx_of.get(tkey)
                        if bi is None:
                            w32 = np.clip(self._warp(inpainted, T, "bicubic"),
                                          0, 255)
                            warp_bases.append(w32.astype(np.uint8))
                            warp_bases_f32.append(w32)
                            bi = base_idx_of[tkey] = len(warp_bases)
                    if compact:
                        hit = (bi, G, None, None)
                    else:
                        base = (warp_bases_f32[bi - 1] if bi
                                else np.asarray(inpainted3, np.float32))
                        f32 = (self._filter_image(base, G)
                               if G.shape != (1, 1) else base)
                        hit = (bi, G, f32, f32.astype(np.uint8))
                bg_cache[bgkey] = hit
            return hit

        min_px = p["min_px_count"]
        max_px = H * W - min_px
        slots = []               # compact per-slot records
        N = K - 1
        n_good = 0
        retries = -1
        while n_good < N:
            retries += 1
            if retries > self.max_retries:
                raise RuntimeError(
                    "Augmentation failed: Not enough samples after %d retries."
                    % self.max_retries)
            fg_specs = self.generate_specs(fg_sel, rng)
            bg_specs = (self.generate_specs(bg_sel, rng) if bg_sel is not None
                        else [None] * len(fg_specs))
            # The reference evaluates all ~19 over-generated specs, drops the
            # bad ones, then picks a uniform random N-subset (augmenter.py
            # :516-545). Specs are exchangeable (independently shuffled
            # parameter lists), so evaluating lazily and stopping at the first
            # N good frames draws from the same distribution at ~N/19 the cost.
            for fg_spec, bg_spec in zip(fg_specs, bg_specs):
                if n_good >= N:
                    break
                base_idx, bg_kern, bg_f32, bg_u8 = bg_for(bg_spec)
                T, G = self.get_transform(fg_spec, tg_bbox, im_sz)
                tgt, (y0, y1, x0, x1), lbl = self._paste_bbox(
                    target, mask, T, G, src_bbox=tg_bbox, im_size=im_sz)

                # visibility check on the label rectangle (zero outside it,
                # so the count equals verify_frame's full-frame count,
                # reference lines 454-471)
                if tgt is not None:
                    lbl3 = np.atleast_3d(lbl).astype(np.uint8)
                    px = int((lbl3 == 1).sum())
                else:
                    lbl3, px = None, 0
                if not (px >= min_px and (px < max_px or no_background)):
                    continue
                if tgt is not None:
                    alpha = tgt[..., 3:4] / 255.0
                    if bg_u8 is None and bg_f32 is None:
                        # compact non-identity bg: region-only host filter
                        # (bit-exact; the device composes the full frame)
                        base = (warp_bases_f32[base_idx - 1] if base_idx
                                else inpainted3)
                        bg_region = self._filter_region(base, bg_kern,
                                                        y0, y1, x0, x1)
                    else:
                        bg_region = (bg_u8 if bg_f32 is None else
                                     bg_f32)[y0:y1, x0:x1].astype(
                                         np.float32, copy=False)
                    patch = np.clip(tgt[..., :3] * alpha
                                    + bg_region * (1.0 - alpha),
                                    0, 255).astype(np.uint8)
                else:  # accepted with no paste (only min_px_count == 0)
                    patch = np.zeros((1, 1, 3), np.uint8)
                    lbl3 = np.zeros((1, 1, 1), np.uint8)
                    y0 = x0 = y1 = x1 = 0

                k = n_good + 1
                if compact:
                    slots.append(dict(bg_idx=base_idx, kernel=bg_kern,
                                      patch=patch,
                                      box=(y0, x0, y1 - y0, x1 - x0),
                                      lbl=lbl3[..., 0]))
                else:
                    buf_lb[k] = 0
                    buf_lb[k, y0:y1, x0:x1] = lbl3
                    buf_im[k] = bg_u8
                    buf_im[k, y0:y1, x0:x1] = patch
                n_good += 1

        if compact:
            # the inpainted frame differs from the real frame only inside the
            # dilated target mask (cv2.inpaint writes nothing outside it), so
            # it rides as the difference rectangle
            diff = (inpainted3 != image).any(axis=-1)
            dys = np.flatnonzero(diff.any(axis=1))
            dxs = np.flatnonzero(diff.any(axis=0))
            if len(dys):
                yi, xi = int(dys[0]), int(dxs[0])
                hi, wi = int(dys[-1]) - yi + 1, int(dxs[-1]) - xi + 1
            else:
                yi = xi = hi = wi = 0
            return CompactAugBatch(
                image=image,
                mask=mask[..., 0].astype(np.uint8),
                inpaint_patch=np.ascontiguousarray(
                    inpainted3[yi:yi + hi, xi:xi + wi]),
                inpaint_box=(yi, xi, hi, wi),
                warp_bases=warp_bases,
                bg_idx=[s["bg_idx"] for s in slots],
                kernels=[s["kernel"] for s in slots],
                patches=[s["patch"] for s in slots],
                boxes=[s["box"] for s in slots],
                lbl_patches=[s["lbl"] for s in slots])

        # pasted images become bytes like the reference's .byte() cast
        # (warp_filter_and_paste, augmenter.py:402); labels are exact 0/1
        if copy:
            return buf_im.copy(), buf_lb.copy()
        return buf_im, buf_lb
