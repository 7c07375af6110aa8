"""Device-side composition of compact augment batches (round 5).

The dense first-frame augment batch costs ~4.9 MB/object of uint8 frames to
upload through the 13-50 MB/s remote-TPU tunnel INSIDE the fps clock, and
every one of those frames is redundant: a memoized background plus a
bbox-sized blended target paste (models/augmenter.py; reference pipeline
/root/reference/model/augmenter.py:371-404). The augmenter's compact mode
(`augment_first_frame(..., compact=True)`) ships the pieces instead —
an inpaint rectangle, at most one pre-blur warped background, per-slot blur
kernels and blended paste rectangles — and this module rebuilds the dense
(K, H, W, 3)/(K, H, W, 1) batch ON DEVICE inside the init program, where it
feeds feature extraction directly and is never materialised to host.

A paste is elementwise VPU work and the blur is a tiny conv — unlike the
measured-and-rejected device WARPS (CLAUDE.md round-3/4 anti-lessons), there
is no gather in sight. Exactness vs the dense host path is documented on
CompactAugBatch (augmenter.py): bit-exact except for non-identity
backgrounds outside the paste rectangle, which differ by at most 1 uint8
count (conv summation order; pre-blur uint8 quantization of warped bases) —
gated by tests/test_aug_compose.py.

All shapes are static: patch rectangles are zero-padded to bucket sizes on
host (pack_compact_batch) and the valid (h, w) region is selected with an
iota mask inside a canvas-padded dynamic_update_slice, so variable paste
positions and sizes never create dynamic shapes.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.conv import conv2d

# patch rectangles pad up to multiples of this, bounding the number of
# distinct compiled init programs across sequences (a fresh trace is a ~90 s
# remote compile on the tunnel)
PATCH_BUCKET = 64


def _bucket(n):
    return max(PATCH_BUCKET, -(-int(n) // PATCH_BUCKET) * PATCH_BUCKET)


def masked_paste(img, patch, box):
    """Write patch's valid (h, w) rectangle into img at (y, x); the padded
    remainder of the patch leaves img untouched. Works for any in-bounds
    rectangle: the canvas is padded by the full patch shape so the
    dynamic_update_slice never clamps (clamping would SHIFT the paste), then
    cropped back.

    :param img:   (H, W, C)
    :param patch: (PH, PW, C), zero-padded beyond (h, w)
    :param box:   (4,) int32 (y, x, h, w)
    """
    PH, PW = patch.shape[:2]
    H, W = img.shape[:2]
    y, x, h, w = box[0], box[1], box[2], box[3]
    imgp = jnp.pad(img, ((0, PH), (0, PW), (0, 0)))
    region = lax.dynamic_slice(imgp, (y, x, 0), (PH, PW, img.shape[2]))
    valid = (jnp.arange(PH)[:, None] < h) & (jnp.arange(PW)[None, :] < w)
    val = jnp.where(valid[..., None], patch.astype(img.dtype), region)
    imgp = lax.dynamic_update_slice(imgp, val, (y, x, 0))
    return imgp[:H, :W]


def _filter_planes(img_f32, kernel):
    """Per-channel 2-D correlation with zero padding — the same formulation
    as the host augmenter's XLA backend (_filter_image): channels ride as
    the batch axis of a (fh, fw, 1, 1) conv. Kernels are symmetric rotated
    Gaussians, so correlation == convolution; a centered delta kernel is the
    identity on integer-valued inputs (exact)."""
    x = jnp.moveaxis(img_f32, -1, 0)[..., None]          # (C, H, W, 1)
    y = conv2d(x, kernel[..., None, None])
    return jnp.moveaxis(y[..., 0], 0, -1)                 # (H, W, C)


def unpack_bits(packed, width):
    """np.packbits inverse along the last axis (MSB-first), trimmed to
    `width` — the same shift-and-mask the tracker's init program uses."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], -1)[..., :width]


def compose_aug_batch(frame0, c):
    """Rebuild one object's dense augment batch from its packed compact
    encoding. `frame0` is the device-resident real frame (slot 0);
    `c` is a dict from pack_compact_batch. Returns
    (images (K, H, W, 3) uint8, labels (K, H, W, 1) uint8)."""
    H, W = frame0.shape[:2]
    ip = masked_paste(frame0, c["inpaint_patch"], c["inpaint_box"])
    bases = jnp.concatenate([ip[None], c["warp_bases"]])  # (NB+1, H, W, 3)

    def one_slot(idx, kern, patch, box):
        # warped bases (idx >= 1) were truncation-quantized to uint8 on host
        # (that trunc IS the dense value for their no-blur slots, so it must
        # stay); for BLURRED slots the +0.5 recenters the quantization error
        # to zero mean before the blur averages it — measured: flip rate vs
        # the host f32 blur drops ~4x, and the bound stays <=1 count. Exact
        # cases are unharmed: integer base + 0.5 truncates back to the base
        # under a delta kernel, and the inpainted base (idx 0) is exact
        # integers so it gets no offset.
        off = jnp.where(idx > 0, jnp.float32(0.5), jnp.float32(0.0))
        bg = _filter_planes(bases[idx].astype(jnp.float32) + off, kern)
        return masked_paste(bg.astype(jnp.uint8), patch, box)

    rest = jax.vmap(one_slot)(c["bg_idx"], c["kernels"],
                              c["patches"], c["boxes"])
    images = jnp.concatenate([frame0[None], rest])

    lbl0 = unpack_bits(c["mask_packed"], W)               # (H, W) uint8
    zeros = jnp.zeros((H, W, 1), jnp.uint8)
    lbl_patches = unpack_bits(c["lbl_patches"],
                              c["lbl_patches"].shape[-1] * 8)[..., None]
    lbl_rest = jax.vmap(lambda p, b: masked_paste(zeros, p, b))(
        lbl_patches, c["boxes"])
    labels = jnp.concatenate([lbl0[None, ..., None], lbl_rest])
    return images, labels


def pack_compact_batch(compact, n_bases=None, kernel_size=None,
                       patch_bucket=None):
    """Host-side packing of a CompactAugBatch into fixed-shape device
    arrays, starting their async uploads (device_put). Padding knobs let
    multi-object callers force a COMMON signature across objects so the
    jitted init program stacks them without per-object recompiles:

    :param n_bases:     pad warp_bases to this count (zeros rows — never
                        selected, and identical zero uploads dedup on the
                        tunnel at ~1.3 GB/s, CLAUDE.md)
    :param kernel_size: pad blur kernels to this odd size (centered
                        zero-embedding is exact: zero taps contribute
                        nothing and the zero border padding grows with it)
    :param patch_bucket: (ph, pw) to pad every paste rectangle to
    :return: dict of device arrays for compose_aug_batch
    """
    K1 = len(compact.patches)
    ks = max([k.shape[0] for k in compact.kernels] + [1])
    if kernel_size is not None:
        assert kernel_size >= ks and kernel_size % 2 == 1
        ks = kernel_size
    kerns = np.zeros((K1, ks, ks), np.float32)
    for i, k in enumerate(compact.kernels):
        o = (ks - k.shape[0]) // 2
        kerns[i, o:o + k.shape[0], o:o + k.shape[1]] = k

    ph = _bucket(max(p.shape[0] for p in compact.patches))
    pw = _bucket(max(p.shape[1] for p in compact.patches))
    if patch_bucket is not None:
        assert patch_bucket[0] >= ph and patch_bucket[1] >= pw
        ph, pw = patch_bucket
    patches = np.zeros((K1, ph, pw, 3), np.uint8)
    lbls = np.zeros((K1, ph, pw), np.uint8)
    for i, (p, l) in enumerate(zip(compact.patches, compact.lbl_patches)):
        patches[i, :p.shape[0], :p.shape[1]] = p
        lbls[i, :l.shape[0], :l.shape[1]] = l

    H, W = compact.image.shape[:2]
    phi = _bucket(max(compact.inpaint_box[2], 1))
    pwi = _bucket(max(compact.inpaint_box[3], 1))
    ipp = np.zeros((phi, pwi, 3), np.uint8)
    yi, xi, hh, ww = compact.inpaint_box
    ipp[:hh, :ww] = compact.inpaint_patch

    nb = len(compact.warp_bases)
    if n_bases is not None:
        assert n_bases >= nb
        nb = n_bases
    bases = np.zeros((nb, H, W, 3), np.uint8)
    for i, b in enumerate(compact.warp_bases):
        bases[i] = b

    return {
        "mask_packed": jnp.asarray(np.packbits(compact.mask, axis=-1)),
        "inpaint_patch": jnp.asarray(ipp),
        "inpaint_box": jnp.asarray([yi, xi, hh, ww], jnp.int32),
        "warp_bases": jnp.asarray(bases),
        "bg_idx": jnp.asarray(compact.bg_idx, jnp.int32),
        "kernels": jnp.asarray(kerns),
        "patches": jnp.asarray(patches),
        "boxes": jnp.asarray(compact.boxes, jnp.int32),
        "lbl_patches": jnp.asarray(np.packbits(lbls, axis=-1)),
    }
