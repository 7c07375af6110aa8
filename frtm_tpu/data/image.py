"""Image IO: reading frames/annotations and writing palettized label PNGs
(capability of /root/reference/lib/image.py — the DAVIS 22-color palette and
indexed-PNG output the DAVIS tooling expects). HWC numpy layout throughout;
the device layer consumes these as NHWC batches.

Decoding/encoding goes through the native C++ library
(native/frtm_native.cpp: libjpeg/libpng with a thread-pool batch decoder)
when built, with PIL as the fallback."""
from pathlib import Path

import numpy as np
from PIL import Image

from ..utils import native

# 256-entry palette; first 22 are the DAVIS colors, the rest grayscale ramp.
davis_palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
davis_palette[:22] = [
    [0, 0, 0], [128, 0, 0], [0, 128, 0], [128, 128, 0],
    [0, 0, 128], [128, 0, 128], [0, 128, 128], [128, 128, 128],
    [64, 0, 0], [191, 0, 0], [64, 128, 0], [191, 128, 0],
    [64, 0, 128], [191, 0, 128], [64, 128, 128], [191, 128, 128],
    [0, 64, 0], [128, 64, 0], [0, 191, 0], [128, 191, 0],
    [0, 64, 128], [128, 64, 128],
]


def imread(filename) -> np.ndarray:
    """Read an image to (H, W, C) uint8 (C=1 for palettized/gray label PNGs)."""
    suffix = Path(filename).suffix.lower()
    if native.available():
        try:
            if suffix in (".jpg", ".jpeg"):
                return native.decode_jpeg_file(filename)
            if suffix == ".png":
                return native.read_png_index(filename)[..., None]
        except RuntimeError:
            pass  # non-palettized PNG / odd jpeg: fall through to PIL
    im = np.array(Image.open(filename))
    return np.atleast_3d(im)


def imread_batch(filenames, n_threads: int = 8):
    """Decode many same-size JPEG frames in parallel (native thread pool;
    replaces the reference's DataLoader worker processes for frame loading)."""
    filenames = list(filenames)
    if native.available() and filenames and str(filenames[0]).lower().endswith((".jpg", ".jpeg")):
        try:
            first = native.decode_jpeg_file(filenames[0])
            h, w = first.shape[:2]
            return native.batch_decode_jpeg_files(filenames, h, w, n_threads)
        except RuntimeError:
            pass
    return np.stack([imread(f) for f in filenames])


def imwrite(filename, im):
    Image.fromarray(np.asarray(im).squeeze()).save(filename)


def imwrite_indexed(filename, labels, color_palette=None):
    """Write a (H, W[, 1]) label image as an indexed-color PNG."""
    palette = davis_palette if color_palette is None else color_palette
    if native.available():
        try:
            native.write_png_indexed(filename, labels, palette)
            return
        except RuntimeError:
            pass
    img = Image.fromarray(np.asarray(labels, np.uint8).squeeze(), "P")
    img.putpalette(palette.ravel())
    img.save(filename)
