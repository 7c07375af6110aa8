"""Image IO: reading frames/annotations and writing palettized label PNGs
(capability of /root/reference/lib/image.py — the DAVIS 22-color palette and
indexed-PNG output the DAVIS tooling expects). HWC numpy layout throughout;
the device layer consumes these as NHWC batches."""
import numpy as np
from PIL import Image

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
    im = np.array(Image.open(filename))
    return np.atleast_3d(im)


def imwrite(filename, im):
    Image.fromarray(np.asarray(im).squeeze()).save(filename)


def imwrite_indexed(filename, labels, color_palette=None):
    """Write a (H, W[, 1]) label image as an indexed-color PNG."""
    palette = davis_palette if color_palette is None else color_palette
    img = Image.fromarray(np.asarray(labels, np.uint8).squeeze(), "P")
    img.putpalette(palette.ravel())
    img.save(filename)
