from .resize import (
    resize,
    resize_bilinear,
    resize_bicubic,
    interpolate,
    adaptive_cat,
)
from .conv import conv2d, conv2d_t, max_pool_3x3_s2, batch_norm, leaky_relu
from .warp import warp_affine

__all__ = [
    "resize", "resize_bilinear", "resize_bicubic", "interpolate", "adaptive_cat",
    "conv2d", "conv2d_t", "max_pool_3x3_s2", "batch_norm", "leaky_relu",
    "warp_affine",
]
