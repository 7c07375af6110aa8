from .image import imread, imwrite, imwrite_indexed, davis_palette
from .datasets import FileSequence, DAVISDataset, YouTubeVOSDataset
from .synthetic import SyntheticSequence, make_moving_square_sequence

__all__ = [
    "imread", "imwrite", "imwrite_indexed", "davis_palette",
    "FileSequence", "DAVISDataset", "YouTubeVOSDataset",
    "SyntheticSequence", "make_moving_square_sequence",
]
