from .davis import (
    davis_jaccard_measure,
    davis_f_measure,
    seg2bmap,
    evaluate_sequence,
)
from .evaluation import evaluate_dataset

__all__ = [
    "davis_jaccard_measure", "davis_f_measure", "seg2bmap",
    "evaluate_sequence", "evaluate_dataset",
]
