"""DAVIS evaluation measures: region similarity J (Jaccard) and boundary
accuracy F, with the challenge toolkit's statistics (mean/recall/decay/std).

Capability parity with /root/reference/lib/davis.py (itself adapted from
Federico Perazzi's DAVIS toolkit): per-object scoring over frames with the
object's first frame and the sequence's last frame excluded, the boundary map
construction with half-pixel offset, and dilation-based boundary matching
with radius ceil(0.008 * image diagonal). skimage is not a dependency here:
the disk structuring element is built directly and dilation runs through
scipy.ndimage, which matches skimage.morphology.binary_dilation exactly."""
import warnings
from collections import OrderedDict
from math import floor

import numpy as np
from scipy import ndimage


def evaluate_sequence(segmentations, annotations, object_info, measure="J"):
    """Evaluate one sequence.

    :param segmentations: {frame_name: (H, W[,1]) predicted label image}
    :param annotations:   {frame_name: (H, W[,1]) ground-truth label image}
    :param object_info:   {object_id: first_frame_name}
    :param measure:       'J' | 'F'
    :return: dict(raw={obj: per-frame scores}, mean/recall/decay/std=[per obj])
    """
    results = dict(raw=OrderedDict())
    measures = {"J": davis_jaccard_measure, "F": davis_f_measure}
    stats = {"decay": decay, "mean": mean, "recall": recall, "std": std}

    frame_names = list(annotations.keys())
    for obj_id, first_frame in object_info.items():
        first_idx = frame_names.index(first_frame)
        r = np.full(len(frame_names), np.nan)
        for i, f in enumerate(frame_names):
            if first_idx < i < len(frame_names) - 1:
                an = np.asarray(annotations[f]).squeeze() == obj_id
                sg = np.asarray(segmentations[f]).squeeze() == obj_id
                r[i] = measures[measure](sg, an)
        results["raw"][obj_id] = r

    for stat, fn in stats.items():
        results[stat] = [float(fn(r)) for r in results["raw"].values()]
    return results


def davis_jaccard_measure(fg_mask, gt_mask):
    """Region similarity: intersection over union of binary masks."""
    gt_mask = np.asarray(gt_mask, bool)
    fg_mask = np.asarray(fg_mask, bool)
    if np.isclose(gt_mask.sum(), 0) and np.isclose(fg_mask.sum(), 0):
        return 1.0
    return np.sum(gt_mask & fg_mask) / np.sum(gt_mask | fg_mask, dtype=np.float32)


def _disk(radius):
    """Circular structuring element matching skimage.morphology.disk."""
    r = int(radius)
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    return (x ** 2 + y ** 2) <= r ** 2


def davis_f_measure(foreground_mask, gt_mask, bound_th=0.008):
    """Boundary F-measure via morphological boundary matching."""
    foreground_mask = np.asarray(foreground_mask).squeeze()
    gt_mask = np.asarray(gt_mask).squeeze()
    bound_pix = bound_th if bound_th >= 1 else \
        np.ceil(bound_th * np.linalg.norm(foreground_mask.shape))

    fg_boundary = seg2bmap(foreground_mask)
    gt_boundary = seg2bmap(gt_mask)

    selem = _disk(bound_pix)
    fg_dil = ndimage.binary_dilation(fg_boundary, selem)
    gt_dil = ndimage.binary_dilation(gt_boundary, selem)

    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil
    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()

    if n_fg == 0 and n_gt > 0:
        precision, recall_ = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall_ = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall_ = 1.0, 1.0
    else:
        precision = fg_match.sum() / float(n_fg)
        recall_ = gt_match.sum() / float(n_gt)

    if precision + recall_ == 0:
        return 0.0
    return 2 * precision * recall_ / (precision + recall_)


def seg2bmap(seg, width=None, height=None):
    """Binary boundary map with 1-pixel-wide boundaries offset half a pixel
    toward the origin (David Martin's convention, as used by the toolkit)."""
    seg = np.asarray(seg, bool)
    assert np.atleast_3d(seg).shape[2] == 1

    width = seg.shape[1] if width is None else width
    height = seg.shape[0] if height is None else height
    h, w = seg.shape[:2]

    ar1 = float(width) / float(height)
    ar2 = float(w) / float(h)
    assert not (width > w | height > h | abs(ar1 - ar2) > 0.01), \
        "Cannot convert %dx%d seg to %dx%d bmap." % (w, h, width, height)

    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]

    b = seg ^ e | seg ^ s | seg ^ se
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False

    if w == width and h == height:
        return b
    bmap = np.zeros((height, width), bool)
    for x in range(w):
        for y in range(h):
            if b[y, x]:
                j = 1 + floor((y - 1) + height / h)
                i = 1 + floor((x - 1) + width / h)
                bmap[j, i] = True
    return bmap


def nanmean(*args, **kwargs):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        return np.nanmean(*args, **kwargs)


def mean(X):
    return nanmean(X)


def recall(X, threshold=0.5):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        x = np.asarray(X)
        x = x[~np.isnan(x)]
        return nanmean(x > threshold)


def decay(X, n_bins=4):
    """Performance drop from the first to the last quarter of the sequence."""
    X = np.asarray(X)
    X = X[~np.isnan(X)]
    ids = np.round(np.linspace(1, len(X), n_bins + 1) + 1e-10) - 1
    ids = ids.astype(np.uint8)
    bins = [X[ids[i]:ids[i + 1] + 1] for i in range(n_bins)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        return nanmean(bins[0]) - nanmean(bins[3])


def std(X):
    return np.nanstd(X)
