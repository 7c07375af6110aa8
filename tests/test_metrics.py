"""J/F measure tests against closed-form cases and exclusion-rule checks."""
import numpy as np

from frtm_tpu.eval.davis import (
    davis_jaccard_measure, davis_f_measure, seg2bmap, evaluate_sequence, _disk,
)


def test_jaccard_basic():
    a = np.zeros((10, 10), bool)
    b = np.zeros((10, 10), bool)
    a[:5] = True
    b[:5] = True
    assert davis_jaccard_measure(a, b) == 1.0
    b[:] = False
    b[:10] = True
    assert abs(davis_jaccard_measure(a, b) - 0.5) < 1e-6
    assert davis_jaccard_measure(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    assert davis_jaccard_measure(a, np.zeros((10, 10))) == 0.0


def test_disk_matches_skimage_definition():
    d1 = _disk(1)
    want = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    np.testing.assert_array_equal(d1, want)
    d2 = _disk(2)
    assert d2.shape == (5, 5)
    assert d2[2, 0] and d2[0, 2] and not d2[0, 0]


def test_seg2bmap_square():
    seg = np.zeros((8, 8), bool)
    seg[2:6, 2:6] = True
    b = seg2bmap(seg)
    # boundary is one pixel wide, offset half toward origin: rows/cols 1..5 edges
    assert b.sum() > 0
    assert not b[0].any() and not b[:, 0].any()
    # interior pixel not boundary
    assert not b[4, 4]


def test_f_measure_perfect_and_disjoint():
    seg = np.zeros((32, 32), bool)
    seg[8:24, 8:24] = True
    assert davis_f_measure(seg, seg) == 1.0
    other = np.zeros((32, 32), bool)
    other[0:2, 0:2] = True
    assert davis_f_measure(seg, other) == 0.0


def test_f_measure_tolerates_small_shift():
    seg = np.zeros((64, 64), bool)
    seg[16:48, 16:48] = True
    shifted = np.roll(seg, 1, axis=0)
    # 1-px shift is far inside the dilation radius (ceil(0.008*sqrt(2)*64)=1)
    assert davis_f_measure(shifted, seg) == 1.0


def test_decay_long_sequence_no_overflow():
    """The toolkit cast bin indices to uint8, overflowing past 255 scored
    frames (YouTubeVOS all_frames sequences can exceed that). We index int64:
    decay of a linear ramp is the first-quarter mean minus the last-quarter
    mean regardless of length."""
    from frtm_tpu.eval.davis import decay
    for n in (40, 300, 1000):
        x = np.linspace(1.0, 0.0, n)
        d = decay(x)
        # first-bin mean ~0.875+, last-bin mean ~0.125-: drop ≈ 0.75
        assert 0.7 < d < 0.8, (n, d)
    # short sequences keep toolkit behavior exactly:
    # bins [1.0, 0.8] vs [0.6, 0.4] -> 0.9 - 0.5
    np.testing.assert_allclose(decay(np.array([1.0, 0.8, 0.6, 0.4])), 0.4)


def test_evaluate_sequence_exclusion_rules():
    frames = ["%05d" % i for i in range(5)]
    gt = {f: np.full((8, 8), 1, np.uint8) for f in frames}
    pred = {f: np.full((8, 8), 1, np.uint8) for f in frames}
    r = evaluate_sequence(pred, gt, {1: "00000"}, measure="J")
    raw = r["raw"][1]
    # first frame (start) and last frame are NaN; middle frames scored
    assert np.isnan(raw[0]) and np.isnan(raw[-1])
    np.testing.assert_allclose(raw[1:-1], 1.0)
    assert r["mean"] == [1.0]

    # object starting mid-sequence: frames up to its start are excluded
    r2 = evaluate_sequence(pred, gt, {1: "00002"}, measure="J")
    raw2 = r2["raw"][1]
    assert np.isnan(raw2[:3]).all() and raw2[3] == 1.0 and np.isnan(raw2[4])
