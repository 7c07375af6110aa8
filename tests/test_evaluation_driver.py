"""End-to-end evaluation driver test: tracker-style PNG outputs scored with
the J/F driver against synthetic ground truth, exercising report files and
the start-frame/exclusion bookkeeping (reference lib/evaluation.py flow)."""
import numpy as np
import pytest

from frtm_tpu.data.image import imwrite_indexed
from frtm_tpu.data.synthetic import make_moving_square_sequence
from frtm_tpu.eval.evaluation import evaluate_dataset


class _SyntheticEvalDataset:
    """Minimal dataset wrapper exposing the evaluation driver's interface."""

    def __init__(self, seqs, anno_root):
        self._seqs = []
        for seq in seqs:
            d = anno_root / seq.name
            d.mkdir(parents=True, exist_ok=True)
            files = []
            for f, lb in zip(seq.frame_names, seq.labels):
                p = d / (f + ".png")
                imwrite_indexed(p, lb)
                files.append(p)
            seq.annos = files
            self._seqs.append(seq)
        self.name = "synthval"

    def __len__(self):
        return len(self._seqs)

    def __getitem__(self, i):
        return self._seqs[i]


def test_evaluate_dataset_perfect_and_shifted(tmp_path):
    seqs = [make_moving_square_sequence(n_frames=6, size=(48, 64), square=16,
                                        seed=s, name=f"seq{s}") for s in range(2)]
    anno_root = tmp_path / "annos"
    dset = _SyntheticEvalDataset(seqs, anno_root)

    # perfect predictions -> J = 1
    res_root = tmp_path / "results_perfect"
    for seq in seqs:
        d = res_root / seq.name
        d.mkdir(parents=True)
        for f, lb in zip(seq.frame_names, seq.labels):
            imwrite_indexed(d / (f + ".png"), lb)
    j = evaluate_dataset(dset, res_root, measure="J")
    assert j == pytest.approx(1.0)
    f = evaluate_dataset(dset, res_root, measure="F")
    assert f == pytest.approx(1.0)
    assert (res_root / "evaluation-J.txt").exists()
    report = (res_root / "evaluation-J.txt").read_text()
    assert "J: 1.000" in report

    # shifted predictions -> J strictly below 1 but above 0.5 (small shift)
    res2 = tmp_path / "results_shifted"
    for seq in seqs:
        d = res2 / seq.name
        d.mkdir(parents=True)
        for f, lb in zip(seq.frame_names, seq.labels):
            imwrite_indexed(d / (f + ".png"), np.roll(lb, 2, axis=1))
    j2 = evaluate_dataset(dset, res2, measure="J", to_file=False)
    assert 0.5 < j2 < 1.0
