"""File-backed training dataset: occlusion cache, epoch sampling constraints,
and item loading against a miniature DAVIS-layout tree (no real data)."""
import numpy as np
from PIL import Image

from frtm_tpu.data.image import imwrite_indexed
from frtm_tpu.data.synthetic import make_moving_square_sequence
from frtm_tpu.data.training_datasets import (
    DAVISTrainingDataset, SampleSpec, davis_occlusion_rule,
)


def _make_fake_davis_train(root, seqs, year="2017"):
    (root / "ImageSets" / year).mkdir(parents=True)
    with open(root / "ImageSets" / year / "train.txt", "w") as f:
        for seq in seqs:
            print(seq.name, file=f)
    for seq in seqs:
        jd = root / "JPEGImages" / "480p" / seq.name
        ad = root / "Annotations" / "480p" / seq.name
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for name, im, lb in zip(seq.frame_names, seq.images, seq.labels):
            Image.fromarray(im).save(jd / f"{name}.jpg", quality=95)
            imwrite_indexed(ad / f"{name}.png", lb)


def test_davis_training_dataset_end_to_end(tmp_path):
    np.random.seed(0)
    seqs = [make_moving_square_sequence(n_frames=6, size=(96, 128), square=24,
                                        n_objects=n, seed=s, name=f"seq{s}")
            for s, n in [(0, 1), (1, 2)]]
    davis = tmp_path / "DAVIS"
    _make_fake_davis_train(davis, seqs)

    dset = DAVISTrainingDataset(davis, epoch_repeats=2)
    # 1 + 2 objects, x2 repeats
    assert len(dset) == 6
    assert (davis / "davis_meta.npz").exists()

    for images, labels, enc in (dset[i] for i in range(len(dset))):
        spec = SampleSpec.from_encoded([enc])[0]
        assert spec.frames[0] == spec.frame0_id
        assert len(set(spec.frames)) == len(spec.frames) == 3
        assert all(0 <= f < 6 for f in spec.frames)
        # frame0 must be a frame where the object is visible
        vis = dset.table.visible_frames(spec.seq_name, spec.obj_id)
        assert spec.frame0_id in vis
        for im, lb in zip(images, labels):
            assert im.shape == (480, 854, 3) and im.dtype == np.uint8
            assert lb.shape == (480, 854, 1)
            assert set(np.unique(lb)) <= {0, 1}
        # the chosen object is relabeled to 1 and actually present in frame0
        assert labels[0].sum() > 0

    # second construction reuses the cache (no rescan) and yields fresh specs
    dset2 = DAVISTrainingDataset(davis, epoch_repeats=2)
    assert len(dset2) == 6


def test_davis_occlusion_rule_tables():
    """The hand-tuned rule data: never-occluded list wins, per-sequence
    thresholds apply, hard 100px minimum always applies."""
    px = np.array([[5000.0, 500.0], [5000.0, 50.0], [5000.0, 20.0]])
    mx = px.max(axis=0)

    occ = davis_occlusion_rule("bus", px, mx)          # never occluded...
    assert not occ[:, 1][0]
    assert occ[1, 1] and occ[2, 1]                     # ...except <100px hard rule

    occ = davis_occlusion_rule("some-seq", px, mx)     # default threshold 0.25
    # 50/500.001 = 0.0999 < 0.25 -> occluded; 500/500.001 -> visible
    assert not occ[0, 1] and occ[1, 1]

    occ = davis_occlusion_rule("drone", px, mx)        # thr 0.1 + overrides
    # rows 0..16 of column 1 forced visible... but <100px floor still applies
    assert occ[1, 1] and occ[2, 1]

    occ = davis_occlusion_rule("night-race", np.tile([[5000.0, 500.0, 120.0]], (40, 1)),
                               np.array([5000.0, 500.0, 120.0]))
    assert not occ[:, 2].any()                         # green car forced visible
