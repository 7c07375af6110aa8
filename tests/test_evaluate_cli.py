"""Full evaluate.py CLI drive: fabricated reference-format .pth checkpoint +
a miniature DAVIS-layout dataset built from synthetic sequences, through the
fused engine, PNG outputs, and J/F report generation — the complete user
path without real data."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import torch
from PIL import Image

from frtm_tpu.data.image import imwrite_indexed
from frtm_tpu.data.synthetic import make_moving_square_sequence

REPO = Path(__file__).resolve().parents[1]


def _make_fake_davis(root, seqs, year="2017"):
    (root / "ImageSets" / year).mkdir(parents=True)
    with open(root / "ImageSets" / year / "val.txt", "w") as f:
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


@pytest.mark.slow
@pytest.mark.parametrize("engine", ["fused", "host", "sharded",
                                    "fused-spatial"])
def test_evaluate_cli_end_to_end(tmp_path, engine):
    """'fused-spatial' drives the fused engine with --spatial 4 --pipeline:
    the spatially-sharded scan (frame height over a 4-device 'spatial' mesh)
    plus the prefetching dataset runner, through the real CLI."""
    from tests.test_checkpoint_conversion import _refiner_sd
    rng = np.random.RandomState(0)

    seqs = [make_moving_square_sequence(n_frames=5, size=(96, 128), square=24,
                                        seed=s, name=f"seq{s}") for s in range(2)]
    davis = tmp_path / "DAVIS"
    _make_fake_davis(davis, seqs)

    ckpt = tmp_path / "rn18_fake.pth"
    torch.save({"model": _refiner_sd(rng, 256)}, ckpt)

    extra = []
    if engine == "fused-spatial":
        engine = "fused"
        extra = ["--spatial", "4", "--pipeline"]

    out = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, str(REPO / "evaluate.py"), "--model", str(ckpt),
         "--dset", "dv2017val", "--dev", "cpu", "--fast", "--dtype", "float32",
         "--davis", str(davis), "--output", str(out), "--engine", engine]
        + extra,
        capture_output=True, text=True, cwd=REPO, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Computing J-scores" in r.stdout

    res_dir = out / "dv2017val-rn18_fake_fast"
    for seq in seqs:
        pngs = sorted((res_dir / seq.name).glob("*.png"))
        assert len(pngs) == 5
        # frame 0 must echo the ground-truth start labels exactly
        got0 = np.array(Image.open(pngs[0]))
        np.testing.assert_array_equal(got0, seqs_label(seq, 0))
    assert (res_dir / "evaluation-J.txt").exists()
    assert (res_dir / "evaluation-F.txt").exists()


def seqs_label(seq, t):
    return seq.labels[t].squeeze()
