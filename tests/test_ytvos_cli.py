"""Full evaluate_ytvos_valid_all_frames.py CLI drive: a fabricated
YouTubeVOS-2018 valid/valid_all_frames layout (meta.json with per-object
start frames, annotations only at entry frames, all-frames JPEG dump) built
from synthetic sequences plus a reference-format .pth checkpoint, through
the deferred-merge fused engine to indexed PNG outputs — the complete
legacy-benchmark user path without real data (reference CLI:
/root/reference/evaluate_ytvos_valid_all_frames.py)."""
import json
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


def _make_fake_ytvos(root, seqs, starts):
    """starts: {seq_name: {obj_id: frame_name}}. Base split carries
    Annotations + meta.json; the all-frames JPEG dump carries the images
    (the layout _ytvos_layout resolves for valid_all_frames)."""
    base = root / "valid"
    allf = root / "valid_all_frames"
    meta = {"videos": {}}
    for seq in seqs:
        jd = allf / "JPEGImages" / seq.name
        ad = base / "Annotations" / seq.name
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        for name, im in zip(seq.frame_names, seq.images):
            Image.fromarray(im).save(jd / f"{name}.jpg", quality=95)
        st = starts[seq.name]
        meta["videos"][seq.name] = {
            "objects": {str(o): {"frames": [f]} for o, f in st.items()}}
        for t, name in enumerate(seq.frame_names):
            if any(f == name for f in st.values()):
                imwrite_indexed(ad / f"{name}.png", seq.labels[t])
    base.mkdir(exist_ok=True)
    (base / "meta.json").write_text(json.dumps(meta))


@pytest.mark.slow
def test_ytvos_valid_all_frames_cli_end_to_end(tmp_path):
    from tests.test_checkpoint_conversion import _refiner_sd
    rng = np.random.RandomState(0)

    # seq0: object 2 enters mid-sequence (YTVOS's defining trait) — this also
    # drives the general per-frame scan program through the CLI; seq1: single
    # object from frame 0
    seqs = [
        make_moving_square_sequence(n_frames=6, size=(96, 128), square=22,
                                    n_objects=2, seed=3, name="seqA"),
        make_moving_square_sequence(n_frames=6, size=(96, 128), square=24,
                                    seed=5, name="seqB"),
    ]
    starts = {"seqA": {1: "00000", 2: "00002"}, "seqB": {1: "00000"}}
    root = tmp_path / "ytvos2018"
    _make_fake_ytvos(root, seqs, starts)

    ckpt = tmp_path / "rn18_fake.pth"
    torch.save({"model": _refiner_sd(rng, 256)}, ckpt)

    out = tmp_path / "results"
    r = subprocess.run(
        [sys.executable, str(REPO / "evaluate_ytvos_valid_all_frames.py"),
         "--model", str(ckpt), "--yt2018", str(root), "--output", str(out),
         "--dev", "cpu", "--dtype", "float32"],
        capture_output=True, text=True, cwd=REPO, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]

    res = out / "ytvos2018valid_all_frames" / "Annotations"
    for seq in seqs:
        pngs = sorted((res / seq.name).glob("*.png"))
        assert len(pngs) == 6, (seq.name, pngs)

    # deferred merge inserts ground truth at start frames: frame 0 of seqB is
    # exactly its start labels; frame 0 of seqA carries object 1's GT with
    # the not-yet-entered object 2 suppressed to background
    gotB0 = np.array(Image.open(res / "seqB" / "00000.png"))
    np.testing.assert_array_equal(gotB0, seqs[1].labels[0].squeeze())
    gotA0 = np.array(Image.open(res / "seqA" / "00000.png"))
    wantA0 = seqs[0].labels[0].squeeze().copy()
    wantA0[wantA0 == 2] = 0
    np.testing.assert_array_equal(gotA0, wantA0)
    # object 2's GT row is present in the merge at its entry frame
    gotA2 = np.array(Image.open(res / "seqA" / "00002.png"))
    lbl2 = seqs[0].labels[2].squeeze()
    overlap = (gotA2 == 2) & (lbl2 == 2)
    assert overlap.sum() >= 0.9 * (lbl2 == 2).sum()
