"""Synthetic "moving square" sequences — the test/benchmark fixture replacing
DAVIS data in environments without datasets (SURVEY.md §4 test plan). The
sequences expose the same interface as FileSequence so the tracker and the
evaluation driver run end-to-end on them."""
import numpy as np


class SyntheticSequence:
    """In-memory sequence with the FileSequence interface
    (name, obj_ids, frame_names, start_frames, iteration -> (im, lb, new_objs))."""

    def __init__(self, name, images, labels, start_frames):
        self.name = name
        self.images = images          # list of (H, W, 3) uint8
        self.labels = labels          # list of (H, W, 1) uint8 full annotations
        self.start_frames = start_frames  # {frame_name: [obj ids]}
        all_ids = sorted({int(v) for lb in labels for v in np.unique(lb) if v != 0})
        self.obj_ids = all_ids
        self.frame_names = ["%05d" % i for i in range(len(images))]
        self.merge_objects = False

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        f = self.frame_names[i]
        new_objects = self.start_frames.get(f, [])
        lb = []
        if new_objects:
            # suppress labels of objects outside their start frame, like
            # FileSequence does (datasets.py)
            lb = self.labels[i]
            keep = set([0] + list(new_objects))
            suppress = [int(o) for o in np.unique(lb) if int(o) not in keep]
            for o in suppress:
                lb = np.where(lb == o, 0, lb).astype(lb.dtype)
        return self.images[i], lb, list(new_objects)

    def annotations(self):
        """{frame_name: (H, W, 1) label image} ground truth for evaluation."""
        return {f: lb for f, lb in zip(self.frame_names, self.labels)}


def make_moving_square_sequence(n_frames=12, size=(120, 160), square=28,
                                n_objects=1, seed=0, name="synth"):
    """Textured squares moving over a textured background; object k has label
    k+1. Deterministic for a given seed."""
    rng = np.random.RandomState(seed)
    H, W = size
    bg = (rng.rand(H, W, 3) * 80 + 40).astype(np.uint8)
    textures = [(rng.rand(square, square, 3) * 120 + 120).astype(np.uint8)
                for _ in range(n_objects)]
    pos0 = [(rng.randint(0, H - square), rng.randint(0, W - square))
            for _ in range(n_objects)]
    vel = [(rng.randint(1, 4), rng.randint(1, 4)) for _ in range(n_objects)]

    images, labels = [], []
    for t in range(n_frames):
        im = bg.copy()
        lb = np.zeros((H, W, 1), np.uint8)
        for k in range(n_objects):
            r = int(np.clip(pos0[k][0] + vel[k][0] * t, 0, H - square))
            c = int(np.clip(pos0[k][1] + vel[k][1] * t, 0, W - square))
            im[r:r + square, c:c + square] = textures[k]
            lb[r:r + square, c:c + square, 0] = k + 1
        images.append(im)
        labels.append(lb)

    start_frames = {"00000": list(range(1, n_objects + 1))}
    return SyntheticSequence(name, images, labels, start_frames)
