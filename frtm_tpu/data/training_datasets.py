"""Training datasets: random (first frame + 2 train frames) samples from DAVIS
2017 train / YouTubeVOS 2018 jjtrain, constrained to frames where the object
is visible.

Capability parity with /root/reference/lib/training_datasets.py: SampleSpec
(JSON-encodable sample descriptors), the occlusion-metadata cache computed
from per-frame label pixel counts (with DAVIS's hand-tuned per-sequence
thresholds/overrides and YouTubeVOS's <100px rule), epoch resampling
(DAVIS: every object x repeats; YTVOS: N random (seq, obj) picks), 480x854
resizing with cv2 INTER_AREA/CUBIC and nearest labels, and binary relabeling
of the chosen object to id 1. The reference's quirk of drawing `size` frames
and discarding the first (lib/training_datasets.py:122-130) is preserved so
frame statistics match.

The cache is stored as .npz next to the dataset root (not torch .pth).
A SyntheticTrainingDataset provides data-free training for tests/benchmarks.
"""
import json
import random
from collections import OrderedDict
from pathlib import Path

import numpy as np
import cv2
from PIL import Image


class SampleSpec:
    """One training sample: sequence, object, [frame0, frame1, frame2]."""

    def __init__(self, seq_name=None, obj_id=None, frames=None, frame0_id=None):
        self.seq_name = seq_name
        self.obj_id = obj_id
        self.frames = frames
        self.frame0_id = frame0_id

    def __repr__(self):
        return "SampleSpec: " + str(vars(self))

    def encoded(self):
        return json.dumps(vars(self))

    @staticmethod
    def from_encoded(meta):
        return [SampleSpec(**json.loads(m)) for m in meta]


class TrainingDataset:

    def __init__(self, name, dset_path):
        self.dset_path = Path(dset_path)
        self.name = name
        self.occlusions = None
        self.frame_names = None
        self.specs = []

    # -- occlusion metadata --------------------------------------------------

    def _meta_file(self):
        return self.dset_path / (self.name + "_meta.npz")

    def load_meta(self):
        meta_file = self._meta_file()
        if meta_file.exists():
            z = np.load(meta_file, allow_pickle=True)
            return dict(frame_names=z["frame_names"].item(),
                        occlusions=z["occlusions"].item())

        print("Caching occlusions for %s, please wait." % self.anno_path)
        frame_names = dict()
        label_pixel_counts = dict()
        for seq in sorted(self.sequences):
            p = self.anno_path / seq
            files = sorted(p.glob("*.png"))
            per_frame = []
            num_objects = 0
            for f in files:
                lb = np.array(Image.open(f))
                ids, counts = np.unique(lb, return_counts=True)
                per_frame.append((ids, counts))
                num_objects = max(num_objects, int(ids.max()))
            px = np.zeros((len(per_frame), num_objects + 1))
            for i, (ids, counts) in enumerate(per_frame):
                px[i, ids] = counts
            frame_names[seq] = [f.stem for f in files]
            label_pixel_counts[seq] = (px, px.max(axis=0))

        occlusions = self._generate_occlusions(label_pixel_counts)
        np.savez(meta_file, frame_names=np.array(frame_names, dtype=object),
                 occlusions=np.array(occlusions, dtype=object))
        return dict(frame_names=frame_names, occlusions=occlusions)

    # -- epoch sampling ------------------------------------------------------

    def generate_samples(self, epoch_samples, epoch_repeats, min_seq_length, sample_size):
        d = self.load_meta()
        self.occlusions = d["occlusions"]
        self.frame_names = d["frame_names"]

        candidates = []
        for seq_name in self.sequences:
            if self.sequence_length(seq_name) < min_seq_length:
                continue
            for obj_id in self.object_ids(seq_name)[1:].tolist():
                candidates.append((seq_name, obj_id))

        if epoch_samples > 0:
            candidates = random.sample(candidates, min(epoch_samples, len(candidates)))

        self.specs = []
        for seq_name, obj_id in candidates:
            for _ in range(epoch_repeats):
                self.specs.append(self.sample_random_image_set(seq_name, obj_id,
                                                               size=sample_size))

    def sample_random_image_set(self, seq_name, obj_id, size=3):
        visible = self.object_visibility(seq_name, [obj_id], merge_objects=True)
        possible = np.where(visible)[0]
        first_frame = int(np.random.choice(possible, size=1)[0])
        allframes = np.arange(self.sequence_length(seq_name))
        allframes = allframes[allframes != first_frame]
        frames = np.random.choice(allframes, size=size, replace=False).tolist()
        # the reference drops the first of the second draw (frames[0]) so a
        # `size`-frame sample has frame0 + (size-1) train frames
        return SampleSpec(seq_name, obj_id, frames=[first_frame, *frames[1:]],
                          frame0_id=first_frame)

    def object_ids(self, seq_name):
        occ = self.occlusions[seq_name]
        always_occluded = occ.sum(axis=0) == occ.shape[0]
        return np.where(~always_occluded)[0]

    def object_visibility(self, seq_name, obj_ids, merge_objects=False):
        visible = ~np.asarray(self.occlusions[seq_name], bool)
        visible = visible[:, 1:] if obj_ids is None else visible[:, obj_ids]
        if visible.ndim == 1:
            visible = visible[:, None]
        if merge_objects:
            visible = visible.any(axis=1)
        return visible

    def sequence_length(self, seq_name):
        return self.occlusions[seq_name].shape[0]

    def __len__(self):
        return len(self.specs)

    def __getitem__(self, item):
        spec = self.specs[item]
        images, labels = [], []
        frame_names = self.frame_names[spec.seq_name]
        for f in spec.frames:
            frame = frame_names[f]
            im = np.array(Image.open(self.jpeg_path / spec.seq_name / (frame + ".jpg")))
            s = 480 / im.shape[0]
            interp = cv2.INTER_AREA if (s < 1.0) or (self.name == "davis") else cv2.INTER_CUBIC
            im = cv2.resize(im, (854, 480), interpolation=interp)
            images.append(im)

            lb = np.array(Image.open(self.anno_path / spec.seq_name / (frame + ".png")))
            lb = (lb == spec.obj_id).astype(np.uint8)
            lb = cv2.resize(lb, (854, 480), interpolation=cv2.INTER_NEAREST)
            labels.append(lb[..., None])
        return images, labels, spec.encoded()


class DAVISTrainingDataset(TrainingDataset):

    def __init__(self, dset_path, epoch_repeats=8, epoch_samples=0,
                 min_seq_length=4, sample_size=3):
        super().__init__("davis", dset_path)
        self.jpeg_path = self.dset_path / "JPEGImages" / "480p"
        self.anno_path = self.dset_path / "Annotations" / "480p"
        self.sequences = [s.strip() for s in
                          open(self.dset_path / "ImageSets/2017/train.txt")]
        self.generate_samples(epoch_samples, epoch_repeats, min_seq_length, sample_size)

    def _generate_occlusions(self, label_pixel_counts):
        """DAVIS occlusion flags with the reference's hand-tuned per-sequence
        thresholds and overrides (lib/training_datasets.py:211-262)."""
        occlusions = OrderedDict()
        min_px = 100
        never_occluded = ["bus", "car-turn", "drift-turn", "kid-football", "koala",
                          "mallard-fly", "motocross-bumps", "motorbike",
                          "rallye", "snowboard", "train", "upside-down"]
        thresholds = {"bmx-bumps": 0.5, "disk-jockey": 0.5,
                      "boxing-fisheye": 0.2, "cat-girl": 0.2, "dog-gooses": 0.2,
                      "tractor-sand": 0.1, "drone": 0.1}

        for seq_name in self.sequences:
            px_counts, max_counts = label_pixel_counts[seq_name]
            if seq_name in never_occluded:
                occ = np.zeros(px_counts.shape, bool)
            else:
                occ_threshold = thresholds.get(seq_name, 0.25)
                occ = (px_counts / (max_counts + 0.001)) < occ_threshold
                occ = occ | (max_counts == 0)

            if seq_name == "classic-car":
                occ[:56, :] = False
            elif seq_name == "drone":
                occ[:17, 1] = False
                occ[24:60, 1] = False
            elif seq_name == "night-race":
                occ[:29, :] = False
                occ[:, 2] = False

            occ = occ | (px_counts < min_px)
            occlusions[seq_name] = occ
        return occlusions


class YouTubeVOSTrainingDataset(TrainingDataset):

    def __init__(self, dset_path, epoch_samples=4000, epoch_repeats=1,
                 min_seq_length=4, sample_size=3, year=2018):
        super().__init__("ytvos" + str(year), dset_path)
        self.jpeg_path = self.dset_path / "train" / "JPEGImages"
        self.anno_path = self.dset_path / "train" / "Annotations"
        self.sequences = [s.strip() for s in
                          open(Path(__file__).parent / "ytvos_jjtrain.txt")]
        self.generate_samples(epoch_samples, epoch_repeats, min_seq_length, sample_size)

    def _generate_occlusions(self, label_pixel_counts):
        """YouTubeVOS rule: under 100 labeled pixels = occluded."""
        return OrderedDict((seq, px < 100)
                           for seq, (px, _) in label_pixel_counts.items())


class SyntheticTrainingDataset:
    """Data-free stand-in yielding moving-square samples with the
    TrainingDataset item interface (images, labels, encoded spec)."""

    def __init__(self, n_samples=16, size=(120, 160), sample_size=3, seed=0):
        from .synthetic import make_moving_square_sequence
        self.samples = []
        for i in range(n_samples):
            # the seed is part of the name: the target-model cache is keyed by
            # sequence name, and differently-seeded scenes are different data
            seq = make_moving_square_sequence(n_frames=sample_size, size=size,
                                              square=28, seed=seed + i,
                                              name=f"synth{seed + i:06d}")
            self.samples.append(seq)
        self.sample_size = sample_size

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, item):
        seq = self.samples[item]
        images = [seq.images[t] for t in range(self.sample_size)]
        labels = [(seq.labels[t] == 1).astype(np.uint8) for t in range(self.sample_size)]
        spec = SampleSpec(seq.name, 1, frames=list(range(self.sample_size)), frame0_id=0)
        return images, labels, spec.encoded()
