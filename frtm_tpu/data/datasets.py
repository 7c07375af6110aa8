"""Inference datasets: file-backed sequences for DAVIS and YouTubeVOS.

Capability parity with /root/reference/lib/datasets.py: FileSequence yields
(image, start_labels, new_object_ids) per frame with start-frame metadata,
label suppression for objects before their start frame, DAVIS 2016 object
merging, optional preloading, and restart/sequence-subset selection. The
YouTubeVOS splits include the jjtrain/jjvalid split files (vendored from the
reference's split lists at lib/ytvos_jj{train,valid}.txt — data, not code)
when present next to this module, plus meta.json-driven start frames."""
import json
from collections import defaultdict
from pathlib import Path

import numpy as np

from .image import imread


def _transpose_dict(d):
    dt = defaultdict(list)
    for k, v in d.items():
        dt[v].append(k)
    return dict(dt)


class FileSequence:
    """A sequence backed by jpeg frames and start-label pngs."""

    def __init__(self, dset_name, seq_name, jpeg_path: Path, anno_path: Path,
                 start_frames: dict, merge_objects=False, all_annotations=False):
        self.dset_name = dset_name
        self.name = seq_name
        self.images = sorted(Path(jpeg_path).glob("*.jpg"))
        self.anno_path = Path(anno_path)
        self.start_frames = _transpose_dict(start_frames)  # frame -> [obj ids]
        self.obj_ids = [1] if merge_objects else list(start_frames.keys())
        self.frame_names = [f.stem for f in self.images]
        self.merge_objects = merge_objects
        self.preloaded = None
        if all_annotations:
            self.annos = sorted(self.anno_path.glob("*.png"))

    def __len__(self):
        return len(self.images)

    def preload(self):
        """Read every frame up front (the reference preloads to GPU; we read to
        host memory — frames stream to the device inside the tracker). Uses
        the native thread-pool JPEG decoder when built."""
        from .image import imread_batch
        frames = imread_batch(self.images)
        self.preloaded = [frames[i] for i in range(len(self.images))]

    def __getitem__(self, item):
        im = self.preloaded[item] if self.preloaded is not None else imread(self.images[item])
        f = self.frame_names[item]
        obj_ids = self.start_frames.get(f, [])
        lb = []
        if obj_ids:
            lb = imread(self.anno_path / (f + ".png"))
            if self.merge_objects:
                lb = (lb != 0).astype(np.uint8)
                obj_ids = [1]
            else:
                keep = set([0] + list(obj_ids))
                suppress = [o for o in np.unique(lb).tolist() if o not in keep]
                for o in suppress:
                    lb = np.where(lb == o, 0, lb).astype(lb.dtype)
        return im, lb, list(obj_ids)

    def annotations(self):
        return {f.stem: imread(f) for f in self.annos}

    def __repr__(self):
        return "%s: %s, %d frames" % (self.dset_name, self.name, len(self.images))


class DAVISDataset:

    def __init__(self, path, year: str, split: str, restart=None, sequences=None,
                 all_annotations=False):
        self.dset_path = Path(path).expanduser().resolve()
        if not self.dset_path.exists():
            raise FileNotFoundError(f"Dataset directory '{path}' not found.")
        self.jpeg_path = self.dset_path / "JPEGImages" / "480p"
        self.anno_path = self.dset_path / "Annotations" / "480p"
        imset = self.dset_path / "ImageSets" / year / (split + ".txt")
        self.sequences = sorted(s.strip() for s in open(imset))
        self.name = f"dv{year}{split}"
        self.year = year
        self.all_annotations = all_annotations

        if sequences is not None:
            assert set(sequences).issubset(self.sequences)
            self.sequences = sorted(set(self.sequences) & set(sequences))
        if restart is not None:
            assert restart in self.sequences
            self.sequences = self.sequences[self.sequences.index(restart):]

        # In DAVIS all objects appear in the first frame
        self.start_frames = {}
        for seq in self.sequences:
            lb = imread(self.anno_path / seq / "00000.png")
            obj_ids = sorted(int(o) for o in np.unique(lb) if o != 0)
            self.start_frames[seq] = {o: "00000" for o in obj_ids}

    def __len__(self):
        return len(self.sequences)

    def __getitem__(self, item):
        seq = self.sequences[item]
        return FileSequence(self.name, seq, self.jpeg_path / seq, self.anno_path / seq,
                            self.start_frames[seq], merge_objects=self.year == "2016",
                            all_annotations=self.all_annotations)


class YouTubeVOSDataset:

    def __init__(self, path, year: str, split: str, restart=None, sequences=None,
                 all_annotations=False):
        self.dset_path = Path(path).expanduser().resolve()
        if not self.dset_path.exists():
            raise FileNotFoundError(f"Dataset directory '{path}' not found.")
        self.name = f"ytvos{year}{split}"
        self.year = year
        self.all_annotations = all_annotations

        if split in ("train", "train_all_frames", "jjval", "jjval_all_frames"):
            im_split = "train_all_frames" if split.endswith("_all_frames") else "train"
            self.jpeg_path = self.dset_path / im_split / "JPEGImages"
            self.anno_path = self.dset_path / "train" / "Annotations"
            split_file = Path(__file__).parent / (
                "ytvos_jjvalid.txt" if split.startswith("jjval") else "ytvos_jjtrain.txt")
            self.sequences = sorted(s.strip() for s in open(split_file))
            meta = json.load(open(self.dset_path / "train" / "meta.json"))["videos"]
        else:  # test / valid (+_all_frames)
            im_split = split
            base = split[:-len("_all_frames")] if split.endswith("_all_frames") else split
            self.jpeg_path = self.dset_path / im_split / "JPEGImages"
            self.anno_path = self.dset_path / base / "Annotations"
            self.sequences = sorted(s.name for s in self.anno_path.glob("*") if s.is_dir())
            meta = json.load(open(self.dset_path / base / "meta.json"))["videos"]
        self.meta = meta

        if sequences is not None:
            assert set(sequences).issubset(self.sequences)
            self.sequences = sorted(set(self.sequences) & set(sequences))
        if restart is not None:
            assert restart in self.sequences
            self.sequences = self.sequences[self.sequences.index(restart):]

        self.start_frames = {
            seq: {int(o): v["frames"][0] for o, v in meta[seq]["objects"].items()}
            for seq in self.sequences
        }

    def __len__(self):
        return len(self.sequences)

    def __getitem__(self, item):
        seq = self.sequences[item]
        return FileSequence(self.name, seq, self.jpeg_path / seq, self.anno_path / seq,
                            self.start_frames[seq], all_annotations=self.all_annotations)
