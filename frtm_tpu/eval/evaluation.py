"""Dataset-level evaluation driver: loads predicted and ground-truth label
images per sequence, scores J or F per object, prints/persists the report with
unicode bargraphs (capability of /root/reference/lib/evaluation.py)."""
from collections import OrderedDict
from pathlib import Path

import numpy as np

from ..data.image import imread
from ..utils.meters import text_bargraph
from .davis import evaluate_sequence, mean, nanmean


def evaluate_dataset(dset, results_path, measure="J", to_file=True):
    """Evaluate all sequences of `dset` against label PNGs under
    `results_path/<sequence>/`. Returns the dataset mean score."""
    results_path = Path(results_path)
    results = OrderedDict()
    dset_scores, dset_decay, dset_recall = [], [], []

    f = open(results_path / f"evaluation-{measure}.txt", "w") if to_file else None

    def _print(msg):
        print(msg)
        if f:
            print(msg, file=f)
            f.flush()

    for j, sequence in enumerate(dset):
        annotations = OrderedDict()
        segmentations = OrderedDict()
        for file in sequence.annos:
            lb = imread(file)
            annotations[file.stem] = (lb != 0).astype(np.uint8) if sequence.merge_objects else lb
            segmentations[file.stem] = imread(results_path / sequence.name / file.name)

        object_info = dict()
        for obj_id in sequence.obj_ids:
            for frame, obj_ids in sequence.start_frames.items():
                if obj_id in obj_ids:
                    assert obj_id not in object_info
                    object_info[obj_id] = frame
        assert 0 not in object_info

        n_objs = len(object_info)
        _print("%d/%d: %s: %d object%s" % (j + 1, len(dset), sequence.name, n_objs,
                                           "s" if n_objs > 1 else ""))
        r = evaluate_sequence(segmentations, annotations, object_info, measure=measure)
        results[sequence.name] = r

        per_obj_score = []
        per_frame_score = []
        for obj_id, score in r["raw"].items():
            per_frame_score.append(score)
            s = mean(score)
            per_obj_score.append(s)
            if n_objs > 1:
                _print("joint {obj}: acc {score:.3f} ┊{apf}┊".format(
                    obj=obj_id, score=s, apf=text_bargraph(score)))

        dset_decay.extend(r["decay"])
        dset_recall.extend(r["recall"])
        dset_scores.extend(per_obj_score)

        seq_score = mean(per_obj_score)
        seq_mean_score = nanmean(np.array(per_frame_score), axis=0)
        _print("final  : acc {seq:.3f} ({dset:.3f}) ┊{apf}┊".format(
            seq=seq_score, dset=np.mean(dset_scores), apf=text_bargraph(seq_mean_score)))

    _print("%s: %.3f, recall: %.3f, decay: %.3f" %
           (measure, mean(dset_scores), mean(dset_recall), mean(dset_decay)))
    if f:
        f.close()
    return float(mean(dset_scores))
