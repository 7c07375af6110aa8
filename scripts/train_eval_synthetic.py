#!/usr/bin/env python
"""Closed-loop quality check without any dataset: train the refiner on
synthetic moving-square scenes, then run the full tracker + J evaluation on
HELD-OUT synthetic sequences. A healthy framework should reach J well above
0.5 — this exercises training, checkpointing, target-model solving, the fused
tracker, PNG IO and the metric stack end to end.

Usage: python scripts/train_eval_synthetic.py [--platform cpu] [--epochs 8]
"""
import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--train-samples", type=int, default=48)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--eval-seqs", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=2, default=(120, 160))
    ap.add_argument("--min-j", type=float, default=None,
                    help="exit nonzero if mean J falls below this")
    ap.add_argument("--compare-dtypes", action="store_true",
                    help="also evaluate with compute_dtype='bfloat16' and "
                         "report the f32-vs-bf16 mask IoU per sequence (the "
                         "trained-refiner bound for the production TPU "
                         "dtype; round-2 verdict #5)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from dataclasses import replace
    from frtm_tpu.config import TrackerConfig, train_aug_params, eval_aug_params
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.models.discriminator import DiscConfig
    from frtm_tpu.runtime.trainer import Trainer, TrainerModel, TModelCache
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.training_datasets import SyntheticTrainingDataset
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    from frtm_tpu.eval.davis import davis_jaccard_measure

    arch = "resnet18"
    size = tuple(args.size)
    disc = DiscConfig(in_channels=resnet_out_channels(arch)["layer4"],
                      c_channels=32, init_iters=(3, 5, 5), update_iters=(5,),
                      filter_reg=(1e-5, 1e-4), precond=(1e-5, 1e-4),
                      cg_forgetting_rate=75, memory_size=12, train_skipping=4,
                      pixel_weighting_method="none")
    train_cfg = TrackerConfig(feature_extractor=arch, num_aug=5, disc=disc,
                              aug_params=train_aug_params(5))

    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in train_cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch, use_bn=True)

    with tempfile.TemporaryDirectory() as tmp:
        model = TrainerModel(train_cfg, backbone, refiner,
                             TModelCache(Path(tmp) / "cache"))
        # fixed pool of scenes across epochs (the tmodel cache is then valid,
        # as with real datasets where sequences are fixed and frames resample)
        dset = lambda: SyntheticTrainingDataset(
            n_samples=args.train_samples, size=size, sample_size=3, seed=0)
        trainer = Trainer("synth", model, [dset], Path(tmp) / "ckpt",
                          Path(tmp) / "log", max_epochs=args.epochs,
                          batch_size=args.batch_size, lr=1e-3,
                          load_latest=False)
        trainer.train()
        trained_refiner = trainer.model.refiner

        # evaluate on held-out sequences with eval-time settings
        eval_disc = replace(disc, pixel_weighting_method="hinge",
                            init_iters=(5, 10, 10, 10), update_iters=(5,),
                            memory_size=20, train_skipping=8,
                            cg_forgetting_rate=750,
                            filter_reg=(1e-4, 1e-2), precond=(1e-4, 1e-2))
        eval_cfg = replace(train_cfg, num_aug=5, disc=eval_disc,
                           aug_params=eval_aug_params(5))
        tracker = BatchedSequenceTracker(eval_cfg, backbone, trained_refiner,
                                         extract_chunk=8)
        tracker_bf16 = None
        if args.compare_dtypes:
            from dataclasses import replace as _rp
            tracker_bf16 = BatchedSequenceTracker(
                _rp(eval_cfg, compute_dtype="bfloat16"), backbone,
                trained_refiner, extract_chunk=8)
        js, dtype_ious = [], []
        for s in range(args.eval_seqs):
            seq = make_moving_square_sequence(
                n_frames=10, size=size, square=30, seed=1000 + s,
                name=f"eval{s}")
            outputs, fps = tracker.run_sequence(seq)
            seq_js = []
            for t in range(1, len(seq) - 1):  # DAVIS convention: skip first/last
                j = davis_jaccard_measure(outputs[t] == 1,
                                          seq.labels[t].squeeze() == 1)
                seq_js.append(j)
            js.append(float(np.mean(seq_js)))
            print(f"{seq.name}: J={js[-1]:.3f} ({fps:.1f} fps)")
            if tracker_bf16 is not None:
                out_bf, _ = tracker_bf16.run_sequence(seq)
                ious = []
                for t in range(1, len(seq)):
                    a, b = outputs[t] == 1, out_bf[t] == 1
                    u = (a | b).sum()
                    ious.append((a & b).sum() / u if u else 1.0)
                dtype_ious.append(float(np.min(ious)))
                print(f"{seq.name}: f32-vs-bf16 mask IoU min over frames = "
                      f"{dtype_ious[-1]:.4f}")

        mean_j = float(np.mean(js))
        print(f"mean J over {args.eval_seqs} held-out sequences: {mean_j:.3f}")
        if dtype_ious:
            print(f"f32-vs-bf16 trained-refiner mask IoU: min "
                  f"{min(dtype_ious):.4f} over all frames/sequences")
        if args.min_j is not None and mean_j < args.min_j:
            print(f"FAIL: J {mean_j:.3f} < {args.min_j}")
            sys.exit(1)


if __name__ == "__main__":
    main()
