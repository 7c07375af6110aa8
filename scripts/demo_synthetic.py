#!/usr/bin/env python
"""End-to-end demo on a synthetic moving-square sequence: runs the full
tracker (augment -> GN-CG init -> per-frame classify/refine/merge/update),
writes indexed PNGs, and prints per-frame discriminator IoU + FPS.

Works without any dataset; use --platform cpu for a quick host run."""
import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu to force host execution")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=(120, 160))
    ap.add_argument("--objects", type=int, default=1)
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from dataclasses import replace
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.runtime.tracker import Tracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    from frtm_tpu.data.image import imwrite_indexed

    print("devices:", jax.devices())
    seq = make_moving_square_sequence(n_frames=args.frames, size=tuple(args.size),
                                      square=28, n_objects=args.objects)

    cfg = eval_config(args.arch, fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5), update_iters=(3,),
                                    memory_size=16, c_channels=32, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), args.arch)
    ch = {L: c for L, c in resnet_out_channels(args.arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)
    tracker = Tracker(cfg, backbone, refiner)

    outputs, fps = tracker.run_sequence(seq)
    out_dir = Path(args.out or tempfile.mkdtemp(prefix="frtm_demo_"))
    out_dir.mkdir(parents=True, exist_ok=True)
    print(f"sequence '{seq.name}': {len(outputs)} frames @ {fps:.2f} fps")
    for t, (out, name) in enumerate(zip(outputs, seq.frame_names)):
        imwrite_indexed(out_dir / f"{name}.png", out)
        gt = seq.labels[t].squeeze() > 0
        pred = out > 0
        iou = (gt & pred).sum() / max((gt | pred).sum(), 1)
        print(f"  frame {t}: IoU(all objects)={iou:.3f}")
    print("wrote PNGs to", out_dir)


if __name__ == "__main__":
    main()
