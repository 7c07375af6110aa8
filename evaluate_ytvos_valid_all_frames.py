#!/usr/bin/env python
"""YouTubeVOS 2018 valid_all_frames benchmark CLI — the configuration that
reproduces the legacy stack's published 72% overall G score.

Capability parity with /root/reference/evaluate_ytvos_valid_all_frames.py:
the legacy (DiMP-lineage) settings — per-frame hinge pixel weighting with
update_method 'thresh', CG forgetting rate 75, memory 80, regs (1e-4, 1e-2) —
driven through the fused sequence tracker in DEFERRED merge mode (the legacy
stack's whole-sequence post-merge with ground truth inserted at start frames,
ytvos_validation/tracker.py:100-118). Unlike the reference (hardcoded paths,
no argparse, lines 119-121), paths are proper flags.
"""
import argparse
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(
        description="Evaluate on YouTubeVOS 2018 valid_all_frames (legacy config)")
    ap.add_argument("--model", type=str, required=True,
                    help="refiner weights (.pth reference checkpoint or native .npz)")
    ap.add_argument("--yt2018", type=str, default="/data/ytvos2018")
    ap.add_argument("--output", type=str, default="results")
    ap.add_argument("--backbone", type=str, default=None,
                    help="torchvision-format resnet .pth")
    ap.add_argument("--dev", type=str, default="tpu")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--sequences", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    if args.dev == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from dataclasses import replace
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.datasets import YouTubeVOSDataset
    from frtm_tpu.utils import checkpoints as ckpt

    model_path = Path(args.model)
    if not model_path.exists():
        print(f"Model file '{model_path}' not found.")
        sys.exit(1)
    if model_path.suffix == ".pth":
        arch, refiner = ckpt.load_reference_model(model_path)
    else:
        tree = ckpt.load_pytree(model_path)
        arch, refiner = tree["arch"], tree["refiner"]

    cfg = eval_config(arch, fast=False, compute_dtype=args.dtype)
    # legacy-stack discriminator settings
    # (/root/reference/evaluate_ytvos_valid_all_frames.py:59-90)
    cfg = replace(cfg, disc=replace(
        cfg.disc,
        cg_forgetting_rate=75,
        pixel_weighting_method="hinge",
        pixel_weighting_tf=0.1,
        pixel_weighting_per_frame=True,
        distractor_mult=1.0,
        update_method="thresh",
        clamp_output=False,
    ))

    if args.backbone:
        backbone = ckpt.load_backbone(args.backbone, arch)
    else:
        print("WARNING: random backbone (no --backbone given); scores will be "
              "meaningless.")
        backbone = init_resnet(jax.random.PRNGKey(0), arch)

    tracker = BatchedSequenceTracker(cfg, backbone, refiner,
                                     merge_mode="deferred")

    dset = YouTubeVOSDataset(path=args.yt2018, year="2018",
                             split="valid_all_frames", sequences=args.sequences)
    out_root = Path(args.output).expanduser().resolve() / "ytvos2018valid_all_frames" \
        / "Annotations"
    tracker.run_dataset(dset, out_root)


if __name__ == "__main__":
    main()
