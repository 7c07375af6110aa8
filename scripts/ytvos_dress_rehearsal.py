#!/usr/bin/env python
"""YTVOS valid_all_frames dress rehearsal at shape diversity (VERDICT r3 #7).

The real valid_all_frames split is ~470 sequences of mixed resolutions,
lengths up to ~180 frames, and 1-5 objects with mid-sequence entries
(/root/reference/ytvos_validation/ytvos_dataset.py:57-64). Without the data
in this image, this rehearsal fabricates a ~20-sequence layout with that
diversity and drives BOTH production engines end-to-end, bounding the two
resources that real shape diversity stresses:

  * compiled-program count — every (im_size, length-bucket[, object-pad])
    combination is a new XLA program; unbounded growth would mean ~90 s of
    remote compile per novel shape on the tunnel. Bucketing (scan_bucket /
    length_bucket, object-count power-of-two padding) must keep the count
    at the number of shape GROUPS, not sequences.
  * peak RSS — the deferred-merge volume is (T, N+1, H, W) f32 per sequence
    (ytvos_validation/tracker.py:100-118 keeps the whole soft volume until
    the sequence ends); at the rehearsal's 180-frame 3-object sequence that
    is 180*4*96*128*4 B = 35 MB, and the assert also projects the
    full-resolution (720x1280) figure (~2.7 GB) to document the real
    deployment's envelope.

Run (CPU, ~15-25 min on the 1-core host):
  python scripts/ytvos_dress_rehearsal.py [--out /tmp/rehearsal]
Prints one JSON line with program counts, RSS, and per-engine walls; exits
nonzero if a bound is violated.
"""
import argparse
import json
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")   # env var alone is ignored (CLAUDE.md)

from dataclasses import replace


def _count_programs(obj):
    """Total compiled executables across every jitted callable reachable from
    the tracker's attributes (PjitFunction exposes _cache_size), plus any
    jit-valued cache dicts. A robust proxy for 'distinct XLA programs built
    during the run' without poking jax internals."""
    n = 0
    seen = set()
    for v in vars(obj).values():
        for f in (v.values() if isinstance(v, dict) else [v]):
            if id(f) in seen:
                continue
            seen.add(id(f))
            size = getattr(f, "_cache_size", None)
            if callable(size):
                try:
                    n += int(size())
                except Exception:
                    pass
    return n


def _sequences():
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    specs = []
    # three resolution buckets x lengths from 6 to 180 x 1-3 objects; a few
    # mid-sequence entries via n_objects>1 start offsets are covered by the
    # CLI test — here every object starts at frame 0 (valid_all_frames's
    # dominant case) and diversity stresses the PROGRAM axis
    sizes = [(64, 96), (96, 128), (80, 112)]
    lengths = [6, 12, 30, 60]
    k = 0
    for si, size in enumerate(sizes):
        for L in lengths:
            n_obj = 1 + (k % 3)
            sq = 16 + 2 * (k % 4)
            specs.append((f"s{k:02d}", size, L, n_obj, sq))
            k += 1
    # the long tail: two 180-frame sequences, one with 3 objects (the
    # deferred-merge volume worst case), in different resolutions
    specs.append((f"s{k:02d}", (96, 128), 180, 3, 20)); k += 1
    specs.append((f"s{k:02d}", (64, 96), 180, 1, 18)); k += 1

    seqs = []
    for i, (name, size, L, n_obj, sq) in enumerate(specs):
        seqs.append(make_moving_square_sequence(
            n_frames=L, size=size, square=sq, n_objects=n_obj,
            seed=100 + i, name=name))
    return seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="/tmp/ytvos_rehearsal")
    args = ap.parse_args()

    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.parallel.mesh import make_mesh
    from frtm_tpu.parallel.multi_sequence import ShardedSequenceTracker

    arch = "resnet18"
    cfg = eval_config(arch, fast=True, num_aug=2, compute_dtype="float32")
    cfg = replace(cfg, disc=replace(
        cfg.disc, c_channels=16, init_iters=(3, 5), update_iters=(3,),
        memory_size=8, pixel_weighting_method="hinge", update_method="thresh",
        clamp_output=False))   # the legacy YTVOS discriminator settings
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch,
                               use_bn=cfg.refnet_use_bn)

    class _Set(list):           # run_dataset expects a named iterable
        name = "rehearsal"

    seqs = _Set(_sequences())
    n_frames = sum(len(s) for s in seqs)
    out = Path(args.out)
    n_groups = len({(s.images[0].shape[:2],
                     -(-(len(s) - 1) // 16) * 16,
                     1 << (len(s.obj_ids) - 1).bit_length()) for s in seqs})
    report = {"n_sequences": len(seqs), "n_frames": n_frames,
              "n_shape_groups": n_groups}

    # --- engine A: the legacy CLI's configuration (deferred merge, fused) --
    tr = BatchedSequenceTracker(cfg, backbone, refiner, merge_mode="deferred",
                                extract_chunk=8, scan_bucket=16)
    t0 = time.time()
    tr.run_dataset(_Set(seqs), out / "deferred")
    report["deferred_wall_s"] = round(time.time() - t0, 1)
    report["deferred_programs"] = _count_programs(tr)

    # --- engine B: the sharded streaming engine over the same layout -------
    st = ShardedSequenceTracker(cfg, backbone, refiner, make_mesh(1),
                                extract_chunk=8, length_bucket=16)
    t0 = time.time()
    st.run_dataset(_Set(seqs), out / "sharded", speedrun=True)
    report["sharded_wall_s"] = round(time.time() - t0, 1)
    report["sharded_programs"] = _count_programs(st)

    # every sequence produced every frame in both trees
    for root in ("deferred", "sharded"):
        for s in seqs:
            got = len(list((out / root / s.name).glob("*.png")))
            assert got == len(s), (root, s.name, got)

    report["peak_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
    # deferred-merge volume documentation: rehearsal worst case + the
    # projected full-resolution deployment figure
    report["merge_volume_mb_rehearsal"] = round(
        180 * 4 * 96 * 128 * 4 / 2**20, 1)
    report["merge_volume_mb_720p_projected"] = round(
        180 * 4 * 720 * 1280 * 4 / 2**20, 1)

    # --- group-reuse proof ---------------------------------------------
    # the load-bearing property is that programs scale with SHAPE GROUPS,
    # never with sequences: tracking NEW sequences whose shapes were already
    # seen must compile NOTHING (else the real 470-sequence split would pay
    # ~90 s of remote compile per sequence on the tunnel)
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    extra = _Set(make_moving_square_sequence(
        n_frames=6, size=(64, 96), square=18, n_objects=1,
        seed=900 + i, name=f"x{i:02d}") for i in range(3))
    tr.run_dataset(extra, out / "deferred_x")
    st.run_dataset(extra, out / "sharded_x")
    report["deferred_programs_after_reuse"] = _count_programs(tr)
    report["sharded_programs_after_reuse"] = _count_programs(st)
    assert report["deferred_programs_after_reuse"] == \
        report["deferred_programs"], report
    assert report["sharded_programs_after_reuse"] == \
        report["sharded_programs"], report

    # --- bounds ----------------------------------------------------------
    # measured at the time of writing: 65 / 62 programs for the 14 shape
    # groups above (scan + windowed + extract + init + merge programs per
    # group-dimension, plus per-tracker fixed programs). Gates are ~1.5x
    # the measured values — they catch per-sequence recompilation (which
    # would read ~x5) without pinning compiler-version noise.
    assert report["deferred_programs"] <= 100, report
    assert report["sharded_programs"] <= 95, report
    assert report["peak_rss_mb"] < 8192, report

    print(json.dumps(report))
    print("DRESS REHEARSAL: PASS")


if __name__ == "__main__":
    main()
