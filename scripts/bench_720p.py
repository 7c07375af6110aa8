#!/usr/bin/env python
"""One YTVOS-resolution (720x1280) datapoint on the real chip (VERDICT r4
#7): the dress rehearsal pinned shape diversity and memory bounds on CPU
(scripts/ytvos_dress_rehearsal.py) but the bench only ever measures 480x854.
This runs the all-frames deployment configuration — rn101, DEFERRED merge
(the legacy stack's whole-sequence post-merge,
/root/reference/ytvos_validation/tracker.py:100-118; dataset resolution per
ytvos_dataset.py:57-64) — on one 720x1280 multi-object sequence and records
fps, the phase walls, and the compiled-program count.

Run: python scripts/bench_720p.py [n_frames] [n_objects] (TPU,
run_in_background — the 720p programs compile fresh the first time)
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax


def _n_programs():
    """Total live compiled programs across jax's jit caches."""
    from jax._src import pjit
    try:
        return pjit._cpp_pjit_cache_explicit_attributes.size() + \
            pjit._cpp_pjit_cache_fun_only.size()
    except Exception:
        return -1


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import (init_resnet, init_seg_network,
                                 resnet_out_channels)
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    n_obj = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    arch = "resnet101"
    cfg = eval_config(arch, fast=False, compute_dtype="bfloat16")
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch,
                               use_bn=cfg.refnet_use_bn)
    tr = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=16,
                                merge_mode="deferred",
                                augment_backend="host")
    seq = make_moving_square_sequence(n_frames=n_frames, size=(720, 1280),
                                      square=180, n_objects=n_obj, seed=0)
    print(f"backend: {jax.default_backend()}  720x1280 {n_frames} frames "
          f"{n_obj} objects, deferred merge", flush=True)

    t0 = time.time()
    tr.run_sequence(seq, speedrun=True)
    print(f"warm-up (incl. compiles): {time.time() - t0:.0f}s; "
          f"programs: {_n_programs()}", flush=True)

    fpss = []
    for i in range(5):
        outs, fps = tr.run_sequence(seq)
        fpss.append(fps)
        stats = "; ".join(f"{k} {v['ms_per_call']:.0f}ms"
                          for k, v in tr.last_phase_stats.items())
        print(f"pass {i}: {fps:.1f} fps ({stats})", flush=True)
    print(f"720p: median {statistics.median(fpss):.1f} fps, "
          f"best {max(fpss):.1f}; programs after passes: {_n_programs()} "
          "(no in-clock retrace)", flush=True)
    # sanity: GT carried at frame 0, full-res outputs
    assert outs[0].shape == (720, 1280)
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.asarray(seq.labels[0]).squeeze())
    print("outputs verified (shape + frame-0 ground truth)", flush=True)


if __name__ == "__main__":
    main()
