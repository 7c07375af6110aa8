#!/usr/bin/env python
"""Round-5 A/B probe: compact init encoding + extract-dispatch ordering.

Two VERDICT r4 items measured head to head on the real chip, same process,
interleaved passes (so both arms sample the same tunnel weather):

  #1 aug_compact — the 2-object pass was transfer-bound (~10 MB of in-clock
     augment uploads at 13-50 MB/s while 226 ms of device work waited). The
     compact encoding ships ~1.1 MB/object and composes on device.
     Arms: dense vs compact, n_objects=2 (and 1 for the headline effect).

  #5 extract_first — _run used to augment BEFORE dispatching the fused
     extract (a round-2 rule from when extraction was 5 chunked dispatches
     with in-flight uploads); the one-dispatch _extract_padded reads only
     device-resident chunks, so dispatching it first hides ~73 ms of
     backbone work behind the ~50 ms host augment.
     Arms: extract_first True vs False, compact on.

Interleaved A/B/A/B... passes; report per-arm median/best + phase stats.

Run: python scripts/probe_r5_ordering.py [n_passes_per_arm] (TPU,
run_in_background — first compile exceeds the foreground timeout)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import statistics

import numpy as np
import jax


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import (init_resnet, init_seg_network,
                                 resnet_out_channels)
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    n_per_arm = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_frames = 65
    arch = "resnet101"
    cfg = eval_config(arch, fast=False, compute_dtype="bfloat16")
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch,
                               use_bn=cfg.refnet_use_bn)
    print(f"backend: {jax.default_backend()}", flush=True)

    def make(compact, extract_first):
        tr = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=16,
                                    augment_backend="host",
                                    aug_compact=compact)
        tr.extract_first = extract_first
        return tr

    def run_ab(label, arms, seq):
        for name, tr in arms:
            tr.run_sequence(seq, speedrun=True)   # compile both arms first
        recs = {name: [] for name, _ in arms}
        for i in range(n_per_arm):
            for name, tr in arms:
                _, fps = tr.run_sequence(seq)
                ph = tr.last_phase_stats
                recs[name].append(fps)
                stats = "; ".join(
                    f"{k} {v['ms_per_call']:.0f}ms" for k, v in ph.items()
                    if k in ("augment", "aug_upload", "extract", "disc_init",
                             "scan"))
                print(f"{label} [{name}] pass {i}: {fps:.1f} fps ({stats})",
                      flush=True)
        for name, _ in arms:
            r = recs[name]
            print(f"{label} [{name}]: median {statistics.median(r):.1f} "
                  f"best {max(r):.1f} (n={len(r)})", flush=True)
        return recs

    # --- #1: compact vs dense, 2 objects (and 1) ---------------------------
    for n_obj, sq in ((2, 100), (1, 120)):
        seq = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                          square=sq, n_objects=n_obj, seed=0)
        run_ab(f"{n_obj}-obj compact-vs-dense",
               [("dense", make(False, True)),
                ("compact", make(True, True))], seq)

    # --- #5: extract_first on vs off, compact on, 1 object -----------------
    seq = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                      square=120, n_objects=1, seed=0)
    run_ab("1-obj extract-first-vs-augment-first",
           [("augment_first", make(True, False)),
            ("extract_first", make(True, True))], seq)


if __name__ == "__main__":
    main()
