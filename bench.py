#!/usr/bin/env python
"""Benchmark: DAVIS-2017-shaped tracking throughput per chip.

Runs the flagship rn101 tracker on a synthetic 480x854 single-object sequence
(the DAVIS resolution) on one chip: full per-frame hot path — backbone
pyramid, target-model classification, decoder refinement, soft aggregation,
online update with the every-8th-frame GN-CG re-solve — after a speedrun
warm-up pass, mirroring the reference's FPS protocol
(/root/reference/model/tracker.py:120-127,159-161; synchronize-bounded
wall-clock over frames). Mask quality is not measurable here (no pretrained
weights in this environment), so this measures throughput only.

Prints ONE JSON line:
  {"metric": "dv2017_frames_per_sec_per_chip_rn101", "value": N,
   "unit": "fps", "vs_baseline": N / 21.9}
`value` is the MEDIAN of 7 measured passes — the number that reproduces in
steady state; `best_of_7` is auxiliary (host/tunnel scheduling noise only
deflates passes, never inflates them — see CLAUDE.md perf log).
(baseline: the paper's ~21.9 FPS for FRTM rn101 on a V100, BASELINE.md).

Auxiliary fields:
  fps_batched_b{2,4}: aggregate fps/chip with B independent sequences vmapped
    into ONE scan program on the single chip (ShardedSequenceTracker on a
    1-device mesh). Measured v5e semantics (round 3): in QUIET windows the
    device is already ~90% busy during the scan, so batching buys nothing
    (B=2: 181 aggregate vs ~200 single); in CONTENDED windows one B-sequence
    program amortises the per-dispatch tunnel stalls that tank the single-
    sequence median (B=2: 165 aggregate vs 120 single in the same noisy
    window) — batching is contention insurance, not idle-filling.
  fps_2obj_median: the 2-object sequence cost (DAVIS 2017 averages ~2
    objects; the reference protocol's headline is single-object).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_FPS = 21.9  # FRTM rn101, DAVIS, V100 (BASELINE.md)


def main():
    import statistics
    import jax
    # persistent compile cache: first run through the remote-compile tunnel is
    # slow (~90s/program); later runs hit this cache
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    arch = "resnet101"
    # DAVIS 2017 val sequences average ~67 frames; the per-object init cost
    # amortizes over the sequence exactly as in the reference protocol
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    platform = jax.devices()[0].platform

    cfg = eval_config(arch, fast=False,
                      compute_dtype="bfloat16" if platform != "cpu" else "float32")
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items() if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch, use_bn=cfg.refnet_use_bn)
    tracker = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=16,
                                     augment_backend="host")

    seq = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                      square=120, n_objects=1, seed=0)

    # speedrun warm-up compiles every per-frame program; then 7 measured
    # passes. Median-of-7 is the headline (the steady-state number that
    # reproduces); best is auxiliary because host/tunnel scheduling noise
    # (not the workload) dominates run-to-run variance in this environment
    # and only deflates, never inflates, a pass.
    tracker.run_sequence(seq, speedrun=True)
    passes, scan_ms, augment_ms = [], [], []
    for i in range(1, 8):
        _, fps_i = tracker.run_sequence(seq)
        print(f"pass {i}: {fps_i:.1f} fps\n" + tracker.last_phase_report,
              file=sys.stderr)
        passes.append(fps_i)
        ph = tracker.last_phase_stats
        if "scan" in ph:
            scan_ms.append(ph["scan"]["ms_per_call"])
        if "augment" in ph:
            augment_ms.append(ph["augment"]["ms_per_call"])
    med = statistics.median(passes)
    best = max(passes)

    # multi-object variant: DAVIS 2017 averages ~2 objects/sequence. The
    # reference FPS protocol is single-object (model/tracker.py:159-161), so
    # the headline stays 1-object; this measures the vmapped-lanes cost.
    seq2 = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                       square=100, n_objects=2, seed=0)
    tracker.run_sequence(seq2, speedrun=True)
    passes2 = []
    for i in range(1, 4):
        _, fps_i = tracker.run_sequence(seq2)
        print(f"2-object pass {i}: {fps_i:.1f} fps\n" + tracker.last_phase_report,
              file=sys.stderr)
        passes2.append(fps_i)

    # single-chip multi-sequence batching: B independent sequences stacked on
    # the vmapped sequence axis of ONE scan program (a 1-device mesh —
    # the same program that shards over real meshes). Aggregate fps/chip =
    # B * frames / wall; per-sequence init cost is included like the headline.
    batched = _bench_batched(cfg, backbone, refiner, n_frames)

    print(json.dumps({
        "metric": "dv2017_frames_per_sec_per_chip_rn101",
        "value": round(med, 3),
        "unit": "fps",
        "vs_baseline": round(med / REFERENCE_FPS, 3),
        "best_of_7": round(best, 3),
        "spread_pct": round(100 * (max(passes) - min(passes)) / med, 1),
        "fps_2obj_median": round(statistics.median(passes2), 3),
        **batched,
        # device work is stable; the spread is the 1-core host's augmentation
        # phase slowing 2-10x under exogenous load (wall == thread-CPU, same
        # ops, measured in CLAUDE.md round 2) — hence median + best reporting
        "scan_ms_median": round(statistics.median(scan_ms), 1) if scan_ms else None,
        "augment_ms_range": ([round(min(augment_ms), 1), round(max(augment_ms), 1)]
                             if augment_ms else None),
    }))


def _bench_batched(cfg, backbone, refiner, n_frames, batch_sizes=(2, 4)):
    """Aggregate fps/chip for B sequences tracked in one vmapped scan program
    on the single chip (VERDICT r2 #1: the scan wall is ~3x device-busy, and
    batching is the lever that fills the idle).

    Timing protocol matches the headline: frame decode + device upload are
    pre-clock (the reference preloads before its fps window,
    model/tracker.py:88-91); augmentation, init solves, extraction, and the
    scan are in-clock; label download is post-clock."""
    import statistics
    import time
    import jax
    from frtm_tpu.parallel.mesh import make_mesh
    from frtm_tpu.parallel.multi_sequence import ShardedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    mesh = make_mesh(1)
    st = ShardedSequenceTracker(cfg, backbone, refiner, mesh, extract_chunk=16,
                                length_bucket=16)
    out = {}
    for B in batch_sizes:
        seqs = [make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                            square=120, n_objects=1, seed=s)
                for s in range(B)]
        for s, q in enumerate(seqs):
            q.name = f"bench{s}"
        key = st._group_key_meta(seqs[0])
        inputs = [st.prepare_inputs(q) for q in seqs]   # decode + upload
        jax.block_until_ready([c for inp in inputs for c, _ in inp["chunks"]])

        def one_pass():
            # clock covers augment + init solves + extraction + scan, like
            # the headline (the reference times its whole per-sequence loop
            # including object initialisation)
            t0 = time.time()
            preps = [(q, st._prepare(q, preloaded=inp))
                     for q, inp in zip(seqs, inputs)]
            outs = st._run_group(preps, key, as_device=True)
            outs.block_until_ready()
            return B * n_frames / max(time.time() - t0, 1e-9), preps

        one_pass()                       # warm-up: compiles + caches programs
        fps_list = []
        for _ in range(3):
            fps_i, _ = one_pass()
            fps_list.append(fps_i)
        out[f"fps_batched_b{B}"] = round(statistics.median(fps_list), 3)
        print(f"batched B={B}: {out[f'fps_batched_b{B}']} fps aggregate "
              f"({[round(f, 1) for f in fps_list]})", file=sys.stderr)
        del inputs
    return out


if __name__ == "__main__":
    main()
