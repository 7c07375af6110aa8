#!/usr/bin/env python
"""Head-to-head: host-cv2 vs on-device first-frame augmentation in the bench
protocol (augment inside the fps clock, reference model/tracker.py:130).

Round-2 made the host augmenter fast (97-275 ms/object in-process); the open
question is whether DeviceAugmenter (models/device_augmenter.py: TELEA inpaint
on host, one jitted spec batch on device) beats it once the per-pass host time
and its contention sensitivity are priced in. Run on the real chip:

    python scripts/bench_augment_backend.py [n_frames]

Prints per-backend pass fps + phase stats, then a one-line verdict.
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    arch = "resnet101"
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 65
    platform = jax.devices()[0].platform
    cfg = eval_config(arch, fast=False,
                      compute_dtype="bfloat16" if platform != "cpu" else "float32")
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch,
                               use_bn=cfg.refnet_use_bn)
    seq = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                      square=120, n_objects=1, seed=0)

    results = {}
    for backend in ("host", "device"):
        tracker = BatchedSequenceTracker(cfg, backbone, refiner,
                                         extract_chunk=16,
                                         augment_backend=backend)
        tracker.run_sequence(seq, speedrun=True)
        passes, aug_ms = [], []
        for i in range(1, 6):
            _, fps_i = tracker.run_sequence(seq)
            passes.append(fps_i)
            ph = tracker.last_phase_stats
            if "augment" in ph:
                aug_ms.append(ph["augment"]["ms_per_call"])
            print(f"[{backend}] pass {i}: {fps_i:.1f} fps\n"
                  + tracker.last_phase_report, file=sys.stderr)
        results[backend] = (statistics.median(passes), max(passes), aug_ms)
        print(f"[{backend}] median {results[backend][0]:.1f} fps, "
              f"best {results[backend][1]:.1f}, augment_ms={[round(a,1) for a in aug_ms]}")

    h, d = results["host"], results["device"]
    print(f"VERDICT: host {h[0]:.1f} fps median vs device {d[0]:.1f} "
          f"({'device' if d[0] > h[0] else 'host'} wins, "
          f"{abs(d[0]-h[0])/h[0]*100:.1f}% delta)")


if __name__ == "__main__":
    main()
