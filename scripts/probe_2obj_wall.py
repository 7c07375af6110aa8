#!/usr/bin/env python
"""Where does the 2-object (and batched B=2) wall go? (VERDICT r3 #3/#4)

Round-3 trace attribution showed 2-obj DEVICE busy ~226 ms/65-frame pass,
yet the measured scan-phase wall is ~400-408 ms with ~1 ms of host CPU —
~180 ms of the pass is neither device work nor host work. Hypothesis: the
in-clock augmented-batch uploads (per object: 5 aug frames + labels ~8 MB
uint8 over a 2.5-50 MB/s tunnel) gate the init solve; extraction's ~73 ms
of device work hides one object's upload, two objects' uploads leave the
device idle inside the scan-phase block.

This probe times each stage of the 2-obj pass with explicit fences:
  augment (host)          cv2 augment per object, nothing in flight
  aug_upload (fenced)     jnp.asarray of both aug batches + drain round-trip
  extract (fenced)        whole-sequence backbone pyramid, block_until_ready
  init (fenced)           batched _init_objects, block
  scan (fenced)           the windowed scan program, block
The fenced stage walls OVER-count the pipelined pass (a real pass overlaps
upload with extract), but their SUM vs the real pass's wall bounds the
overlap, and the aug_upload figure alone tests the hypothesis.

Run: timeout 570 python scripts/probe_2obj_wall.py [n_objects] (TPU)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    jax.block_until_ready(x)
    return x


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import (init_resnet, init_seg_network,
                                 resnet_out_channels)
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    n_obj = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    arch = "resnet101"
    n_frames = 65
    cfg = eval_config(arch, fast=False, compute_dtype="bfloat16")
    backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch,
                               use_bn=cfg.refnet_use_bn)
    # aug_compact=False: this probe measures the DENSE packed-upload path's
    # transfer economics (the round-4 record); the round-5 compact path has
    # its own probe (scripts/probe_r5_ordering.py)
    tr = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=16,
                                augment_backend="host", aug_compact=False)
    seq = make_moving_square_sequence(n_frames=n_frames, size=(480, 854),
                                      square=100, n_objects=n_obj, seed=0)

    print(f"backend: {jax.default_backend()}  n_objects={n_obj}", flush=True)
    tr.run_sequence(seq, speedrun=True)          # compile everything

    # copy=False safety check on THIS backend: _pack_aug_batch promises the
    # host buffer is committed before device_put returns, so the augmenter
    # may overwrite its reused buffers while the transfer streams. Compare
    # the interleaved production path against owned copies.
    objs = tr._collect_objects(seq)
    fast = tr._augment_objects(objs, None)       # copy=False + async uploads
    for k, (obj_id, start_idx, mask, image) in enumerate(objs):
        rng = np.random.RandomState(0)
        im_aug, lb_aug = tr.augmenter.augment_first_frame(
            image, mask[..., None], rng, copy=True)
        safe_im, safe_lb = tr._pack_aug_batch(im_aug, lb_aug)
        assert np.array_equal(np.asarray(fast[k][0]), np.asarray(safe_im)), \
            f"object {k}: interleaved upload corrupted (images)"
        assert np.array_equal(np.asarray(fast[k][1]), np.asarray(safe_lb)), \
            f"object {k}: interleaved upload corrupted (labels)"
    print("copy=False interleaved uploads verified bit-identical", flush=True)

    # --- the real (pipelined) pass, for the baseline wall ------------------
    for i in range(3):
        _, fps = tr.run_sequence(seq)
        print(f"real pass {i}: {fps:.1f} fps  "
              f"wall {n_frames / fps * 1000:.0f} ms", flush=True)
        print("  " + "; ".join(
            f"{k}: {v['ms_per_call']:.1f} ms/call x{v['count']}"
            for k, v in tr.last_phase_stats.items()), flush=True)

    # --- fenced stage decomposition ----------------------------------------
    images_np = np.stack([seq[t][0] for t in range(len(seq))])
    chunks = tr._upload_chunks(images_np[1:])
    tr._frame0_dev = jax.device_put(images_np[0])
    tr._drain_uploads([tr._frame0_dev] + [c for c, _ in chunks])
    objects = tr._collect_objects(seq)

    for trial in range(3):
        t0 = time.perf_counter()
        batches = []
        for obj_id, start_idx, mask, image in objects:
            rng = np.random.RandomState(0)
            batches.append(tr.augmenter.augment_first_frame(
                image, mask[..., None], rng, copy=True))
        t_aug = time.perf_counter() - t0

        t0 = time.perf_counter()
        packed = [tr._pack_aug_batch(a, b) for a, b in batches]
        ims = tuple(a for a, _ in packed)
        lbs = tuple(b for _, b in packed)
        tr._drain_uploads(list(ims) + list(lbs))
        t_up = time.perf_counter() - t0
        mb = sum(x.size for x in ims + lbs) / 2**20

        t0 = time.perf_counter()
        feats_all = fence(tr._extract_sequence(images_np[1:], chunks=chunks))
        t_ext = time.perf_counter() - t0

        t0 = time.perf_counter()
        f0 = tuple(tr._frame_dev(o[1], images_np, chunks)
                   for o in objects)
        dp, ds, sm_dev = tr._init_objects(tr.backbone, tr._disc_params0,
                                          f0, ims, lbs)
        fence((dp, ds))
        t_init = time.perf_counter() - t0

        bucket = -(-(n_frames - 1) // tr.scan_bucket) * tr.scan_bucket
        pad = bucket - (n_frames - 1)
        if pad:
            feats_all = {L: jnp.concatenate(
                [v, jnp.repeat(v[-1:], pad, axis=0)])
                for L, v in feats_all.items()}
        sf = jnp.asarray([o[1] for o in objects], jnp.int32)
        sm = sm_dev                      # device-derived slot-0 masks
        lut = jnp.asarray([0] + [o[0] for o in objects], jnp.int32)
        t0 = time.perf_counter()
        outs, _, _ = tr._window_track(tr.refiner, feats_all, dp, ds, sf, sm,
                                      lut, im_size=(480, 854))
        fence(outs)
        t_scan = time.perf_counter() - t0

        tot = t_aug + t_up + t_ext + t_init + t_scan
        print(f"fenced trial {trial}: augment {t_aug*1e3:.0f} | "
              f"aug_upload {t_up*1e3:.0f} ({mb:.1f} MB -> "
              f"{mb / max(t_up, 1e-9):.0f} MB/s) | extract {t_ext*1e3:.0f} | "
              f"init {t_init*1e3:.0f} | scan {t_scan*1e3:.0f} | "
              f"sum {tot*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
