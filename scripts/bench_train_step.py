"""Warm-cache train-step throughput at the reference recipe's shapes.

The reference's training baseline is wall-clock only: ~5 days cold / <24 h
with a warm target-model cache on an unspecified GPU
(/root/reference/README.md:144-145; BASELINE.md). This measures the
TPU-native equivalent: the jitted TrainerModel step (frozen cached target
models, i.e. the warm-cache regime) at the recipe's real shapes — batch 16,
sample_size 3 -> 2 train frames/sample, 480x854, c=32
(/root/reference/train.py:125-132) — and extrapolates the full 260-epoch
recipe (~5.15k samples/epoch: 4000 YTVOS draws + ~1.15k DAVIS repeats).

Usage: python scripts/bench_train_step.py [batch] [arch ...]
(drop to batch 8 if a 16-sample step overflows one chip's HBM; samples/s is
comparable either way).
"""
import sys
import time
import statistics
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from frtm_tpu.config import TrackerConfig, train_aug_params
    from frtm_tpu.models import (init_resnet, init_seg_network,
                                 resnet_out_channels)
    from frtm_tpu.models.discriminator import DiscConfig, init_disc_params
    from frtm_tpu.runtime.trainer import TrainerModel, TModelCache, make_optimizer

    import os
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    archs = sys.argv[2:] or ["resnet18", "resnet101"]
    # FRTM_BENCH_SIZE=HxW overrides the frame size (CPU smoke runs only;
    # the reported numbers must use the recipe's 480x854)
    H, W = map(int, os.environ.get("FRTM_BENCH_SIZE", "480x854").split("x"))
    T = 2
    samples_total = 260 * 5150  # the full reference recipe

    for arch in archs:
        # the train CLI's exact discriminator settings (train.py:53-60)
        disc = DiscConfig(
            in_channels=resnet_out_channels(arch)["layer4"], c_channels=32,
            init_iters=(5, 10, 10, 10, 10), update_iters=(10,),
            filter_reg=(1e-5, 1e-4), precond=(1e-5, 1e-4), precond_lr=0.1,
            cg_forgetting_rate=75, memory_size=20, train_skipping=8,
            learning_rate=0.1, pixel_weighting_method="none", layer="layer4",
        )
        cfg = TrackerConfig(feature_extractor=arch, num_aug=15, disc=disc,
                            aug_params=train_aug_params(15))
        backbone = init_resnet(jax.random.PRNGKey(0), arch)
        ch = {L: c for L, c in resnet_out_channels(arch).items()
              if L in cfg.refnet_layers}
        refiner = init_seg_network(jax.random.PRNGKey(1), ch, use_bn=True)
        model = TrainerModel(cfg, backbone, refiner,
                             TModelCache(None, enable=False))

        tx = make_optimizer(1e-3)
        opt_state = tx.init(refiner)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(T, B, H, W, 3).astype(np.float32) * 255)
        labels = jnp.zeros((T, B, H, W, 1), jnp.float32) \
            .at[:, :, 100:300, 200:500].set(1.0)
        d0 = init_disc_params(jax.random.PRNGKey(2), disc)
        disc_batch = jax.tree.map(lambda x: jnp.stack([x] * B), d0)
        mask = jnp.ones((B,), jnp.float32)

        step = jax.jit(lambda r, o, bb, db, im, lb, m: model._train_step(
            r, o, bb, db, im, lb, m, tx))
        t0 = time.time()
        r2, o2, stats = step(refiner, opt_state, backbone, disc_batch,
                             images, labels, mask)
        # scalar download = reliable barrier on this tunnel (CLAUDE.md:
        # block_until_ready does not reliably block here)
        loss0 = float(stats["stats/loss"])
        print(f"{arch} B={B}: compile+first step {time.time() - t0:.1f}s, "
              f"loss {loss0:.4f}", flush=True)

        walls = []
        for _ in range(5):
            t0 = time.time()
            r2, o2, stats = step(r2, o2, backbone, disc_batch,
                                 images, labels, mask)
            _ = float(stats["stats/loss"])
            walls.append(time.time() - t0)
        med = statistics.median(walls)
        sps = B / med
        print(f"{arch} B={B}: step {med * 1000:.0f} ms median "
              f"({[round(w * 1000) for w in walls]} ms), {sps:.1f} samples/s "
              f"-> full 260-epoch recipe ~{samples_total / sps / 3600:.1f} h",
              flush=True)


if __name__ == "__main__":
    main()
