#!/usr/bin/env python
"""Measure the trainer's cold-start target-model init phase: serial
one-solve-per-element (the reference's structure,
/root/reference/model/training_model.py:117-148 — the shape of its 5-day
cold start, README.md:144-145) vs the batched path (one chunked extraction
dispatch + one vmapped GN-CG program over all misses, round-2 verdict #4).

Run on the TPU (background; first compiles are slow):
    python scripts/bench_cold_init.py [batch_size] [n_batches]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from frtm_tpu.config import TrackerConfig, train_aug_params
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.models.discriminator import DiscConfig
    from frtm_tpu.runtime.trainer import TrainerModel, TModelCache
    from frtm_tpu.data.training_datasets import SyntheticTrainingDataset, SampleSpec

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # the real cold-start configuration (reference train.py:34-69): rn101,
    # c=32 target models, 15-way augmentation, 480x854
    disc = DiscConfig(
        in_channels=resnet_out_channels("resnet101")["layer4"], c_channels=32,
        init_iters=(5, 10, 10, 10, 10), update_iters=(10,),
        filter_reg=(1e-5, 1e-4), precond=(1e-5, 1e-4), precond_lr=0.1,
        cg_forgetting_rate=75, memory_size=20, train_skipping=8,
        learning_rate=0.1, pixel_weighting_method="none", layer="layer4")
    cfg = TrackerConfig(feature_extractor="resnet101", num_aug=15, disc=disc,
                        aug_params=train_aug_params(15))
    backbone = init_resnet(jax.random.PRNGKey(0), "resnet101")
    ch = {L: c for L, c in resnet_out_channels("resnet101").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch, use_bn=True)
    model = TrainerModel(cfg, backbone, refiner, TModelCache(None, enable=False))

    dset = SyntheticTrainingDataset(n_samples=B * n_batches, size=(480, 854),
                                    sample_size=2, seed=0)

    def batch(bi):
        items = [dset[bi * B + i] for i in range(B)]
        fi = np.stack([it[0][0] for it in items])
        fl = np.stack([it[1][0][..., None] for it in items])
        return fi, fl, SampleSpec.from_encoded([it[2] for it in items])

    L = model.disc_cfg.layer

    def serial(fi, fl, specs):
        params = []
        for i in range(B):
            rng = np.random.RandomState(0)
            im_aug, lb_aug = model.augmenter.augment_first_frame(
                fi[i], fl[i], rng)
            ft = model._extract_disc_layer(model.backbone,
                                           jnp.asarray(im_aug))[L]
            p, _ = model._init_disc(model._disc_params0, ft,
                                    jnp.asarray(lb_aug))
            params.append(p)
        out = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        jax.block_until_ready(out)
        return out

    for name, fn in [("batched", lambda fi, fl, sp:
                      jax.block_until_ready(
                          model.build_disc_batch(fi, fl, sp)[0])),
                     ("serial", serial)]:
        fn(*batch(0))  # warm-up: compiles
        times = []
        for bi in range(1, n_batches):
            fi, fl, sp = batch(bi)
            t0 = time.time()
            fn(fi, fl, sp)
            times.append(time.time() - t0)
        print(f"{name}: {min(times):.2f}s best / "
              f"{sum(times) / len(times):.2f}s mean per {B}-sample cold batch "
              f"({[round(t, 2) for t in times]})")


if __name__ == "__main__":
    main()
