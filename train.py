#!/usr/bin/env python
"""Train the refinement network (the only trainable component — backbone is
frozen, target models are solved online and cached).

CLI-surface parity with /root/reference/train.py (name, --ftext, --dset,
--dev; reference lines 113-119), with dataset roots as flags instead of an
edit-this-file paths dict. Hyperparameters follow the reference: Adam lr 1e-3
wd 1e-5 amsgrad, StepLR(127, 0.1), max 260 epochs, batch 16, DAVIS x8 repeats
+ 4000 YouTubeVOS samples per epoch, 15-way augmentation, c=32 target models
with the (1e-5, 1e-4) regularisation schedule.

Usage:
  python train.py sess01 --ftext resnet101 --dset all \\
      --dv2017 /data/DAVIS --yt2018 /data/ytvos2018 \\
      --backbone resnet101.pth --workspace /data/workspace
"""
import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description="Train FRTM-TPU")
    ap.add_argument("name", type=str, help="training session name")
    ap.add_argument("--ftext", type=str, default="resnet101",
                    choices=["resnet101", "resnet18"], help="feature extractor")
    ap.add_argument("--dset", type=str, default="all",
                    choices=["all", "yt2018", "dv2017", "synthetic"],
                    help="training datasets (synthetic = data-free smoke run)")
    ap.add_argument("--dev", type=str, default="tpu", help="jax platform")
    ap.add_argument("--dv2017", type=str, default="/data/DAVIS")
    ap.add_argument("--yt2018", type=str, default="/data/ytvos2018")
    ap.add_argument("--workspace", type=str, default="workspace",
                    help="checkpoints/logs/tmodel-cache root")
    ap.add_argument("--backbone", type=str, default=None,
                    help="torchvision-format resnet .pth")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--max-epochs", type=int, default=260)
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (0 = single device)")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed and train data-parallel "
                         "over the GLOBAL mesh (all hosts' devices); each "
                         "process feeds its own batch rows. No-ops gracefully "
                         "on a single host. See docs/MULTIHOST.md.")
    args = ap.parse_args()

    import jax
    if args.dev == "cpu":
        jax.config.update("jax_platforms", "cpu")

    pid, n_proc = 0, 1
    if args.multihost:
        from frtm_tpu.parallel.distributed import init_distributed
        pid, n_proc = init_distributed()
        print(f"multihost: process {pid}/{n_proc}, "
              f"{len(jax.local_devices())} local / {len(jax.devices())} "
              "global devices")

    from frtm_tpu.config import TrackerConfig, train_aug_params
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.models.discriminator import DiscConfig
    from frtm_tpu.runtime.trainer import Trainer, TrainerModel, TModelCache
    from frtm_tpu.utils import checkpoints as ckpt

    arch = args.ftext
    disc = DiscConfig(
        in_channels=resnet_out_channels(arch)["layer4"], c_channels=32,
        init_iters=(5, 10, 10, 10, 10), update_iters=(10,),
        filter_reg=(1e-5, 1e-4), precond=(1e-5, 1e-4), precond_lr=0.1,
        cg_forgetting_rate=75, memory_size=20, train_skipping=8,
        learning_rate=0.1, pixel_weighting_method="none", layer="layer4",
    )
    cfg = TrackerConfig(feature_extractor=arch, num_aug=15, disc=disc,
                        aug_params=train_aug_params(15))

    if args.backbone:
        backbone = ckpt.load_backbone(args.backbone, arch)
    else:
        print("WARNING: no --backbone weights; training against a random "
              "frozen backbone (smoke runs only).")
        backbone = init_resnet(jax.random.PRNGKey(0), arch)
    ch = {L: c for L, c in resnet_out_channels(arch).items() if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(1), ch, use_bn=cfg.refnet_use_bn)

    ws = Path(args.workspace).expanduser().resolve()
    cache = TModelCache(ws / "tmodels_cache" / f"{arch}-c{disc.c_channels}")
    model = TrainerModel(cfg, backbone, refiner, cache)

    from frtm_tpu.data.training_datasets import (
        DAVISTrainingDataset, YouTubeVOSTrainingDataset, SyntheticTrainingDataset)
    datasets = []
    if args.dset in ("all", "dv2017"):
        datasets.append(lambda: DAVISTrainingDataset(args.dv2017, epoch_repeats=8,
                                                     sample_size=3))
    if args.dset in ("all", "yt2018"):
        datasets.append(lambda: YouTubeVOSTrainingDataset(args.yt2018,
                                                          epoch_samples=4000,
                                                          min_seq_length=4,
                                                          sample_size=3))
    if args.dset == "synthetic":
        datasets.append(lambda: SyntheticTrainingDataset(n_samples=32,
                                                         size=(120, 160)))

    mesh = None
    if args.multihost and n_proc > 1:
        # global mesh over every process's devices; --dp is implied (= all)
        from frtm_tpu.parallel.distributed import global_mesh
        mesh = global_mesh()
        if args.batch_size % len(jax.devices()):
            ap.error(f"--batch-size {args.batch_size} must be divisible by "
                     f"the {len(jax.devices())} global devices")
    elif args.dp:
        if args.batch_size % args.dp:
            ap.error(f"--batch-size {args.batch_size} must be divisible by "
                     f"--dp {args.dp}")
        from frtm_tpu.parallel import make_mesh
        mesh = make_mesh(args.dp)
    trainer = Trainer(args.name, model, datasets,
                      checkpoints_path=ws / "checkpoints",
                      log_path=ws / "logs",
                      max_epochs=args.max_epochs, batch_size=args.batch_size,
                      mesh=mesh)
    trainer.train()


if __name__ == "__main__":
    main()
