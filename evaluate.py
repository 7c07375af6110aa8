#!/usr/bin/env python
"""Evaluate the tracker on a VOS validation dataset.

CLI-surface parity with /root/reference/evaluate.py (--model/--dset/--dev/
--fast, reference lines 130-136), with the --fast schedule properly wired
into the solver (the reference parses it but never passes it to Parameters —
SURVEY.md §3.1). Dataset roots come from flags instead of the reference's
edit-this-file paths dict.

Usage:
  python evaluate.py --model rn101_all.pth --dset dv2017val \\
      --davis /data/DAVIS --backbone resnet101.pth --output /data/results
"""
import argparse
import sys
from pathlib import Path


def main():
    ap = argparse.ArgumentParser(description="Evaluate FRTM-TPU on a validation dataset")
    ap.add_argument("--model", type=str, required=True,
                    help="refiner weights: a reference .pth or a native .npz")
    ap.add_argument("--dset", type=str, required=True,
                    choices=["dv2016val", "dv2017val", "yt2018jjval", "yt2018val"])
    ap.add_argument("--dev", type=str, default="tpu",
                    help="jax platform to run on (tpu/cpu)")
    ap.add_argument("--fast", action="store_true",
                    help="use the reduced optimizer schedule (FRTM-fast)")
    ap.add_argument("--davis", type=str, default="/data/DAVIS", help="DAVIS root")
    ap.add_argument("--yt2018", type=str, default="/data/ytvos2018",
                    help="YouTubeVOS 2018 root")
    ap.add_argument("--output", type=str, default="results", help="output root")
    ap.add_argument("--backbone", type=str, default=None,
                    help="torchvision-format resnet .pth (backbones are not "
                         "part of FRTM checkpoints)")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16"], help="backbone/refiner compute dtype")
    ap.add_argument("--restart", type=str, default=None,
                    help="sequence name to restart from (debugging)")
    ap.add_argument("--engine", type=str, default="fused",
                    choices=["fused", "host", "sharded"],
                    help="fused = one-scan-program fast path; host = frame-at-"
                         "a-time reference-semantics loop; sharded = batch "
                         "sequences across all devices")
    ap.add_argument("--spatial", type=int, default=0,
                    help="fused engine: shard each frame's height over N "
                         "devices ('spatial' mesh axis, GSPMD halo exchange) "
                         "— multi-chip single-sequence latency mode")
    ap.add_argument("--multihost", action="store_true",
                    help="initialize jax.distributed and partition the "
                         "dataset's sequences round-robin across processes "
                         "(each host tracks its share on its own devices — "
                         "no cross-host collectives). No-ops gracefully on "
                         "a single host. See docs/MULTIHOST.md.")
    ap.add_argument("--pipeline", action="store_true",
                    help="fused/sharded engines: prefetch the next sequence "
                         "(or chunk)'s host prep — decode, uploads, "
                         "augmentation — during the current scan (faster "
                         "dataset wall; fused per-sequence fps then excludes "
                         "augment and is not protocol-comparable)")
    ap.add_argument("--aug-compact", choices=("auto", "on", "off"),
                    default="auto",
                    help="fused engine: ship augment batches in the compact "
                         "device-composed encoding (~1.1 MB/object instead "
                         "of ~5 over remote links). auto = on for TPU. "
                         "'off' avoids per-shape init recompiles on "
                         "datasets with highly varied object sizes")
    args = ap.parse_args()

    import jax
    if args.dev in ("cpu", "tpu"):
        try:
            jax.config.update("jax_platforms", args.dev if args.dev != "tpu" else None)
        except Exception:
            pass

    from frtm_tpu.config import eval_config
    from frtm_tpu.models import init_resnet
    from frtm_tpu.runtime.tracker import Tracker
    from frtm_tpu.data.datasets import DAVISDataset, YouTubeVOSDataset
    from frtm_tpu.eval.evaluation import evaluate_dataset
    from frtm_tpu.utils import checkpoints as ckpt

    # Model weights + backbone autodetection
    model_path = Path(args.model)
    if not model_path.exists():
        print(f"Model file '{model_path}' not found.")
        sys.exit(1)
    if model_path.suffix == ".pth":
        arch, refiner = ckpt.load_reference_model(model_path)
    else:
        tree = ckpt.load_pytree(model_path)
        arch, refiner = tree["arch"], tree["refiner"]

    cfg = eval_config(arch, fast=args.fast, compute_dtype=args.dtype)

    if args.backbone:
        backbone = ckpt.load_backbone(args.backbone, arch)
    else:
        print("WARNING: no --backbone weights given; using random backbone "
              "(benchmark-only; J&F will be meaningless).")
        backbone = init_resnet(jax.random.PRNGKey(0), arch)

    datasets = dict(
        dv2016val=lambda **kw: DAVISDataset(path=args.davis, year="2016", split="val", **kw),
        dv2017val=lambda **kw: DAVISDataset(path=args.davis, year="2017", split="val", **kw),
        yt2018jjval=lambda **kw: YouTubeVOSDataset(path=args.yt2018, year="2018",
                                                   split="jjval_all_frames", **kw),
        yt2018val=lambda **kw: YouTubeVOSDataset(path=args.yt2018, year="2018",
                                                 split="valid_all_frames", **kw),
    )
    dset = datasets[args.dset]()

    ex_name = dset.name + "-" + model_path.stem + ("_fast" if args.fast else "")
    out_path = Path(args.output).expanduser().resolve() / ex_name
    out_path.mkdir(exist_ok=True, parents=True)

    pid, n_proc = 0, 1
    if args.multihost:
        from frtm_tpu.parallel.distributed import init_distributed, process_slice
        pid, n_proc = init_distributed()
        if n_proc > 1:
            # sequences are independent: each process tracks its round-robin
            # share on its own devices and writes into the shared out_path —
            # pod-scale inference with zero cross-host collectives
            seqs = list(dset)
            keep = set(process_slice(len(seqs), pid, n_proc))

            class _SubsetView(list):
                """This process's round-robin share, keeping the dataset
                attributes the engines read (run_dataset prints .name)."""
                name = dset.name
            dset_run = _SubsetView(s for i, s in enumerate(seqs) if i in keep)
            print(f"multihost: process {pid}/{n_proc} tracking "
                  f"{len(dset_run)}/{len(seqs)} sequences")
        else:
            dset_run = dset
    else:
        dset_run = dset

    if args.pipeline and args.engine == "host":
        print("WARNING: --pipeline applies to the fused/sharded engines "
              "only; ignored for --engine host.")
    if args.spatial and args.engine != "fused":
        print("WARNING: --spatial applies to the fused engine only; "
              f"ignored for --engine {args.engine}.")

    if args.engine == "host":
        tracker = Tracker(cfg, backbone, refiner)
        tracker.run_dataset(dset_run, out_path,
                            speedrun=args.dset == "dv2016val",
                            restart=args.restart)
    elif args.engine == "sharded":
        from frtm_tpu.parallel import ShardedSequenceTracker
        if n_proc > 1:
            from frtm_tpu.parallel.distributed import local_mesh
            mesh = local_mesh()   # this host's devices; no cross-host program
        else:
            from frtm_tpu.parallel import make_mesh
            mesh = make_mesh()
        tracker = ShardedSequenceTracker(cfg, backbone, refiner, mesh)
        # streaming: decode/track/write/release one mesh-sized chunk at a
        # time — memory stays bounded on hundred-sequence datasets
        tracker.run_dataset(dset_run, out_path, restart=args.restart,
                            pipeline=args.pipeline)
    else:  # fused (default)
        from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
        sp_mesh = None
        if args.spatial:
            from frtm_tpu.parallel import make_spatial_mesh
            # multihost: spatial-shard on THIS process's devices only — a
            # mesh over jax.devices() would span hosts and build programs
            # this process cannot dispatch (inference here is share-nothing
            # across processes by design)
            sp_devs = jax.local_devices() if n_proc > 1 else None
            sp_mesh = make_spatial_mesh(n_spatial=args.spatial,
                                        devices=sp_devs)
        aug_compact = {"auto": None, "on": True, "off": False}[args.aug_compact]
        tracker = BatchedSequenceTracker(cfg, backbone, refiner,
                                         extract_chunk=16, mesh=sp_mesh,
                                         aug_compact=aug_compact)
        tracker.run_dataset(dset_run, out_path,
                            speedrun=args.dset == "dv2016val",
                            restart=args.restart, pipeline=args.pipeline)

    if n_proc > 1:
        # all processes must have written their PNGs before rank 0 scores
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("frtm_eval_outputs_done")
        if pid != 0:
            return

    dset.all_annotations = True
    print("\nComputing J-scores")
    evaluate_dataset(dset, out_path, measure="J")
    print("\nComputing F-scores")
    evaluate_dataset(dset, out_path, measure="F")


if __name__ == "__main__":
    main()
