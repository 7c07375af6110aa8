"""Offline refiner training runtime.

Capability parity with /root/reference/model/training_model.py (TrainerModel)
and /root/reference/lib/training.py (Trainer): per-sample frozen target models
built by GN-CG (or loaded from the target-model cache keyed
{seq}/{frame0:05d}.{obj}.{layer}), refiner-only optimisation with torch-Adam
semantics (L2 weight decay folded into grads, amsgrad) and the StepLR(127,
0.1) schedule, BCE-on-sigmoid loss over the two train frames, IoU accuracy
with the reference's inf->0 / nan->1 convention, per-epoch dataset
resampling, checkpoint save/auto-resume, and cache-hit stats.

TPU-first structure: discriminator initialisation is host-orchestrated (it is
frozen — no gradients flow through it) and cached as npz arrays; the
train step proper is one jitted function — batched feature extraction,
per-sample vmapped classification, decoder forward with train-mode BN,
loss + refiner grads + optax update — so each step is a single XLA program.
The batch axis shards over a data-parallel mesh in parallel/ (pjit inserts
the gradient all-reduce when params are replicated)."""
import time
from collections import defaultdict
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..config import TrackerConfig
from ..models.resnet import extract_features
from ..models.seg_network import seg_network_apply, apply_bn_updates
from ..models.discriminator import (
    DiscParams, init_disc_params, disc_init, disc_apply,
)
from ..models.augmenter import ImageAugmenter
from ..data.training_datasets import SampleSpec
from ..utils.meters import AverageMeter
from ..utils.checkpoints import save_pytree, load_pytree


def iou_accuracy(pred, gt):
    """IoU with the reference's conventions: empty-union -> 0 via inf, and
    0/0 -> 1 (training_model.py:71-85). pred/gt: (B, H, W[,1]) in [0,1]."""
    pred = (pred > 0.5).astype(jnp.float32)
    gt = (gt > 0.5).astype(jnp.float32)
    i = (pred * gt).sum(axis=(-2, -1))
    u = ((pred + gt) > 0.5).astype(jnp.float32).sum(axis=(-2, -1))
    iou = i / u
    iou = jnp.where(jnp.isinf(iou), 0.0, iou)
    iou = jnp.where(jnp.isnan(iou), 1.0, iou)
    return iou


def make_optimizer(learning_rate=1e-3, weight_decay=1e-5):
    """torch.optim.Adam(lr, betas=(0.9, 0.999), weight_decay, amsgrad=True)
    equivalence: L2 decay added to the gradient BEFORE the moment updates.
    BN running stats (buffers, not parameters) are masked out of the decay;
    their gradients are identically zero so amsgrad leaves them untouched.

    Wrapped in inject_hyperparams so the learning rate lives in the opt state
    (a traced value): the host-side StepLR can change it per epoch without
    retriggering compilation."""
    def is_trainable(path, _):
        return not any(getattr(p, "key", None) in ("mean", "var") for p in path)

    def mask_fn(params):
        return jax.tree_util.tree_map_with_path(is_trainable, params)

    @optax.inject_hyperparams
    def make(learning_rate):
        return optax.chain(
            optax.masked(optax.add_decayed_weights(weight_decay), mask_fn),
            optax.amsgrad(learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        )

    return make(learning_rate=learning_rate)


class TModelCache:
    """Target-model cache: per-(sequence, frame0, object, layer) discriminator
    params as npz arrays (the reference's 17 GB torch .pth cache, but the
    state is just two conv kernels — reference training_model.py:168-183)."""

    def __init__(self, path, enable=True, read_only=False):
        self.path = Path(path) if path else None
        self.enable = enable and path is not None
        self.read_only = read_only

    def _fname(self, spec: SampleSpec, layer):
        return self.path / spec.seq_name / ("%05d.%d.%s.npz" % (spec.frame0_id, spec.obj_id, layer))

    def load(self, spec, layer):
        if not self.enable:
            return None
        f = self._fname(spec, layer)
        if not f.exists():
            return None
        try:
            with np.load(f) as z:
                return DiscParams(project=jnp.asarray(z["project"]),
                                  filter=jnp.asarray(z["filter"]))
        except Exception as e:  # tolerate corrupt cache files like the reference
            print(f"Could not read {f}: {e}")
            return None

    def save(self, spec, layer, params: DiscParams):
        if not self.enable or self.read_only:
            return
        f = self._fname(spec, layer)
        f.parent.mkdir(exist_ok=True, parents=True)
        np.savez(f, project=np.asarray(params.project), filter=np.asarray(params.filter))


class TrainerModel:
    """Builds per-sample target models and computes the refiner training step."""

    def __init__(self, cfg: TrackerConfig, backbone_params, refiner_params,
                 tmodel_cache: TModelCache):
        self.cfg = cfg
        self.backbone = backbone_params
        self.refiner = refiner_params
        self.cache = tmodel_cache
        self.augmenter = ImageAugmenter(cfg.aug_params)
        self.arch = cfg.feature_extractor
        self.disc_cfg = cfg.disc
        self._disc_params0 = init_disc_params(jax.random.PRNGKey(0), cfg.disc)

        layers = tuple(sorted(set(cfg.refnet_layers) | {cfg.disc.layer}, reverse=True))
        self._all_layers = layers

        @jax.jit
        def _extract_disc_layer(bb, images):
            return extract_features(bb, images, self.arch,
                                    output_layers=[cfg.disc.layer])

        @jax.jit
        def _init_disc(p0, ft, lb):
            return disc_init(p0, ft, lb, self.disc_cfg)

        # cold-start path: ALL of a batch's cache-miss init solves as ONE
        # vmapped GN-CG program instead of B serial solves (the analog of the
        # reference's 5-day cold start, /root/reference/README.md:144-145;
        # its _initialize loops one Discriminator.init per element,
        # model/training_model.py:117-148)
        @jax.jit
        def _init_disc_batch(p0, ft, lb):
            return jax.vmap(lambda f, l: disc_init(p0, f, l, self.disc_cfg))(
                ft, lb)

        self._extract_disc_layer = _extract_disc_layer
        self._init_disc = _init_disc
        self._init_disc_batch = _init_disc_batch

        cfg_layers = cfg.refnet_layers

        def train_step(refiner, opt_state, bb, disc_batch, images, labels,
                       mask, tx):
            """images: (T, B, H, W, 3); labels: (T, B, H, W, 1); frame 0 is the
            init frame (already consumed by disc init). mask: (B,) float32
            sample validity — the final partial batch of an epoch is padded to
            the static batch size by cyclically repeating its samples, and pad
            rows carry mask 0 so loss/accuracy/gradients are exactly those of
            the real remainder (the reference's DataLoader trains on the
            remainder, drop_last=False, /root/reference/lib/training.py:121-122;
            static TPU shapes forbid a smaller last program). BN batch
            statistics DO see the pad rows; since pads are repeats of the
            remainder, the stats are the remainder's own, reweighted by at
            most one extra repeat per sample — the one (documented) deviation
            from the reference's remainder-batch statistics. Returns new
            refiner, opt_state, stats."""
            T, B = images.shape[0], images.shape[1]
            im_size = images.shape[2:4]
            n_valid = jnp.maximum(mask.sum(), 1.0)

            def loss_fn(refiner):
                total = 0.0
                accs = []
                bn_final = None
                # ref_t chains BN running-stat updates across the train
                # frames (the reference's train-mode forwards each fold
                # momentum-updated stats: new = 0.9*prev + 0.1*batch_t per
                # frame, model/training_model.py:150-166). The stats are
                # stop-gradient'd and unused by train-mode normalisation, so
                # the chaining is pure bookkeeping with no grad effect.
                ref_t = refiner
                for t in range(1, T):
                    feats = extract_features(bb, images[t], self.arch,
                                             output_layers=cfg_layers)
                    ft = feats[self.disc_cfg.layer]
                    scores = jax.vmap(lambda p, x: disc_apply(p, x[None])[0][0])(
                        disc_batch, ft)
                    logits, bn_updates = seg_network_apply(
                        ref_t, scores, feats, im_size, layers=cfg_layers,
                        train_bn=True)
                    ref_t = apply_bn_updates(ref_t, bn_updates)
                    pred = jax.nn.sigmoid(logits)
                    y = labels[t].astype(jnp.float32)
                    eps = 1e-7
                    p = jnp.clip(pred, eps, 1 - eps)
                    # per-sample pixel-mean BCE, masked mean over the batch
                    # (identical to the reference's batch mean when mask is
                    # all-ones: every sample has the same pixel count)
                    bce_s = -(y * jnp.log(p)
                              + (1 - y) * jnp.log(1 - p)).mean(axis=(1, 2, 3))
                    total = total + (bce_s * mask).sum() / n_valid
                    accs.append(iou_accuracy(pred[..., 0], y[..., 0]) * mask)
                    bn_final = bn_updates  # last frame's dicts hold the
                    # fully-chained running stats (computed FROM ref_t)
                acc = jnp.stack(accs).sum() / (n_valid * (T - 1))
                return total, (acc, bn_final)

            (loss, (acc, bn_updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(refiner)
            updates, opt_state = tx.update(grads, opt_state, refiner)
            refiner = optax.apply_updates(refiner, updates)
            refiner = apply_bn_updates(refiner, bn_updates)
            return refiner, opt_state, {"stats/loss": loss / (T - 1),
                                        "stats/accuracy": acc}

        self._train_step = train_step

    # ------------------------------------------------------------------

    def build_disc_batch(self, first_images, first_labels, specs):
        """Per batch element: cache hit -> load frozen params; miss -> augment,
        extract, GN-CG init, save (reference training_model.py:117-148).
        Returns (stacked DiscParams (B, ...), cache_hits).

        Cold-start misses are solved TOGETHER: one chunked feature-extraction
        dispatch over every miss's augmented frames, then one vmapped GN-CG
        init program over the miss axis (padded to a power of two so program
        shapes are shared) — instead of the reference's one-solve-per-element
        loop. Duplicate specs in one batch (partial-batch pads) are solved
        once and counted as hits like the reference's immediate-save-then-
        load-again behavior would."""
        L = self.disc_cfg.layer
        params_list = [None] * len(specs)
        hits = 0
        unique_misses = {}   # (seq, frame0, obj) -> [batch indices]
        for i, spec in enumerate(specs):
            cached = self.cache.load(spec, L)
            if cached is not None:
                params_list[i] = cached
                hits += 1
                continue
            key = (spec.seq_name, spec.frame0_id, spec.obj_id)
            if key in unique_misses:
                hits += 1  # same-batch duplicate: the reference would re-read
                # the file its first occurrence just saved
            unique_misses.setdefault(key, []).append(i)

        if unique_misses:
            keys = list(unique_misses)
            ims, lbs = [], []
            for k, key in enumerate(keys):
                i = unique_misses[key][0]
                rng = np.random.RandomState(0)
                im_aug, lb_aug = self.augmenter.augment_first_frame(
                    np.asarray(first_images[i]), np.asarray(first_labels[i]),
                    rng, copy=(k != len(keys) - 1))
                ims.append(np.asarray(im_aug, np.uint8))
                lbs.append(np.asarray(lb_aug, np.uint8))
            M = len(keys)
            Mp = 1 << (M - 1).bit_length()  # program-shape bucket
            ims += [ims[-1]] * (Mp - M)
            lbs += [lbs[-1]] * (Mp - M)
            K = ims[0].shape[0]
            flat = np.concatenate(ims)                      # (Mp*K, H, W, 3)
            ft = self._extract_flat(flat)                   # (Mp*K, h, w, C)
            ft = ft.reshape((Mp, K) + ft.shape[1:])
            params_b, _ = self._init_disc_batch(
                self._disc_params0, ft, jnp.asarray(np.stack(lbs)))
            for k, key in enumerate(keys):
                p = jax.tree.map(lambda x: x[k], params_b)
                self.cache.save(specs[unique_misses[key][0]], L, p)
                for i in unique_misses[key]:
                    params_list[i] = p
        disc_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        return disc_batch, hits

    def _extract_flat(self, frames_np, chunk: int = 32):
        """Disc-layer features for a flat frame batch, extracted in fixed-size
        chunks (bounds activation memory; pads the tail so at most two
        program shapes exist)."""
        L = self.disc_cfg.layer
        N = frames_np.shape[0]
        if N <= chunk:
            return self._extract_disc_layer(self.backbone,
                                            jnp.asarray(frames_np))[L]
        outs = []
        for s in range(0, N, chunk):
            part = frames_np[s:s + chunk]
            pad = chunk - part.shape[0]
            if pad:
                part = np.concatenate(
                    [part, np.repeat(part[-1:], pad, axis=0)])
            f = self._extract_disc_layer(self.backbone, jnp.asarray(part))[L]
            outs.append(f[:chunk - pad] if pad else f)
        return jnp.concatenate(outs)


class Trainer:
    """Epoch loop with per-epoch dataset resampling, checkpointing with
    auto-resume, and console/JSONL stats (reference lib/training.py)."""

    def __init__(self, name, model: TrainerModel, datasets, checkpoints_path,
                 log_path, max_epochs=260, batch_size=16, lr=1e-3,
                 lr_step=127, lr_gamma=0.1, weight_decay=1e-5,
                 load_latest=True, save_interval=1, mesh=None,
                 prefetch=True):
        """:param mesh: optional jax.sharding.Mesh — when given, the train
        step runs data-parallel over its 'data' axis (batch sharded, params
        replicated; GSPMD inserts the gradient all-reduce and BN statistics
        become global).
        :param prefetch: assemble the next batch (dataset reads, frame
        decode, stacking) on a background thread while the device runs the
        current step — the TPU-native stand-in for the reference DataLoader's
        num_workers=8 (/root/reference/train.py:132); one look-ahead worker
        is the right amount on a 1-core host. Bit-identical training
        (test_trainer pins the loss trajectory prefetch on vs off)."""
        self.name = name
        self.model = model
        self.datasets = datasets        # list of factory callables -> dataset
        self.checkpoints_path = Path(checkpoints_path) / name
        self.checkpoints_path.mkdir(exist_ok=True, parents=True)
        self.log_path = Path(log_path) / name
        self.log_path.mkdir(exist_ok=True, parents=True)
        self.epoch = 0
        self.max_epochs = max_epochs
        self.batch_size = batch_size
        self.base_lr = lr
        self.lr_step = lr_step
        self.lr_gamma = lr_gamma
        self.save_interval = save_interval
        self.prefetch = prefetch
        self.stats = defaultdict(AverageMeter)
        self.mesh = mesh
        # multi-host: every process runs this same loop over the GLOBAL mesh;
        # each materializes only its own batch rows (parallel/distributed.py)
        self._n_proc = jax.process_count()
        self._pid = jax.process_index()
        if self._n_proc > 1 and mesh is None:
            raise ValueError("multi-process training requires a global mesh "
                             "(Trainer(mesh=global_mesh()))")

        # lr lives in the opt state (inject_hyperparams); StepLR sets it per epoch
        self._lr = lambda: self.base_lr * (self.lr_gamma ** ((self.epoch - 1) // self.lr_step))
        self.tx = make_optimizer(self.base_lr, weight_decay)
        self.opt_state = self.tx.init(self.model.refiner)

        if mesh is not None:
            from ..parallel.train_step import make_sharded_train_step
            self._jit_step = make_sharded_train_step(self.model._train_step,
                                                     mesh, self.tx)
        else:
            self._jit_step = jax.jit(
                lambda refiner, opt_state, bb, disc, images, labels, mask:
                self.model._train_step(refiner, opt_state, bb, disc, images,
                                       labels, mask, self.tx))

        if load_latest:
            ckpts = sorted(self.checkpoints_path.glob(f"{name}_ep*.npz"))
            if ckpts:
                self.load_checkpoint(ckpts[-1])

    # -- checkpointing ------------------------------------------------------

    def save_checkpoint(self):
        tree = dict(name=self.name, epoch=self.epoch,
                    refiner=self.model.refiner, opt_state=self.opt_state)
        save_pytree(self.checkpoints_path / ("%s_ep%04d" % (self.name, self.epoch)), tree)

    def load_checkpoint(self, file):
        print("Loading checkpoint", file)
        tree = load_pytree(file)
        self.epoch = int(tree["epoch"])
        self.model.refiner = tree["refiner"]
        self.opt_state = tree["opt_state"]
        print("Starting epoch", self.epoch + 1)

    # -- training loop ------------------------------------------------------

    def _batches(self, dataset):
        """Yields (images, labels, specs, mask). The final partial batch is
        padded to batch_size by cyclically repeating its samples with mask 0
        (the reference trains on the remainder — drop_last defaults False,
        /root/reference/lib/training.py:121-122 — and static TPU shapes
        forbid a smaller last program; the masked step makes loss/grads
        exactly the remainder's, see TrainerModel.train_step)."""
        if self._n_proc > 1:
            # every process must agree on the epoch's batch order (they run
            # the same global-mesh program); an epoch-seeded draw replaces
            # the global-RNG draw, and each process materializes only the
            # contiguous row range its devices own
            order = np.random.RandomState(self.epoch).permutation(len(dataset))
        else:
            order = np.random.permutation(len(dataset))
        for start in range(0, len(order), self.batch_size):
            idx = list(order[start:start + self.batch_size])
            n_real = len(idx)
            idx += [idx[i % n_real] for i in range(self.batch_size - n_real)]
            if self._n_proc > 1:
                from ..parallel.distributed import batch_rows
                lo, hi = batch_rows(self.batch_size, self._pid, self._n_proc)
                local_idx = idx[lo:hi]
            else:
                local_idx = idx
            samples = [dataset[int(i)] for i in local_idx]
            T = len(samples[0][0])
            images = np.stack([np.stack([s[0][t] for s in samples]) for t in range(T)])
            labels = np.stack([np.stack([s[1][t] for s in samples]) for t in range(T)])
            specs = SampleSpec.from_encoded([s[2] for s in samples])
            mask = np.zeros(self.batch_size, np.float32)
            mask[:n_real] = 1.0
            if self._n_proc > 1:
                mask = mask[lo:hi]  # this process's rows of the global mask
            # native dtype (uint8 for real datasets): the device casts where
            # needed (extract_features normalises any 0-255 dtype, the loss
            # casts labels) and the tunnel uploads 4x fewer bytes than f32
            yield images, labels, specs, mask

    def _feed(self, disc_batch, images, labels, mask):
        """Device-feed one batch. Single process: plain uploads (the jitted
        step's in_shardings place them). Multi-process: each leaf holds only
        this process's rows; wrap them into global batch-sharded jax.Arrays
        over the global mesh (no cross-host transfer — every process feeds
        the rows its own devices own)."""
        if self._n_proc == 1:
            return (disc_batch, jnp.asarray(images), jnp.asarray(labels),
                    jnp.asarray(mask))
        from ..parallel.distributed import global_batch
        g = lambda a, ax: global_batch(self.mesh, a, ax)
        # np.asarray downloads cold-start disc rows that were just solved on
        # device — deliberate: a per-row target model is two tiny convs
        # (~10 KB/row at the training config), so the round trip is noise
        # next to the (T, B, H, W, 3) image upload it accompanies
        disc_batch = jax.tree.map(lambda x: g(np.asarray(x), 0), disc_batch)
        return disc_batch, g(images, 1), g(labels, 1), g(mask, 0)

    def _prefetched(self, it):
        """One-ahead background batch assembly (utils/prefetch.py): the
        generator body (dataset reads, decode, np.stack) runs on the worker
        while the device step executes. Only the worker touches the iterator,
        so the epoch's np.random.permutation draw happens on it exactly as it
        would inline — same global-RNG sequence, bit-identical batches
        (pinned by test_prefetched_training_matches_inline)."""
        from ..utils.prefetch import prefetch_iter
        return prefetch_iter(it, enabled=self.prefetch)

    def _tb_writer(self):
        """Optional TensorBoard writer (the reference logs per-epoch scalars
        via SummaryWriter, lib/training.py:104-110); JSONL is the primary log."""
        if self._pid != 0:
            return None  # one writer per run under multi-host
        try:
            from torch.utils.tensorboard import SummaryWriter
            return SummaryWriter(str(self.log_path))
        except Exception:
            return None

    def train(self):
        log_file = open(self.log_path / "stats.jsonl", "a")
        tb = self._tb_writer()
        for epoch in range(self.epoch + 1, self.max_epochs + 1):
            self.epoch = epoch
            self.stats = defaultdict(AverageMeter)

            datasets = [f() for f in self.datasets]  # fresh random samples
            merged = _ConcatDataset(datasets)

            runtime = AverageMeter()
            t0 = None
            n_batches = -(-len(merged) // self.batch_size)
            for i, (images, labels, specs, mask) in enumerate(
                    self._prefetched(self._batches(merged)), 1):
                t0 = time.time() if t0 is None else t0
                self.opt_state.hyperparams["learning_rate"] = jnp.asarray(self._lr())
                disc_batch, hits = self.model.build_disc_batch(
                    images[0], labels[0], specs)
                disc_batch, images_d, labels_d, mask_d = self._feed(
                    disc_batch, images, labels, mask)
                self.model.refiner, self.opt_state, stats = self._jit_step(
                    self.model.refiner, self.opt_state, self.model.backbone,
                    disc_batch, images_d, labels_d, mask_d)
                jax.block_until_ready(self.model.refiner)
                runtime.update(time.time() - t0)
                t0 = time.time()

                stats = {k: float(v) for k, v in stats.items()}
                stats["stats/fcache_hits"] = hits
                stats["stats/lr"] = self._lr()
                for k, v in stats.items():
                    self.stats[k].update(v)
                sps = self.batch_size / max(runtime.val, 1e-9)
                print(f"{epoch}: {i}/{n_batches}, sps={sps:.2f} "
                      f"({self.batch_size / max(runtime.avg, 1e-9):.2f}), "
                      + ", ".join(f"{k.split('/')[-1]}={m.val:.5f} ({m.avg:.5f})"
                                  for k, m in self.stats.items()))

            if self.epoch % self.save_interval == 0 and self._pid == 0:
                self.save_checkpoint()  # params are replicated: one writer
            import json as _json
            if self._pid == 0:
                print(_json.dumps(
                    {"epoch": self.epoch,
                     **{k: m.avg for k, m in self.stats.items()}}),
                    file=log_file, flush=True)
            if tb is not None:
                for k, m in self.stats.items():
                    tb.add_scalar(k, m.avg, self.epoch)
        if tb is not None:
            tb.close()
        log_file.close()
        print("%s done" % self.name)


class _ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, i):
        k = int(np.searchsorted(self._offsets, i, side="right") - 1)
        return self.datasets[k][i - int(self._offsets[k])]
