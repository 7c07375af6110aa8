"""Inference tracker runtime — the per-sequence / per-frame online VOS loop.

Capability parity with /root/reference/model/tracker.py (Tracker /
TargetObject): per-object target models initialised at their start frames
(mid-sequence entry for YouTubeVOS), per-frame classify -> refine -> soft
multi-object aggregation `softmax(p/(1-p))` with background = min(1-fg),
suppression of existing masks under newly-initialised objects, mutual
exclusion by argmax one-hot, per-object pseudo-label updates, indexed-PNG
output, per-sequence FPS accounting, and the reference's per-object RNG
reseed determinism hack (tracker.py:178-180).

TPU-first structure: a thin host loop drives jit-compiled device steps —
feature extraction, discriminator init (the full GN-CG solve is one XLA
computation), classify+refine, mask merging, and the online update (whose
every-8th-frame re-solve is a lax.cond on device). Jitted steps are cached
per (image size, object count), so a dataset pass compiles a handful of
programs and then runs entirely on-device per frame. Cross-sequence batching
lives in parallel/ (sequence-level data parallelism)."""
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import TrackerConfig
from ..models.resnet import extract_features
from ..models.seg_network import seg_network_apply
from ..models.discriminator import (
    DiscParams, DiscState, init_disc_params,
    disc_init, disc_apply, disc_update,
)
from ..models.augmenter import ImageAugmenter
from ..data.image import imwrite_indexed
from ..utils.meters import AverageMeter


@dataclass
class TargetObject:
    object_id: int
    index: int              # row in the mask stack (background = 0)
    start_frame: int
    start_mask: np.ndarray  # (H, W) float 0/1
    params: DiscParams
    state: DiscState
    current_sample: Optional[jnp.ndarray] = None  # compressed features (h, w, c)


def merge_soft_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """Soft aggregation + mutual exclusion (reference tracker.py:214-221).
    masks: (n_obj+1, H, W); row 0 is background."""
    if masks.shape[0] == 2:
        # single object: the 2-way softmax over [bg, fg] odds is exactly the
        # sigmoid of the odds difference (softmax([a,b])[1] == sigmoid(b-a)
        # to float rounding), and argmax is a sign test — same math as the
        # general branch in ~half the full-resolution element-wise passes.
        # Ties (p == 0.5) go to background, matching argmax's first-max rule.
        p = jnp.clip(masks[1], 1e-7, 1 - 1e-7)
        r1 = p / (1.0 - p)
        r0 = (1.0 - p) / p
        win = (r1 > r0).astype(masks.dtype)
        s1 = jax.nn.sigmoid(r1 - r0)
        s0 = jax.nn.sigmoid(r0 - r1)
        return jnp.stack([s0 * (1.0 - win), s1 * win])
    p = jnp.clip(masks, 1e-7, 1 - 1e-7)
    bg = jnp.min(1.0 - p[1:], axis=0)
    p = p.at[0].set(bg)
    segs = jax.nn.softmax(p / (1.0 - p), axis=0)
    inds = jnp.argmax(segs, axis=0)
    onehot = jax.nn.one_hot(inds, masks.shape[0], axis=0, dtype=segs.dtype)
    return segs * onehot


def masks_to_labels(masks: jnp.ndarray, object_ids: jnp.ndarray) -> jnp.ndarray:
    """Exclusive soft masks -> label image via the same aggregation
    (reference run_sequence, tracker.py:144-150).

    The tiny LUT is applied as an unrolled chain of N full-res selects:
    pixel-indexed gathers (`lut[idx]`) lower to (v5e-measured) 24 ms/window
    scatter-gather ops inside vmapped scan bodies, and the earlier one-hot
    contraction lowered to a row-bound full-res dot_general that dominated
    the multi-object scan (round-3 trace: the N=2 scan's dot time tripled);
    the where-chain is pure fusable VPU work."""
    if object_ids.shape[0] == 2:  # background + 1 object
        return jnp.where(masks[1] > 0.5, object_ids[1], object_ids[0])
    p = jnp.clip(masks, 1e-7, 1 - 1e-7)
    p = p.at[0].set(jnp.min(1.0 - p[1:], axis=0))
    segs = jax.nn.softmax(p / (1.0 - p), axis=0)
    idx = jnp.argmax(segs, axis=0)
    out = jnp.broadcast_to(object_ids[0], idx.shape)
    for k in range(1, object_ids.shape[0]):
        out = jnp.where(idx == k, object_ids[k], out)
    return out.astype(object_ids.dtype)


class Tracker:

    def __init__(self, cfg: TrackerConfig, backbone_params, refiner_params):
        self.cfg = cfg
        self.backbone = backbone_params
        self.refiner = refiner_params
        self.augmenter = ImageAugmenter(cfg.aug_params)
        self.arch = cfg.feature_extractor
        self.disc_cfg = cfg.disc
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # Multi-layer target models (legacy stack): one discriminator per
        # layer in cfg.disc_layers; single-layer (the shipped config) otherwise.
        self._multilayer = len(cfg.disc_layers) > 0
        if self._multilayer:
            from dataclasses import replace as _dc_replace
            from ..models.resnet import resnet_out_channels
            from ..models.multilayer import ml_init_params
            ch = resnet_out_channels(cfg.feature_extractor)
            self._ml_cfgs = {L: _dc_replace(cfg.disc, in_channels=ch[L], layer=L)
                             for L in cfg.disc_layers}
            self._disc_layers = tuple(cfg.disc_layers)
            self._disc_params0 = ml_init_params(jax.random.PRNGKey(0), self._ml_cfgs)
        else:
            self._disc_layers = (cfg.disc.layer,)
            # params0 is fixed (the reference re-creates a torch-default-
            # initialised Discriminator under manual_seed(0) per object)
            self._disc_params0 = init_disc_params(jax.random.PRNGKey(0), cfg.disc)

        layers = tuple(sorted(set(cfg.refnet_layers) | set(self._disc_layers),
                              reverse=True))
        self._all_layers = layers

        # --- jitted device steps (cached per shape) ---

        @jax.jit
        def _extract(params, images):
            return extract_features(params, images, self.arch,
                                    output_layers=self._all_layers, dtype=self.dtype)

        @jax.jit
        def _extract_disc_layer(params, images):
            return extract_features(params, images, self.arch,
                                    output_layers=list(self._disc_layers),
                                    dtype=self.dtype)

        if self._multilayer:
            from ..models.multilayer import (
                ml_disc_init, ml_disc_apply, ml_disc_update,
            )

            @jax.jit
            def _init_disc(p0, fts, lb):
                return ml_disc_init(p0, fts, lb, self._ml_cfgs)

            @partial(jax.jit, static_argnums=(3,))
            def _classify_refine(dparams, refiner, features, im_size):
                fts = {L: features[L] for L in self._disc_layers}
                scores, cfts = ml_disc_apply(dparams, fts, self._ml_cfgs)
                logits = seg_network_apply(refiner, scores,
                                           {L: features[L] for L in cfg.refnet_layers},
                                           im_size, layers=cfg.refnet_layers)
                return (jax.nn.sigmoid(logits[0, :, :, 0]),
                        {L: c[0] for L, c in cfts.items()})

            @jax.jit
            def _update(dparams, dstate, cfts, y):
                return ml_disc_update(dparams, dstate, cfts, y[..., None],
                                      self._ml_cfgs)
        else:
            @jax.jit
            def _init_disc(p0, fts, lb):
                return disc_init(p0, fts[cfg.disc.layer], lb, self.disc_cfg)

            @partial(jax.jit, static_argnums=(3,))
            def _classify_refine(dparams, refiner, features, im_size):
                ft = features[cfg.disc.layer]
                scores, cft = disc_apply(dparams, ft,
                                         clamp_output=cfg.disc.clamp_output)
                logits = seg_network_apply(refiner, scores,
                                           {L: features[L] for L in cfg.refnet_layers},
                                           im_size, layers=cfg.refnet_layers)
                return jax.nn.sigmoid(logits[0, :, :, 0]), cft[0]

            @jax.jit
            def _update(dparams, dstate, cft, y):
                return disc_update(dparams, dstate, cft, y[..., None], self.disc_cfg)

        self._extract = _extract
        self._extract_disc_layer = _extract_disc_layer
        self._init_disc = _init_disc
        self._classify_refine = _classify_refine
        self._update = _update
        self._merge = jax.jit(merge_soft_masks)
        self._labels = jax.jit(masks_to_labels)

        self.targets: Dict[int, TargetObject] = {}
        self.current_frame = 0
        self.current_masks: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------

    def clear(self):
        self.targets = {}
        self.current_frame = 0
        self.current_masks = None

    def initialize(self, image: np.ndarray, labels: np.ndarray, new_objects):
        """Create and solve a target model per new object
        (reference tracker.py:165-191)."""
        H, W = image.shape[:2]
        n_rows = len(self.targets) + len(new_objects) + 1
        self.current_masks = jnp.zeros((n_rows, H, W), jnp.float32)

        for obj_id in new_objects:
            mask = (np.asarray(labels).squeeze() == obj_id).astype(np.float32)
            rng = np.random.RandomState(0)  # determinism hack, as the reference
            im_aug, lb_aug = self.augmenter.augment_first_frame(
                image, mask[..., None], rng)
            ft = self._extract_disc_layer(self.backbone, jnp.asarray(im_aug))
            params, state = self._init_disc(self._disc_params0, ft,
                                            jnp.asarray(lb_aug))
            t = TargetObject(object_id=obj_id, index=len(self.targets) + 1,
                             start_frame=self.current_frame, start_mask=mask,
                             params=params, state=state)
            self.targets[obj_id] = t
            self.current_masks = self.current_masks.at[t.index].set(jnp.asarray(mask))

    def track(self, image: np.ndarray) -> jnp.ndarray:
        """Classify, refine, merge, update (reference tracker.py:193-227)."""
        im_size = image.shape[:2]
        features = self._extract(self.backbone, jnp.asarray(image)[None])

        tracked = [t for t in self.targets.values() if t.start_frame < self.current_frame]
        fresh = [t for t in self.targets.values() if t.start_frame == self.current_frame]

        for t in tracked:
            y, cft = self._classify_refine(t.params, self.refiner, features, im_size)
            t.current_sample = cft
            self.current_masks = self.current_masks.at[t.index].set(y)

        # Suppress tracked masks under newly-initialised objects' start masks
        for t_new in fresh:
            sup = 1.0 - jnp.asarray(t_new.start_mask)
            for t_old in tracked:
                self.current_masks = self.current_masks.at[t_old.index].multiply(sup)

        self.current_masks = self._merge(self.current_masks)

        for t in tracked:
            t.params, t.state = self._update(t.params, t.state, t.current_sample,
                                             self.current_masks[t.index])
        return self.current_masks

    # ------------------------------------------------------------------

    def run_sequence(self, sequence, speedrun: bool = False):
        """Track one sequence; returns (list of (H,W) uint8 label images, fps)."""
        self.clear()
        obj_ids_lut = jnp.asarray([0] + list(sequence.obj_ids), jnp.int32)

        if speedrun:
            # warm-up pass on frame 0 so compile time isn't measured
            image, labels, new_objects = sequence[0]
            if len(new_objects) > 0:
                self.initialize(image, labels, new_objects)
                self.current_frame = 1
                self.track(image)
            self.clear()

        outputs = []
        n = 0
        t0 = time.time()
        for i in range(len(sequence)):
            image, labels, new_objects = sequence[i]
            old_objects = list(self.targets.keys())

            if len(new_objects) > 0:
                self.initialize(image, labels, new_objects)

            if len(old_objects) > 0:
                masks = self.track(image)
                out = self._labels(masks, obj_ids_lut)
            elif len(new_objects) > 0:
                out = jnp.asarray(np.asarray(labels).squeeze().astype(np.uint8))
            else:
                out = jnp.zeros(image.shape[:2], jnp.uint8)

            outputs.append(out)
            self.current_frame += 1
            n += 1

        jax.block_until_ready(outputs)
        fps = n / max(time.time() - t0, 1e-9)
        return [np.asarray(o).astype(np.uint8) for o in outputs], fps

    def run_dataset(self, dataset, out_path, speedrun=False, restart=None):
        """Track every sequence, write indexed PNGs, report average FPS
        (reference tracker.py:68-101)."""
        from pathlib import Path
        out_path = Path(out_path)
        out_path.mkdir(exist_ok=True, parents=True)
        fps_meter = AverageMeter()

        print("Evaluating", dataset.name)
        restarted = False
        for sequence in dataset:
            if restart is not None and not restarted:
                if sequence.name != restart:
                    continue
                restarted = True
            if hasattr(sequence, "preload"):
                sequence.preload()
            outputs, seq_fps = self.run_sequence(sequence, speedrun)
            fps_meter.update(seq_fps)
            print(f"{sequence.name}: {seq_fps:.2f} fps")

            dst = out_path / sequence.name
            dst.mkdir(exist_ok=True)
            for lb, f in zip(outputs, sequence.frame_names):
                imwrite_indexed(dst / (f + ".png"), lb)

        print("Average frame rate: %.2f fps" % fps_meter.avg)
        return fps_meter.avg
