"""Fused sequence tracker — the TPU-native fast path.

The reference processes one frame at a time on the hot path
(/root/reference/model/tracker.py:193-227): extract -> per-object classify ->
refine -> merge -> update, all as separate host-driven calls. Two structural
facts let a TPU do much better (SURVEY.md §5 'long-context' analysis):

  1. The backbone is frozen and stateless, so feature extraction for the
     WHOLE sequence batches over frames and runs at full MXU utilisation
     before tracking starts. Likewise the per-object projection (fixed after
     init) compresses all frames up front.
  2. The remaining per-frame dependency chain (filter -> mask -> memory ->
     every-8th-frame re-solve) is small, static-shaped state — exactly what
     `lax.scan` wants. The whole frame loop compiles to ONE XLA program with
     the GN-CG re-solve as a `lax.cond`; objects are a vmapped axis with
     per-object validity (mid-sequence YouTubeVOS entries become start-frame
     masks, not dynamic shapes).

Two merge modes:
  * 'online'  — the main tracker's semantics: per-frame soft aggregation with
    newly-entered objects' ground-truth rows participating, labels emitted
    per frame (reference model/tracker.py:140-150, 193-227).
  * 'deferred' — the legacy YTVOS stack's semantics: per-frame updates use
    the exclusive merge, but outputs are the raw (suppressed) per-object soft
    masks, assembled and merged once over the whole sequence with ground
    truth inserted at start frames (reference
    ytvos_validation/tracker.py:100-118 — the batch-style post-merge that
    reproduces the published 72% YTVOS configuration).
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import TrackerConfig
from ..models.resnet import extract_features
from ..models.seg_network import seg_network_apply, seg_network_reduce
from ..models.discriminator import (
    filter_resolve, init_disc_params, online_update_weights,
)
from ..models.multilayer import ml_disc_init, ml_init_params
from ..models.memory import memory_update
from ..models.augmenter import ImageAugmenter
from ..ops.conv import conv2d


def merge_volume(fg, obj_ids_lut):
    """Whole-volume soft aggregation (legacy merge_segmentations,
    ytvos_validation/tracker.py:53-62): fg (T, N, H, W) -> (T, H, W) labels."""
    fg = jnp.clip(fg, 1e-7, 1 - 1e-7)
    bg = jnp.min(1.0 - fg, axis=1, keepdims=True)
    p = jnp.concatenate([bg, fg], axis=1)
    segs = jax.nn.softmax(p / (1.0 - p), axis=1)
    idx = jnp.argmax(segs, axis=1)
    # unrolled where-chain instead of lut[idx] or a one-hot contraction:
    # pixel gathers AND row-bound full-res dots are measured TPU
    # anti-patterns (see masks_to_labels)
    out = jnp.broadcast_to(obj_ids_lut[0], idx.shape)
    for k in range(1, obj_ids_lut.shape[0]):
        out = jnp.where(idx == k, obj_ids_lut[k], out)
    return out.astype(jnp.uint8)


def merge_rows_and_label(rows, obj_ids_lut):
    """Fused soft-aggregation + labeling for the scan's online path: rows
    (N, H, W) suppressed soft fg masks -> (merged (N, H, W) exclusive object
    rows, uint8 (H, W) label image).

    Same winners as the two-step merge_soft_masks -> masks_to_labels chain
    (reference tracker.py:214-221 then :144-150) with ONE softmax and no
    (N+1)-concat / row-scatter / one-hot: the second step's argmax over the
    exclusive volume reduces algebraically to "the step-1 winner keeps its
    label iff its merged probability > 0.5, else background" — for winner
    value s the re-derived odds are s/(1-s) for the winner vs (1-s)/s for
    the recomputed background row, and s/(1-s) > (1-s)/s iff s > 0.5 (ties
    to background, argmax's first-max rule). v5e motivation: the two-step
    form's full-res concat + scatter + one-hot cost ~3 ms/window at N=2
    (round-3 trace) and doubled the elementwise pass count.
    """
    if rows.shape[0] == 1:
        # single object: the 2-way softmax over [bg, fg] odds is exactly
        # sigmoid of the odds difference (see merge_soft_masks)
        p = jnp.clip(rows[0], 1e-7, 1 - 1e-7)
        r1 = p / (1.0 - p)
        r0 = (1.0 - p) / p
        win = r1 > r0
        s1 = jax.nn.sigmoid(r1 - r0)
        merged = (s1 * win.astype(s1.dtype))[None]
        label = jnp.where(win & (s1 > 0.5), obj_ids_lut[1], obj_ids_lut[0])
        return merged, label.astype(jnp.uint8)
    N = rows.shape[0]
    p = jnp.clip(rows, 1e-7, 1 - 1e-7)
    bg = jnp.min(1.0 - p, axis=0)
    r = p / (1.0 - p)
    r_bg = bg / (1.0 - bg)
    m = jnp.maximum(jnp.max(r, axis=0), r_bg)
    e = jnp.exp(r - m)
    e_bg = jnp.exp(r_bg - m)
    z = e_bg + jnp.sum(e, axis=0)
    seg = e / z                           # (N, H, W) object softmax rows
    seg_bg = e_bg / z
    k = jnp.argmax(e, axis=0)             # winner among objects (first-max)
    s_win = jnp.max(seg, axis=0)
    obj_wins = s_win > seg_bg             # strict: ties go to background
    lane = jnp.arange(N, dtype=k.dtype)[:, None, None]
    merged = seg * ((lane == k) & obj_wins).astype(seg.dtype)
    lab = jnp.broadcast_to(obj_ids_lut[1], k.shape)
    for i in range(1, N):                 # tiny-LUT where-chain (VPU)
        lab = jnp.where(k == i, obj_ids_lut[i + 1], lab)
    label = jnp.where(obj_wins & (s_win > 0.5), lab, obj_ids_lut[0])
    return merged, label.astype(jnp.uint8)


class BatchedSequenceTracker:
    """Whole-sequence tracking as (batched extract) + (one scan program)."""

    def __init__(self, cfg: TrackerConfig, backbone_params, refiner_params,
                 extract_chunk: int = 8, merge_mode: str = "online",
                 scan_bucket: int = 16, augment_backend: str = "host",
                 decode_chunk=None, mesh=None, aug_compact=None):
        """aug_compact: ship first-frame augment batches in the COMPACT
        encoding (background descriptors + blended paste rectangles,
        models/aug_compose.py) and compose them on device inside the init
        program, instead of uploading ~4.9 MB of full augmented frames per
        object (VERDICT r4 #1 — the 2-object pass was transfer-bound on the
        13-50 MB/s tunnel). None = auto: on for host-augment backends on
        TPU (where the tunnel is the bottleneck), off on CPU (tests pin the
        dense path there; exactness of compact-vs-dense is gated by
        tests/test_aug_compose.py and the fused-tracker equivalence test).
        The encoding is bit-exact except non-identity backgrounds outside
        the paste rectangle (<=1 uint8 count — CompactAugBatch docstring).

        mesh: optional jax.sharding.Mesh with a 'spatial' axis — the
        multi-chip single-SEQUENCE mode: the feature pyramid and every
        activation inside the scan/window programs shard along the frame
        height over that axis (parallel/spatial.py semantics applied to the
        whole fused tracker, not one frame), so N chips cooperate on one
        sequence's latency. Target-model params/CG state stay replicated
        (KB-scale); GSPMD inserts the conv halo exchanges and the solver's
        global reductions become psums. Sharded-vs-single equivalence is
        pinned by tests/test_spatial.py on a CPU mesh."""
        assert merge_mode in ("online", "deferred")
        # decoder sub-batch inside the windowed program: seg_network_apply's
        # per-frame cost RISES with batch on v5e (6.45/10.7/14.1 ms per 8
        # frames at batch 8/16/32 — XLA picks progressively worse layouts for
        # the full-res intermediates), while lax.map over chunks of 4 holds a
        # flat 5.65 ms per 8 at every total batch. TPU-only: on CPU the map
        # serialisation only adds overhead. None = auto; 0 = off.
        if decode_chunk is None:
            decode_chunk = 4 if jax.default_backend() == "tpu" else 0
        self.decode_chunk = decode_chunk
        self.cfg = cfg
        self.backbone = backbone_params
        self.refiner = refiner_params
        self.augment_backend = augment_backend
        if aug_compact is None:
            aug_compact = (jax.default_backend() == "tpu"
                           and augment_backend != "device")
        self.aug_compact = aug_compact and augment_backend != "device"
        # dispatch the fused whole-sequence extract BEFORE the host augment
        # (see _run's ordering note); numerically a no-op, purely an
        # enqueue-order choice, so it is safe to enable wherever the fused
        # one-dispatch extract path exists
        self.extract_first = True
        if augment_backend == "device":
            from ..models.device_augmenter import DeviceAugmenter
            self.augmenter = DeviceAugmenter(cfg.aug_params)
        else:
            self.augmenter = ImageAugmenter(cfg.aug_params)
        self.arch = cfg.feature_extractor
        self.disc_cfg = cfg.disc
        self.extract_chunk = extract_chunk
        self.scan_bucket = scan_bucket
        self.merge_mode = merge_mode
        self.dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.last_phase_report = ""
        self.last_phase_stats = {}

        # Multi-layer target models (legacy stack capability) ride the fused
        # scan too: the scan's discriminator params/states are dicts keyed by
        # layer — the shipped single-layer config is the 1-entry dict, whose
        # compiled program is the same math as before. Matches the host
        # Tracker's multilayer wiring (runtime/tracker.py:106-163).
        self._multilayer = len(cfg.disc_layers) > 0
        if self._multilayer:
            from dataclasses import replace as _dc_replace
            from ..models.resnet import resnet_out_channels
            ch = resnet_out_channels(cfg.feature_extractor)
            self._scan_disc_cfgs = {
                L: _dc_replace(cfg.disc, in_channels=ch[L], layer=L)
                for L in cfg.disc_layers}
            self._disc_params0 = ml_init_params(jax.random.PRNGKey(0),
                                                self._scan_disc_cfgs)
        else:
            self._scan_disc_cfgs = {cfg.disc.layer: cfg.disc}
            self._disc_params0 = {cfg.disc.layer: init_disc_params(
                jax.random.PRNGKey(0), cfg.disc)}
        # score-list order must match the host's ml_disc_apply (sorted names)
        self._disc_layers = tuple(sorted(self._scan_disc_cfgs))

        # extract the union of decoder layers and the discriminator layers
        # (they can differ, e.g. disc on layer3 — the host Tracker supports it)
        cfgl = tuple(sorted(set(cfg.refnet_layers) | set(self._disc_layers),
                            reverse=True))

        def _extract(bb, images):
            # features stay in the compute dtype end-to-end: the decoder is
            # bf16 and the solver's einsum upcasts layer4 itself
            return extract_features(bb, images, self.arch, output_layers=cfgl,
                                    dtype=self.dtype, out_dtype=self.dtype)

        @partial(jax.jit, static_argnames=("bucket",))
        def _extract_padded(bb, chunks, n_track, bucket):
            """Whole-sequence extraction as ONE program: per-chunk backbone
            pyramids, concat, trim-and-bucket-pad — the pad is a gather with
            a clamped index, which reproduces the repeat-last-frame padding
            bit-identically (rows >= n_track read frame n_track-1) while
            never touching the zero pad frames of the final chunk. Replaces
            n_chunks extract + n_levels concat + pad dispatches with ONE
            dispatch: each dispatch is a tunnel round trip here, measured
            1 ms quiet but 10-40 ms when the link is busy — at ~14 round
            trips per tracked pass that was the dominant variable of
            contended-window fps (round 4)."""
            outs = [_extract(bb, c) for c in chunks]
            idx = jnp.minimum(jnp.arange(bucket), n_track - 1)
            return {L: jnp.concatenate([o[L] for o in outs])[idx]
                    for L in outs[0]}

        self._extract_padded = _extract_padded

        @jax.jit
        def _extract_disc_layer(bb, images):
            return extract_features(bb, images, self.arch,
                                    output_layers=list(self._disc_layers),
                                    dtype=self.dtype)

        @jax.jit
        def _init_disc(p0, fts, lb):
            """One target model per disc layer: {L: params}, {L: states}."""
            return ml_disc_init(p0, fts, lb, self._scan_disc_cfgs)

        def _init_objects_from_dense(bb, p0, images, labels):
            """Batched multi-object init: ONE backbone pass over all objects'
            augmented frames + ONE vmapped GN-CG program, replacing N serial
            (extract, solve) dispatch pairs. v5e 2-object measurement: the
            serial path costs 2x4.6 ms extract + 2x13.6 ms solve wall plus
            four tunnel dispatches inside the fps clock; the same trick the
            trainer uses for cold-start cache misses (trainer.py).

            :param images: (N, K, H, W, 3) uint8 augmented frames per object
            :param labels: (N, K, H, W, 1) augmented masks
            :return: ({L: params}, {L: states}) with leading object axis N
            """
            # extract per object via lax.map, NOT one flat (N*K) batch: the
            # disc-layer extract is batch-superlinear on v5e like the decoder
            # (measured: 2x5-frame calls 9.2 ms device vs one 10-frame call
            # 14.7 ms) — the map keeps the efficient K-frame batch while
            # still dispatching ONE program
            ft = lax.map(lambda im: extract_features(
                bb, im, self.arch, output_layers=list(self._disc_layers),
                dtype=self.dtype), images)
            return jax.vmap(
                lambda f, l: ml_disc_init(p0, f, l, self._scan_disc_cfgs)
            )(ft, labels)

        @jax.jit
        def _init_objects(bb, p0, f0, ims_rest, lbs_packed):
            """Multi-object init from TRANSFER-MINIMISED inputs. The host
            augment batch costs ~9.8 MB/object to upload naively (5 frames +
            5 full-res masks + a float32 start mask) and that upload gates
            the init solve INSIDE the fps clock over a 13-50 MB/s tunnel —
            measured round 4 (scripts/probe_2obj_wall.py): the 2-object pass
            spent 0.9-1.2 s of its ~1.0 s wall streaming 15.6 MB while the
            device sat idle. This program reconstructs the dense batch from
            ~5.2 MB/object instead:

            :param f0: TUPLE of N (H, W, 3) uint8 start frames — slot 0 of
                each augment batch IS the real frame (augmenter.py:352-353,
                reference model/augmenter.py:473-555), already device-resident
                from the pre-clock preload, so it is never re-uploaded
            :param ims_rest: tuple of N (K-1, H, W, 3) uint8 slots 1..K
            :param lbs_packed: tuple of N (K, H, ceil(W/8)) uint8
                np.packbits masks (binary, so 8x smaller; unpack is a VPU
                shift-and-mask)

            The per-object inputs ride in as PYTREE TUPLES and stack inside
            the program: a host-side jnp.stack would be one extra dispatch
            each (three tunnel round trips, 10-40 ms apiece when the link
            is busy) for what XLA fuses into the first consumer anyway.

            :return: ({L: params}, {L: states}, (N, H, W) float32 slot-0
                masks — the scan's start_masks, derived on device instead of
                uploading another 1.6 MB float32 per object)
            """
            f0 = jnp.stack(f0)
            lbs_packed = jnp.stack(lbs_packed)
            W = f0.shape[2]
            images = jnp.concatenate([f0[:, None], jnp.stack(ims_rest)],
                                     axis=1)
            shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB-first
            bits = (lbs_packed[..., None] >> shifts) & jnp.uint8(1)
            labels = bits.reshape(*lbs_packed.shape[:-1], -1)[..., :W, None]
            params, states = _init_objects_from_dense(bb, p0, images, labels)
            return params, states, labels[:, 0, :, :, 0].astype(jnp.float32)

        @jax.jit
        def _init_objects_compact(bb, p0, f0, packs):
            """Multi-object init from COMPACT augment encodings (VERDICT r4
            #1): each object's augment batch is composed ON DEVICE from its
            packed pieces (models/aug_compose.py — inpaint rectangle, at
            most one warped background, per-slot blur kernels + blended
            paste rectangles, ~1-2 MB/object) and feeds extraction directly;
            the ~4.9 MB of dense augmented frames never cross the tunnel.

            :param f0: tuple of N (H, W, 3) uint8 start frames
                (device-resident from the pre-clock preload)
            :param packs: tuple of N pack_compact_batch dicts — per-object
                patch-bucket shapes may differ (the loop is python-unrolled,
                so each object's leaves keep their own static shapes)
            :return: same as _init_objects
            """
            from ..models.aug_compose import compose_aug_batch
            pairs = [compose_aug_batch(f, pk) for f, pk in zip(f0, packs)]
            images = jnp.stack([im for im, _ in pairs])
            labels = jnp.stack([lb for _, lb in pairs])
            params, states = _init_objects_from_dense(bb, p0, images, labels)
            return params, states, labels[:, 0, :, :, 0].astype(jnp.float32)

        self._extract_disc_layer = _extract_disc_layer
        self._init_disc = _init_disc
        self._init_objects = _init_objects
        self._init_objects_compact = _init_objects_compact
        # dense-signature variant for callers whose batches are already
        # device-resident (the device augmenter produces device arrays, so
        # there is no transfer to minimise)
        self._init_objects_dense = jax.jit(_init_objects_from_dense)
        # (input donation was tried for the pyramid: XLA cannot alias it into
        # the label outputs, so it only produced warnings — buffers free after
        # last use regardless)
        scan_fn, window_fn = self._make_scan()
        self.mesh = mesh
        if mesh is None:
            self._extract = jax.jit(_extract)
            self._scan_track = jax.jit(scan_fn, static_argnames=("im_size",))
            self._window_track = jax.jit(window_fn,
                                         static_argnames=("im_size",))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            # (T/N, h, w, c) / (N, H, W): axis 1 = height over 'spatial'.
            sp = NamedSharding(mesh, P(None, "spatial"))
            n_sp = mesh.shape["spatial"]

            def constrain(x):
                # shard along height only where it divides evenly; the
                # deepest pyramid levels (h5 = H/32, e.g. 15 at DAVIS res)
                # stay replicated — they are KB-to-MB-scale and their compute
                # share is small, which is also the right perf call
                if getattr(x, "ndim", 0) >= 3 and x.shape[1] % n_sp == 0 \
                        and x.shape[1] >= n_sp:
                    return jax.lax.with_sharding_constraint(x, sp)
                return x

            # params live mesh-replicated so every downstream jit (extract,
            # init solves, scan) compiles onto the mesh's device set without
            # per-call resharding or committed-device conflicts
            self.backbone = jax.device_put(self.backbone, repl)
            self.refiner = jax.device_put(self.refiner, repl)
            self._disc_params0 = jax.device_put(self._disc_params0, repl)

            def extract_sp(bb, images):
                return jax.tree.map(constrain,
                                    _extract(bb, constrain(images)))

            def _sp_track(fn):
                def wrapped(refiner, feats_all, disc_params, disc_states,
                            start_frames, start_masks, lut, im_size):
                    feats_all = jax.tree.map(constrain, feats_all)
                    start_masks = constrain(start_masks)
                    return fn(refiner, feats_all, disc_params, disc_states,
                              start_frames, start_masks, lut, im_size=im_size)
                return jax.jit(wrapped, static_argnames=("im_size",))

            self._sp_n = n_sp
            self._extract = jax.jit(extract_sp)
            self._scan_track = _sp_track(scan_fn)
            self._window_track = _sp_track(window_fn)
        self._merge_volume = jax.jit(merge_volume)

    # ------------------------------------------------------------------

    def _make_scan(self):
        cfg = self.cfg
        disc_cfg = self.disc_cfg
        cfgs = self._scan_disc_cfgs         # {layer: DiscConfig}
        DL = self._disc_layers              # sorted layer names (score order)
        single = len(DL) == 1
        layers = cfg.refnet_layers
        online = self.merge_mode == "online"
        dec_chunk = self.decode_chunk
        dtype = self.dtype  # decoder compute dtype (bf16 on TPU); the
        # discriminator solve and mask aggregation stay float32

        # shared by BOTH scan programs below — the memory-insert and re-solve
        # semantics ARE the bit-exactness contract between the per-frame and
        # windowed paths, so they exist exactly once
        def insert_sample(cfg_l):
            def f(state, c, ty, e, act):
                """Row-gated memory insert (on >=10 fg px) + frame counter
                advance for every tracked frame (the reference increments in
                apply regardless of mask quality)."""
                label, pw = online_update_weights(ty, cfg_l)
                mem = memory_update(state.memory, c, label, pw,
                                    cfg_l.learning_rate, enabled=e)
                return state._replace(
                    memory=mem,
                    frame_num=state.frame_num + act.astype(jnp.int32))
            return f

        def resolve_due(params, states, due, cfg_l):
            """Filter re-solve where `due`; runs when ANY lane is due, lanes
            select their own result. Only filter params and CG state change —
            the memory buffers stay out of the select (no 100MB-scale
            copies)."""
            def resolve(args):
                params_, cg = args
                new_p, new_cg = jax.vmap(
                    lambda p, s: filter_resolve(p, s, cfg_l))(
                    params_, states)
                sel = lambda a, b: jnp.where(
                    due.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
                return jax.tree.map(sel, new_p, params_), \
                    jax.tree.map(sel, new_cg, cg)

            return lax.cond(jnp.any(due), resolve, lambda a: a,
                            (params, states.cg))

        def project_all(feats_all, disc_params):
            """Per-object projection of all frames per disc layer (fixed
            after init) — inside the program so it fuses with the scan's
            input pipeline. {L: (T, N, h_L, w_L, d)}."""
            return {L: jnp.einsum(
                "thwc,ncd->tnhwd", feats_all[L].astype(jnp.float32),
                disc_params[L].project[:, 0, 0]) for L in DL}

        def classify_frame(cft, params):
            """cft: {L: (N, h, w, d)} -> [per-layer (N, h, w, 1) scores] in
            sorted-layer order (matches the host's ml_disc_apply).
            tapsum=False: bit-identical scores to the host loop's disc_apply
            on every backend (the fast-path dispatch would otherwise diverge
            in the last ulp for c_channels <= 48 configs on TPU — advisor
            r2); the filter conv runs at score resolution, where the
            lowering choice is not measurable."""
            scores = []
            for L in DL:
                s = jax.vmap(
                    lambda c, p: conv2d(c[None], p.filter, tapsum=False)[0])(
                    cft[L], params[L])
                if cfgs[L].clamp_output:
                    s = jnp.clip(s, -0.1, 1.2)
                scores.append(s)
            return scores

        def update_states(states, cft, train_y, enough, active):
            """Memory insert for every layer's model with the shared merged
            mask (the legacy stack updates all layers in lock-step,
            ytvos_validation/discriminator.py:291-303)."""
            return {L: jax.vmap(insert_sample(cfgs[L]))(
                states[L], cft[L], train_y, enough, active) for L in DL}

        def resolve_all(params, states, due):
            new_p, new_s = {}, {}
            for L in DL:
                p, cg = resolve_due(params[L], states[L], due, cfgs[L])
                new_p[L] = p
                new_s[L] = states[L]._replace(cg=cg)
            return new_p, new_s

        def scan_track(refiner, feats_all, disc_params, disc_states,
                       start_frames, start_masks, obj_ids_lut, im_size,
                       n_track=None):
            """:param feats_all:      {L: (T', h, w, c)} frames 1..T'
            :param disc_params:    {layer: DiscParams batched over N}
            :param disc_states:    {layer: DiscState batched over N}
            :param start_frames:   (N,) int32 per-object start frame indices
            :param start_masks:    (N, H, W) float32 ground-truth start masks
            :param obj_ids_lut:    (N+1,) int32 labels LUT
            :param n_track:        optional traced scalar: frames beyond it
                are bucket pad (repeat-last, outputs dropped by the caller) —
                a lax.cond skips their classify/decode/update entirely.
                Real device savings on the sequential single-sequence path;
                the vmapped sharded engine does not pass it (vmapped cond
                lowers to select and would execute both branches anyway).
            :return: per-frame outputs (labels or raw soft rows), final state
            """
            N = disc_params[DL[0]].project.shape[0]
            refiner_c = jax.tree.map(
                lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
                else a, refiner)
            compressed_all = project_all(feats_all, disc_params)

            def frame_step(carry, xs):
                params, states, t = carry
                feats_t, cft = xs
                t = t + 1
                active = t > start_frames          # (N,) tracked this frame
                fresh = t == start_frames          # entering this frame

                # classify + refine every object (inactive lanes are wasted
                # compute but keep shapes static; N is small)
                score_list = classify_frame(cft, params)
                # object-independent TSE reductions run once on the frame and
                # broadcast at 32 channels — not the raw pyramid — across the
                # N object lanes (bit-identical; seg_network_reduce docstring)
                red1 = seg_network_reduce(
                    refiner_c, {L: f[None].astype(dtype)
                                for L, f in feats_t.items()}, layers)
                redN = {L: (jnp.broadcast_to(h, (N,) + h.shape[1:]),
                            jnp.broadcast_to(hp, (N,) + hp.shape[1:]))
                        for L, (h, hp) in red1.items()}
                scores = [s.astype(dtype) for s in score_list]
                logits = seg_network_apply(refiner_c,
                                           scores[0] if single else scores,
                                           None, im_size, layers=layers,
                                           reduced=redN)
                y = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))  # (N, H, W)
                y = y * active.astype(y.dtype)[:, None, None]

                # suppress tracked masks under this frame's entering objects
                sup = jnp.prod(1.0 - start_masks * fresh.astype(y.dtype)[:, None, None],
                               axis=0)
                y = y * sup[None]

                if online:
                    # entering objects contribute their GT rows to the merge
                    rows = jnp.where(fresh[:, None, None], start_masks, y)
                else:
                    rows = y

                # fused merge+label: one softmax, no (N+1) concat/scatter/
                # one-hot (merge_rows_and_label docstring); the label is
                # dead code under XLA in deferred mode
                merged, out_label = merge_rows_and_label(rows, obj_ids_lut)
                out = out_label if online else rows

                if not disc_cfg.update_filters:  # static: no online updates
                    states = {L: states[L]._replace(
                        frame_num=states[L].frame_num + active.astype(jnp.int32))
                        for L in DL}
                    return (params, states, t), out

                # memory insert per active object (gated on >=10 fg px)
                train_y = merged[..., None]                 # (N, H, W, 1)
                enough = ((train_y > 0.5).sum(axis=(1, 2, 3)) >= 10) & active
                states = update_states(states, cft, train_y, enough, active)

                # filter re-solve on each object's own cadence (objects
                # entering mid-sequence have different parities)
                due = active & (states[DL[0]].frame_num
                                % disc_cfg.train_skipping == 0) & enough
                params, states = resolve_all(params, states, due)
                return (params, states, t), out

            if n_track is None:
                step = frame_step
            else:
                zero_out = (jnp.zeros(im_size, jnp.uint8) if online
                            else jnp.zeros((N,) + im_size, jnp.float32))

                def step(carry, xs):
                    # pad frames (index >= n_track) skip the whole frame:
                    # their outputs are dropped and their state updates were
                    # never read (they run after every real frame)
                    return lax.cond(
                        carry[2] < n_track,
                        lambda _: frame_step(carry, xs),
                        lambda _: ((carry[0], carry[1], carry[2] + 1),
                                   zero_out), None)

            (params, states, _), outs = lax.scan(
                step,
                (disc_params, disc_states, jnp.zeros((), jnp.int32)),
                (feats_all, compressed_all))
            return outs, params, states

        W = max(int(disc_cfg.train_skipping), 1)

        def window_track(refiner, feats_all, disc_params, disc_states,
                         start_frames, start_masks, obj_ids_lut, im_size,
                         n_track=None):
            """Windowed variant of scan_track: between filter re-solves the
            discriminator weights are constant, so the classify -> decode ->
            merge chain for a whole train_skipping window is frame-parallel
            (the only sequential state inside a window is the memory insert,
            a few KB of scatter work). Bit-identical to the per-frame scan
            whenever every object's start frame is ≡ 0 (mod train_skipping):
            re-solves then fire exactly at window boundaries, as in the
            reference schedule (model/discriminator.py:221-227). The host
            picks this program for aligned sequences (all of DAVIS; the
            per-frame scan remains the general path)."""
            N = disc_params[DL[0]].project.shape[0]
            refiner_c = jax.tree.map(
                lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating)
                else a, refiner)
            compressed_all = project_all(feats_all, disc_params)
            T = compressed_all[DL[0]].shape[0]
            nw = T // W
            feats_w = {L: v.reshape((nw, W) + v.shape[1:])
                       for L, v in feats_all.items()}
            comp_w = {L: v.reshape((nw, W) + v.shape[1:])
                      for L, v in compressed_all.items()}

            def window_step(carry, xs):
                params, states, t = carry
                feats_t, cft = xs           # {L:(W,h,w,c)}, {L:(W,N,h,w,d)}
                tw = t + 1 + jnp.arange(W, dtype=jnp.int32)        # (W,)
                active = tw[:, None] > start_frames[None, :]       # (W, N)
                fresh = tw[:, None] == start_frames[None, :]

                # one batched classify+decode for the whole window: conv batch
                # W*N instead of N fills the MXU far better at these channel
                # counts and amortises per-op overhead 8x. tapsum=False: score
                # parity with disc_apply on every backend (see classify_frame)
                sflat_list = []
                for L in DL:
                    s = jax.vmap(
                        lambda c, p: conv2d(c, p.filter, tapsum=False),
                        in_axes=(1, 0), out_axes=1)(cft[L], params[L])
                    if cfgs[L].clamp_output:
                        s = jnp.clip(s, -0.1, 1.2)
                    sflat_list.append(s.reshape((W * N,) + s.shape[2:]))
                # shared TSE reductions: once per frame (batch W), broadcast
                # across object lanes at 32 channels instead of broadcasting
                # the raw pyramid (bit-identical; seg_network_reduce docstring)
                redW = seg_network_reduce(
                    refiner_c, {L: f.astype(dtype) for L, f in feats_t.items()},
                    layers)
                redWN = {L: (jnp.broadcast_to(h[:, None], (W, N) + h.shape[1:])
                             .reshape((W * N,) + h.shape[1:]),
                             jnp.broadcast_to(hp[:, None], (W, N) + hp.shape[1:])
                             .reshape((W * N,) + hp.shape[1:]))
                         for L, (h, hp) in redW.items()}
                scores = [s.astype(dtype) for s in sflat_list]
                WN = scores[0].shape[0]
                if dec_chunk and WN > dec_chunk and WN % dec_chunk == 0:
                    # decode in sub-batches of dec_chunk (lax.map, one
                    # program): v5e-measured 5.65 ms per 8 frames flat vs
                    # 6.45/10.7/14.1 unchunked at batch 8/16/32 — the full
                    # window batch hits a >linear layout cliff above 8
                    nc = WN // dec_chunk
                    s_c = tuple(s.reshape((nc, dec_chunk) + s.shape[1:])
                                for s in scores)
                    red_c = {L: (h.reshape((nc, dec_chunk) + h.shape[1:]),
                                 hp.reshape((nc, dec_chunk) + hp.shape[1:]))
                             for L, (h, hp) in redWN.items()}

                    def _dec(args):
                        sl, rd = args
                        return seg_network_apply(
                            refiner_c, sl[0] if single else list(sl), None,
                            im_size, layers=layers, reduced=rd)

                    # measured anti-lesson (round 3, v5e): statically
                    # unrolling this map into straight-line chunks to dodge
                    # the while op's apparent ~17 ms bookkeeping was a wash —
                    # the time reappeared on the outer window loop (it is
                    # fusion-region accounting, not loop overhead)
                    lg = lax.map(_dec, (s_c, red_c))
                    logits = lg.reshape((WN,) + lg.shape[2:])
                else:
                    logits = seg_network_apply(refiner_c,
                                               scores[0] if single else scores,
                                               None, im_size, layers=layers,
                                               reduced=redWN)
                y = jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))
                y = y.reshape((W, N) + y.shape[1:])                # (W,N,H,W)
                y = y * active[..., None, None]
                sup = jnp.prod(1.0 - start_masks[None] * fresh[..., None, None],
                               axis=1)                             # (W, H, W)
                y = y * sup[:, None]
                if online:
                    rows = jnp.where(fresh[..., None, None], start_masks[None], y)
                else:
                    rows = y
                # fused merge+label per frame (merge_rows_and_label
                # docstring); labels are dead code in deferred mode
                merged, out_labels = jax.vmap(
                    lambda rw: merge_rows_and_label(rw, obj_ids_lut))(rows)
                out = out_labels if online else rows               # (W,N,H,W)

                if not disc_cfg.update_filters:
                    states = {L: states[L]._replace(
                        frame_num=states[L].frame_num
                        + active.astype(jnp.int32).sum(axis=0)) for L in DL}
                    return (params, states, t + W), out

                train_y = merged[..., None]                        # (W,N,H,W,1)
                enough = ((train_y > 0.5).sum(axis=(2, 3, 4)) >= 10) & active

                def ins_step(st, xw):
                    c_t, ty_t, e_t, a_t = xw
                    return update_states(st, c_t, ty_t, e_t, a_t), None

                states, _ = lax.scan(ins_step, states,
                                     (cft, train_y, enough, active))

                due = active[-1] & (states[DL[0]].frame_num
                                    % disc_cfg.train_skipping == 0) & enough[-1]
                params, states = resolve_all(params, states, due)
                return (params, states, t + W), out

            if n_track is None:
                step = window_step
            else:
                zero_out = (jnp.zeros((W,) + im_size, jnp.uint8) if online
                            else jnp.zeros((W, N) + im_size, jnp.float32))

                def step(carry, xs):
                    # all-pad windows (first frame index > n_track) skip the
                    # whole W-frame classify/decode/update block — up to
                    # (bucket - n_track) // W windows of pure pad decode on
                    # bucket-unaligned sequence lengths (the common DAVIS
                    # case: 67 frames in an 80-bucket)
                    return lax.cond(
                        carry[2] < n_track,
                        lambda _: window_step(carry, xs),
                        lambda _: ((carry[0], carry[1], carry[2] + W),
                                   zero_out), None)

            (params, states, _), outs = lax.scan(
                step,
                (disc_params, disc_states, jnp.zeros((), jnp.int32)),
                (feats_w, comp_w))
            outs = outs.reshape((nw * W,) + outs.shape[2:])
            return outs, params, states

        return scan_track, window_track

    # ------------------------------------------------------------------

    def _drain_uploads(self, arrays):
        """True pre-clock barrier on in-flight host->device transfers.
        jax.block_until_ready does NOT reliably block on the remote-tunnel
        runtime (CLAUDE.md microbench methodology), so a pass's 78 MB frame
        preload could still be STREAMING through the tunnel thread when the
        clock started — and on this 1-core host that thread starves the
        in-clock cv2 augment 2-4x (measured round 4: 127-492 ms/object with
        uploads in flight vs 48-62 ms for the batched engine, whose preload
        finished long before its clock). Dispatching a scalar that consumes
        one element of every array and downloading it forces the runtime to
        land all transfers first; the round trip itself costs ~1 ms."""
        if not hasattr(self, "_drain_jit"):
            self._drain_jit = jax.jit(
                lambda xs: sum(x.ravel()[0].astype(jnp.float32) for x in xs))
        float(self._drain_jit(list(arrays)))

    def _upload_chunks(self, images_np):
        """Start async host->device uploads of fixed-size frame chunks.
        Called before the timed region — the reference likewise preloads all
        frames to the GPU before its FPS clock starts (model/tracker.py:88-91),
        so excluding the upload matches its measurement protocol (and on
        bandwidth-limited links it overlaps with host-side augmentation)."""
        T = images_np.shape[0]
        C = self.extract_chunk
        chunks = []
        for s in range(0, T, C):
            chunk = images_np[s:s + C]
            pad = C - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                        chunk.dtype)])
            chunks.append((jax.device_put(chunk), pad))
        return chunks

    def _extract_sequence(self, images_np, chunks=None):
        """Chunked batched feature extraction over all frames."""
        if chunks is None:
            chunks = self._upload_chunks(images_np)
        C = self.extract_chunk
        outs = []
        for chunk, pad in chunks:
            f = self._extract(self.backbone, chunk)
            outs.append({L: v[:C - pad] if pad else v for L, v in f.items()})
        return {L: jnp.concatenate([o[L] for o in outs]) for L in outs[0]}

    def _pack_aug_batch(self, im_aug, lb_aug):
        """Transfer-minimised async upload of ONE object's augment batch:
        the slot-0 image is elided (it IS the real frame, device-resident
        from the pre-clock preload — _init_objects reattaches it) and the
        binary masks are bit-packed 8x with np.packbits (device unpack is a
        VPU shift-and-mask inside _init_objects). Cuts the in-clock upload
        from ~9.8 to ~5.2 MB/object on the 13-50 MB/s tunnel (measured
        round 4, scripts/probe_2obj_wall.py). Returns
        (ims_rest (K-1,H,W,3) u8 dev, lbs_packed (K,H,ceil(W/8)) u8 dev).

        Safe with the augmenter's reused output buffers (copy=False):
        device_put commits the host copy before returning (the pipelined
        prepare_sequence has relied on the same fact since round 3), and
        packbits allocates fresh bytes."""
        ims = np.asarray(im_aug, np.uint8)
        lbs = np.asarray(lb_aug, np.uint8)
        packed = np.packbits(lbs[..., 0], axis=-1)
        return jnp.asarray(ims[1:]), jnp.asarray(packed)

    def _augment_objects(self, objects, timer):
        """First-frame augmentation for every object, in object order; each
        batch is packed + its async device upload STARTED right after it is
        augmented, so object k's multi-MB transfer streams over the tunnel
        while object k+1's cv2 augment runs on the host (on multi-object
        sequences the exposed upload time shrinks by one augment per extra
        object; measured caveat: in-flight streams do slow the 1-core host's
        cv2 work somewhat — the round-4 preload-drain experiment measured
        the extreme of that effect — but a ~5 MB aug stream is an order of
        magnitude smaller than the preload that motivated the drain).
        Upload-after-each-augment also means the augmenter's reused buffers
        never need copying (copy=False throughout).

        Returns [(ims_rest_dev, lbs_packed_dev)] per object — the
        _pack_aug_batch format that _init_objects consumes — or, in compact
        mode, [pack_compact_batch dict] for _init_objects_compact."""
        from ..utils.profiling import PhaseTimer
        timer = timer or PhaseTimer(sync=False)
        batches = []
        for k, (obj_id, start_idx, mask, image) in enumerate(objects):
            rng = np.random.RandomState(0)
            if self.aug_compact:
                from ..models.aug_compose import pack_compact_batch
                with timer.phase("augment"):
                    compact = self.augmenter.augment_first_frame(
                        image, mask[..., None], rng, compact=True)
                with timer.phase("aug_upload"):
                    batches.append(pack_compact_batch(compact))
                continue
            with timer.phase("augment"):
                im_aug, lb_aug = self.augmenter.augment_first_frame(
                    image, mask[..., None], rng, copy=False)
            with timer.phase("aug_upload"):
                batches.append(self._pack_aug_batch(im_aug, lb_aug))
        return batches

    def _collect_objects(self, sequence):
        """(obj_ids, start_frame_idx per object, start mask per object,
        init image per object) from the sequence's start-frame metadata."""
        frame_of = {f: i for i, f in enumerate(sequence.frame_names)}
        objects = []
        for frame_name, obj_ids in sequence.start_frames.items():
            idx = frame_of[frame_name]
            image, labels, _ = sequence[idx]
            for obj_id in obj_ids:
                mask = (np.asarray(labels).squeeze() == obj_id).astype(np.float32)
                objects.append((obj_id, idx, mask, image))
        objects.sort(key=lambda o: (o[1], o[0]))
        return objects

    def prepare_sequence(self, sequence):
        """Full host-side prep of a sequence, separable from tracking: stack
        the decoded frames, start the frame-0 + chunk device uploads, and run
        the first-frame augmentation. The pipelined dataset runner calls this
        on a background thread for sequence i+1 while sequence i's scan
        occupies the device; the returned dict feeds run_sequence(preloaded=).
        Augment batches are uploaded to the device here too (each object's
        batch right after it is augmented, so the augmenter's reused host
        buffers never need copying and no aug-batch transfer lands inside
        the fps clock); device-augment backends skip the host augment (it
        happens on-device inside _run as usual)."""
        images_np = np.stack([sequence[t][0] for t in range(len(sequence))])
        frame0_dev = jax.device_put(images_np[0])
        chunks = self._upload_chunks(images_np[1:])
        aug = None
        if self.augment_backend != "device":
            # same formats as _augment_objects (compact dicts or dense
            # packed pairs); uploads start right after each augment
            aug = self._augment_objects(self._collect_objects(sequence),
                                        timer=None)
        return {"images_np": images_np, "frame0_dev": frame0_dev,
                "chunks": chunks, "aug_batches": aug}

    def run_sequence(self, sequence, speedrun: bool = False,
                     soft: bool = False, aug_batches=None, preloaded=None):
        """Track a sequence (mid-sequence object entry supported).
        Returns (list of (H, W) uint8 label images, fps).

        aug_batches: optional precomputed first-frame augmentation batches
        (from _augment_objects, same object order) — the timed region then
        excludes augmentation (fps is an ex-augment figure; the default None
        keeps the reference's protocol, augment inside the clock).

        preloaded: optional prepare_sequence() output — frames stacked,
        uploads started, augment done; the pipelined dataset runner computes
        it while the PREVIOUS sequence's scan occupies the device.

        soft=True (merge_mode='deferred' only) returns the raw soft
        foreground volume (T, N, H, W) float32 — per-object suppressed
        probabilities with ground truth inserted at start frames — instead
        of merged labels (the legacy stack's pre-merge artifact,
        ytvos_validation/tracker.py:100-113)."""
        if soft:
            assert self.merge_mode == "deferred", \
                "soft output is the deferred merge's pre-merge volume"
        if preloaded is not None:
            images_np = preloaded["images_np"]
            # frame-0 device copy must precede any tracking: the device
            # augmenter consumes it, and a stale copy from a previous
            # sequence would have the wrong content (or shape)
            self._frame0_dev = preloaded["frame0_dev"]
            chunks = preloaded["chunks"]
            if aug_batches is None:
                aug_batches = preloaded["aug_batches"]
        else:
            images_np = np.stack([sequence[t][0] for t in range(len(sequence))])
            self._frame0_dev = jax.device_put(images_np[0])
            chunks = None

        if self.mesh is not None and images_np.shape[1] % self._sp_n \
                and not getattr(self, "_sp_warned", False):
            # indivisible top-level height -> the full-res input (and
            # typically every level under it) replicates: N chips mostly
            # redo the single-chip workload
            import warnings
            warnings.warn(
                f"spatial mesh: frame height {images_np.shape[1]} is not "
                f"divisible by n_spatial={self._sp_n} — the full-resolution "
                "input replicates instead of sharding (pick a divisor of "
                "the frame height for real spatial speedup)")
            self._sp_warned = True

        if chunks is None:
            # preload, like the reference — uploaded BEFORE any speedrun
            # warm-up so the warm-up compiles the exact programs the measured
            # pass runs (with chunks=None it would take the chunked
            # _extract_sequence path and leave the fused _extract_padded
            # program's ~90 s remote compile inside the first measured clock)
            chunks = self._upload_chunks(images_np[1:])

        if speedrun:
            # drain the warm-up's device work before the measured pass —
            # otherwise its scan still occupies the chip when the clock
            # starts. Reuse the precomputed augment + uploaded chunks: the
            # warm-up must not touch the augmenter while a pipelined prefetch
            # thread is using it, and re-uploading the frames it already has
            # device copies of would just contend with the prefetch's uploads.
            jax.block_until_ready(self._run(images_np, sequence, soft=soft,
                                            aug_batches=aug_batches,
                                            chunks=chunks))

        from ..utils.profiling import PhaseTimer
        timer = PhaseTimer(sync=False)
        self._drain_uploads([self._frame0_dev] + [c for c, _ in chunks])
        # preload COMPLETES before the clock starts (reference:
        # sequence.preload(device) precedes the timed loop,
        # model/tracker.py:88-91,130)
        t0 = time.time()
        result = self._run(images_np, sequence, timer=timer, chunks=chunks,
                           soft=soft, aug_batches=aug_batches)
        jax.block_until_ready(result)
        fps = len(sequence) / max(time.time() - t0, 1e-9)
        self.last_phase_report = timer.report()
        self.last_phase_stats = timer.stats()
        if soft:
            return np.asarray(result[0], np.float32), fps
        # downloads happen AFTER the clock (the reference also excludes file
        # output from its fps window, model/tracker.py:159-161). _run returns
        # stacked device arrays — per-frame slicing here is a host-side numpy
        # view, not 64 separate device dispatches through the tunnel.
        outputs = []
        for arr in result:
            a = np.asarray(arr).astype(np.uint8)
            outputs.extend(list(a) if a.ndim == 3 else [a])
        return outputs, fps

    def _run(self, images_np, sequence, timer=None, chunks=None,
             soft: bool = False, aug_batches=None):
        from ..utils.profiling import PhaseTimer
        timer = timer or PhaseTimer(sync=False)
        T = images_np.shape[0]
        im_size = tuple(images_np.shape[1:3])
        objects = self._collect_objects(sequence)
        if not objects:
            raise ValueError("sequence has no objects")
        if T == 1:  # nothing to track: the output is the start labels
            return (self._frame0_label(objects, im_size),)

        n_track = T - 1
        bucket = -(-n_track // self.scan_bucket) * self.scan_bucket
        fused_path = chunks is not None and self.mesh is None
        feats_all = None

        # Dispatch ordering (round-5 re-measure of the round-2 lesson): the
        # one-dispatch _extract_padded reads only DEVICE-RESIDENT chunks, so
        # enqueueing it before the host augment costs one ~1 ms round trip
        # and then ~73 ms of backbone work executes WHILE the host runs cv2
        # (the round-2 "augment first" rule predates the fused extract: back
        # then extraction was 5 chunked dispatches with in-flight uploads
        # whose tunnel threads starved the 1-core host's cv2). The device
        # executes in enqueue order, so the compact init's small uploads
        # stream during the extract and the init program queues behind it —
        # exactly the order _run_group proved out (multi_sequence.py).
        if self.extract_first and fused_path \
                and self.augment_backend != "device" and aug_batches is None:
            with timer.phase("extract"):
                feats_all = self._extract_padded(
                    self.backbone, tuple(c for c, _ in chunks),
                    jnp.asarray(n_track, jnp.int32), bucket)
                pre_padded = True

        # host augmentation before any remaining device dispatch: in-flight
        # UPLOAD streams starve the 1-core host's cv2 threads (measured round
        # 2/4); with extract_first only the already-resident extract runs
        # underneath, which has no host-side traffic.
        if aug_batches is None:
            aug_batches = self._augment_objects(objects, timer) \
                if self.augment_backend != "device" else []

        # whole-sequence extraction dispatch is async: the device chews the
        # backbone pyramid (~1.2 ms/frame) while the host stacks init inputs.
        # With a preload, extract + per-level concat + bucket-pad are ONE
        # fused dispatch (_extract_padded) — each dispatch is a tunnel round
        # trip, 10-40 ms in contended windows; the mesh path keeps the
        # chunked program (its sharding constraints live in _extract).
        if feats_all is None:
            with timer.phase("extract"):
                if fused_path:
                    feats_all = self._extract_padded(
                        self.backbone, tuple(c for c, _ in chunks),
                        jnp.asarray(n_track, jnp.int32), bucket)
                    pre_padded = True
                else:
                    feats_all = self._extract_sequence(images_np[1:],
                                                       chunks=chunks)
                    pre_padded = False

        # object init (GN-CG on device), from transfer-minimised inputs:
        # ONE batched program for any object count, consuming the packed
        # per-object uploads (already streaming since _augment_objects) plus
        # the device-resident start frames — the start masks come back from
        # the device instead of costing another float32 upload each
        if self.augment_backend == "device":
            # device augmenter consumes the pre-uploaded frame and returns
            # device arrays — nothing to pack, use the dense program
            init_inputs = []
            for k, (obj_id, start_idx, mask, image) in enumerate(objects):
                rng = np.random.RandomState(0)
                with timer.phase("augment"):
                    init_inputs.append(self.augmenter.augment_first_frame(
                        image, mask[..., None], rng,
                        image_dev=self._frame_dev(start_idx, images_np,
                                                  chunks)))
            with timer.phase("disc_init"):
                ims = jnp.stack([a for a, _ in init_inputs])
                lbs = jnp.stack([b for _, b in init_inputs])
                disc_params, disc_states = self._init_objects_dense(
                    self.backbone, self._disc_params0, ims, lbs)
                start_masks = jnp.asarray(np.stack([o[2] for o in objects]))
        else:
            with timer.phase("disc_init"):
                f0 = [self._frame_dev(o[1], images_np, chunks)
                      for o in objects]
                f0 = tuple(  # no preload (warm-up path): upload now
                    jnp.asarray(images_np[o[1]]) if d is None else d
                    for d, o in zip(f0, objects))
                if self.aug_compact:
                    disc_params, disc_states, start_masks = \
                        self._init_objects_compact(
                            self.backbone, self._disc_params0, f0,
                            tuple(aug_batches))
                else:
                    disc_params, disc_states, start_masks = \
                        self._init_objects(
                            self.backbone, self._disc_params0, f0,
                            tuple(a for a, _ in aug_batches),
                            tuple(b for _, b in aug_batches))
        start_frames = jnp.asarray([o[1] for o in objects], jnp.int32)
        obj_ids = [o[0] for o in objects]
        # bucket the scan length so different sequence lengths share programs
        # (the fused extract already returned bucket-padded features)
        pad = bucket - n_track
        if pad and not pre_padded:
            feats_all = {L: jnp.concatenate(
                [v, jnp.repeat(v[-1:], pad, axis=0)]) for L, v in feats_all.items()}

        lut = jnp.asarray([0] + obj_ids, jnp.int32)
        # the frame-0 label neither depends on the scan nor needs the device:
        # build + start its upload BEFORE the scan block so it is not a
        # post-scan straggler (each post-block dispatch is a tunnel round
        # trip serialized behind the previous block's completion — the traced
        # pass showed ~30 ms of device idle in the straggler chain)
        frame0_label = self._frame0_label(objects, im_size)
        # windowed program when re-solves provably align to window boundaries
        # (every start frame ≡ 0 mod train_skipping, or no online updates at
        # all): bit-identical math, frame-parallel decode inside each window
        W = max(int(self.disc_cfg.train_skipping), 1)
        aligned = (bucket % W == 0) and (
            not self.disc_cfg.update_filters
            or all(o[1] % W == 0 for o in objects))
        track = self._window_track if aligned else self._scan_track
        with timer.phase("scan"):
            kw = {"im_size": im_size}
            if self.mesh is None and bucket != n_track:
                # pad-frame/pad-window skip (scan_track docstring); the mesh
                # wrapper keeps its fixed signature and the aligned case has
                # nothing to skip
                kw["n_track"] = jnp.asarray(n_track, jnp.int32)
            outs, _, _ = track(
                self.refiner, feats_all, disc_params, disc_states,
                start_frames, start_masks, lut, **kw)
            if self.merge_mode == "online" and bucket != n_track:
                # trim the bucket pad HERE, enqueued directly behind the
                # scan: slicing after block_until_ready would cost an extra
                # dispatch round trip plus a second block
                outs = outs[:n_track]
            outs.block_until_ready()

        if self.merge_mode == "online":
            return (frame0_label, outs)

        # deferred: whole-sequence merge with GT inserted at start frames
        # (legacy ytvos_validation/tracker.py:107-116), chunked in bounded
        # T-windows (VERDICT r4 #8): the merge is per-frame independent
        # (reference tracker.py:53-62), so windowing caps its temporaries —
        # an all-frames 720p 3-object sequence's soft volume alone is
        # ~2.7 GB (scripts/ytvos_dress_rehearsal.py) and the unchunked merge
        # held a full second copy (concat + scatter + softmax temps) on top.
        with timer.phase("deferred_merge"):
            if soft:
                fg = jnp.concatenate(
                    [jnp.zeros((1,) + outs.shape[1:], outs.dtype),
                     outs[:n_track]])
                for k, (obj_id, start_idx, mask, _) in enumerate(objects):
                    fg = fg.at[start_idx, k].set(jnp.asarray(mask))
                return (fg[:T],)
            labels = self._merge_volume_windows(outs, objects, lut, T)
            labels.block_until_ready()
        return (labels,)

    def _merge_volume_windows(self, outs, objects, lut, T,
                              window: int = 32):
        """Deferred whole-sequence merge in fixed-size frame windows: each
        call merges a (window, N, H, W) slice (final window repeat-padded and
        trimmed — the merge is per-frame independent so padding is inert), so
        device temporaries are bounded by `window` INDEPENDENT of sequence
        length, and every window reuses one compiled program per shape.
        Output is bit-identical to the one-shot merge (test-pinned)."""
        zeros_row = jnp.zeros((1,) + outs.shape[1:], outs.dtype)
        chunks = []
        for w0 in range(0, T, window):
            w1 = min(w0 + window, T)
            # frames [w0, w1): frame 0 is the all-zeros row (its labels are
            # overwritten by ground truth below/at write time), frame t > 0
            # is outs[t-1]
            fg = outs[max(w0 - 1, 0):w1 - 1]
            if w0 == 0:
                fg = jnp.concatenate([zeros_row, fg])
            pad = window - (w1 - w0)
            if pad:
                fg = jnp.concatenate([fg, jnp.repeat(fg[-1:], pad, axis=0)])
            for k, (obj_id, start_idx, mask, _) in enumerate(objects):
                if w0 <= start_idx < w1:
                    fg = fg.at[start_idx - w0, k].set(jnp.asarray(mask))
            chunks.append(self._merge_volume(fg, lut)[:w1 - w0])
        return jnp.concatenate(chunks)

    def run_dataset(self, dataset, out_path, speedrun=False, restart=None,
                    pipeline=False):
        """Track every sequence, write indexed PNGs, report average FPS —
        same surface as the host Tracker.run_dataset (and the reference's,
        model/tracker.py:68-101). The NEXT sequence's frames decode in a
        background thread while the current one tracks (the reference notes
        it could not overlap decode with device compute, tracker.py:88-91);
        on few-core hosts this lowers total wall time at the cost of slightly
        pessimistic per-sequence fps readouts (decode steals host cycles from
        the timed window). Processed sequences release their decoded frames
        so host memory stays bounded on long datasets.

        pipeline=True moves the ENTIRE host-side prep of the next sequence
        (frame stacking, frame-0 + chunk device uploads, first-frame
        augmentation — prepare_sequence()) onto the background thread:
        during the current sequence's fused scan the device is busy but the
        host sits idle (measured main-thread CPU ~1 ms over a ~190 ms scan),
        and the uploads overlap device compute. Outputs are bit-identical
        (the augment RNG is per-object deterministic); per-sequence fps
        readouts then EXCLUDE augmentation (printed as 'ex-augment') and are
        not comparable to the reference's protocol — the aggregate dataset
        wall is what improves. Measured on this image's remote-tunnel chip
        (rn101, 4x65 DAVIS-shaped frames): the dataset wall is transfer-bound
        (~78 MB frame upload + ~26 MB label download per sequence ride the
        same tunnel), so pipelining is a wash there (8-11 s walls both modes,
        spread > effect); the hiding itself works — per-sequence fps reads
        181-221 ex-augment vs 153-195 default in the same windows — so on
        hosts with local device attach (where prep, not transfer, is the
        bound) the prep share of the wall (~30%) is what it recovers."""
        from pathlib import Path
        from ..data.image import imwrite_indexed
        from ..utils.meters import AverageMeter
        out_path = Path(out_path)
        out_path.mkdir(exist_ok=True, parents=True)
        fps_meter = AverageMeter()
        # (with the device-augment backend, prepare_sequence skips the host
        # augment — the prefetch then covers stacking + uploads only and the
        # augment happens on-device inside the timed region as usual)

        print("Evaluating", dataset.name)
        restarted = restart is None
        sequences = []
        for sequence in dataset:
            if not restarted:
                if sequence.name != restart:
                    continue
                restarted = True
            sequences.append(sequence)

        def _prefetch(seq):
            if hasattr(seq, "preload"):
                seq.preload()
            if not pipeline:
                return seq, None
            # prepare_sequence uploads each augment batch as it is made, so
            # nothing here aliases the augmenter's reused buffers by the time
            # the NEXT prefetch rewrites them
            return seq, self.prepare_sequence(seq)

        from ..utils.prefetch import prefetch_iter
        t_all = time.time()
        n_frames = 0
        for i, (sequence, prep) in enumerate(
                prefetch_iter(map(_prefetch, sequences))):
            outputs, seq_fps = self.run_sequence(sequence, speedrun,
                                                 preloaded=prep)
            fps_meter.update(seq_fps)
            n_frames += len(sequence)
            tag = (" (ex-augment)" if pipeline
                   and self.augment_backend != "device" else "")
            print(f"{sequence.name}: {seq_fps:.2f} fps{tag}")
            dst = out_path / sequence.name
            dst.mkdir(exist_ok=True)
            for lb, f in zip(outputs, sequence.frame_names):
                imwrite_indexed(dst / (f + ".png"), lb)
            sequence.preloaded = None  # release decoded frames
            sequences[i] = None
        wall = time.time() - t_all
        print("Average frame rate: %.2f fps" % fps_meter.avg)
        if pipeline:
            # with speedrun, every sequence is tracked TWICE inside the wall
            # (warm-up + measured pass), so label the aggregate accordingly
            # rather than printing a silently ~2x-understated number
            extra = ", incl. speedrun warm-up passes" if speedrun else ""
            print("Pipelined dataset pass: %.2f fps aggregate "
                  "(%d frames / %.1fs wall, incl. PNG writes%s)"
                  % (n_frames / max(wall, 1e-9), n_frames, wall, extra))
        return fps_meter.avg

    def _frame_dev(self, t, images_np, chunks):
        """Device copy of frame t from the preloaded buffers (None -> let the
        augmenter upload it itself)."""
        if t == 0:
            return getattr(self, "_frame0_dev", None)
        if chunks is None:
            return None
        C = self.extract_chunk
        chunk, _ = chunks[(t - 1) // C]
        return chunk[(t - 1) % C]

    def _frame0_label(self, objects, im_size):
        lb = np.zeros(im_size, np.uint8)
        for obj_id, start_idx, mask, _ in objects:
            if start_idx == 0:
                lb[mask > 0] = obj_id
        return jnp.asarray(lb)
