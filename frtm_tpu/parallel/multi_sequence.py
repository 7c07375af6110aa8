"""Batched multi-sequence inference across TPU chips (BASELINE config 5).

Entirely new capability vs the reference (single GPU, one sequence at a time
— SURVEY.md §2.11): independent sequences are stacked on a batch axis that is
sharded over the device mesh, and the fused per-sequence scan
(runtime/sequence_tracker.py) is vmapped over that axis. Per-chip tracker
state (target models, sample memories, CG state) lives where its sequences
live; no cross-sequence communication exists, so the only collectives are
none — throughput scales linearly with chips.

Batching rules (static shapes):
  * sequences are grouped by (image size, bucketed length, padded object
    count); padded objects get start_frame = infinity (never active), padded
    frames repeat the last frame and are discarded
  * groups are padded up to a multiple of the mesh size on the sequence axis
    by repeating sequences (their outputs are dropped)
"""
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..runtime.sequence_tracker import BatchedSequenceTracker


class ShardedSequenceTracker(BatchedSequenceTracker):
    """Runs groups of sequences in parallel over a mesh's 'data' axis."""

    def __init__(self, cfg, backbone_params, refiner_params, mesh,
                 extract_chunk: int = 8, merge_mode: str = "online",
                 length_bucket: int = 32, decode_chunk=None):
        # decode_chunk under vmap multiplies: each lax.map step decodes
        # chunk*B frames across the B vmapped sequences, so chunk 2 keeps the
        # effective decode batch at the measured v5e sweet spot (~4) for the
        # common B=2 groups; see BatchedSequenceTracker.__init__.
        if decode_chunk is None:
            decode_chunk = 2 if jax.default_backend() == "tpu" else 0
        # aug_compact stays OFF for the group engine: the compact init
        # program's signature includes every object's patch-bucket shapes,
        # so mixed-size chunks on a real dataset would re-trace the group
        # init (~90 s remote compile) inside the fps clock; the dense packed
        # encoding keeps one program per (group key, batch width). Group
        # prep is pipelined anyway (run_dataset pipeline=True), which hides
        # the larger upload.
        super().__init__(cfg, backbone_params, refiner_params,
                         extract_chunk=extract_chunk, merge_mode=merge_mode,
                         decode_chunk=decode_chunk, aug_compact=False)
        self.mesh = mesh
        self.length_bucket = length_bucket
        n_dev = int(np.prod(list(mesh.shape.values())))
        self.n_devices = n_dev

        # two vmapped programs: the general per-frame scan (safe for any
        # start-frame phases) and the windowed frame-parallel program, used
        # when EVERY sequence in a group is re-solve-aligned (every object's
        # start frame ≡ 0 mod train_skipping — all of DAVIS). The windowed
        # program batches each window's decode W*N-wide exactly like the
        # single-sequence fast path; vmapping only the per-frame scan was
        # measured ~2.3x slower per sequence on v5e (97.8 fps aggregate at
        # B=2 vs ~150 fps single-sequence windowed).
        scan_fn, window_fn = self._make_scan()
        self._raw_vscan = jax.vmap(scan_fn,
                                   in_axes=(None, 0, 0, 0, 0, 0, 0, None))
        self._raw_vwindow = jax.vmap(window_fn,
                                     in_axes=(None, 0, 0, 0, 0, 0, 0, None))
        self._seq_sh = NamedSharding(mesh, P("data"))
        self._repl = NamedSharding(mesh, P())
        self._vscan_cache = {}
        # fused GROUP extract (round 4): the per-sequence extract+insert pair
        # cost 2 tunnel round trips each — a contended B=4 capture spent
        # 634 ms of 'feats' wall on 9 dispatches with the device idle. The
        # group's preloaded chunks now stack in ONE dispatch and extraction
        # runs as ONE shard_mapped program over the 'data' axis, so each
        # device extracts ITS OWN sequences (the loop serialized every
        # extract on the default device even on real meshes). lax.map over
        # the local rows bounds peak HBM to the output buffers + one
        # sequence's pyramid temps — the same envelope as the donated
        # row-insert assembly it replaces (a plain jnp.stack of per-sequence
        # pyramids held 2x a multi-GB allocation alive and OOMed a 16 GB
        # v5e at B=2 with the rn101 bf16 pyramid); the bucket pad stays the
        # clamped repeat-last gather of _extract_padded (bit-identical).
        self._stack_rows = jax.jit(
            lambda rows: jnp.stack([jnp.stack(r) for r in rows]),
            out_shardings=self._seq_sh)

        def _grp_extract(bb, chunks, n_tracks, bucket):
            # chunks: (Bp, n_chunks, C, H, W, 3) uint8, sharded on axis 0;
            # n_tracks: (Bp,) int32. Returns {L: (Bp, bucket, h, w, c)}.
            def local(bb, cs, nts):
                def one(args):
                    c, nt = args
                    outs = jax.lax.map(lambda ck: self._extract(bb, ck), c)
                    idx = jnp.minimum(jnp.arange(bucket), nt - 1)
                    return {L: v.reshape((-1,) + v.shape[2:])[idx]
                            for L, v in outs.items()}
                return jax.lax.map(one, (cs, nts))
            return jax.shard_map(local, mesh=mesh,
                                 in_specs=(P(), P("data"), P("data")),
                                 out_specs=P("data"))(bb, chunks, n_tracks)

        self._grp_extract = jax.jit(_grp_extract, static_argnames=("bucket",))

    def _get_vscan(self, im_size, windowed: bool = False):
        """jitted sharded vmapped scan, one program per (image size,
        windowed) pair (pjit cannot route static kwargs alongside
        in_shardings, so im_size is closed over). Donating the feature
        buffers was tried and is a no-op: the scan reads them on every
        iteration so XLA can never alias them into the (much smaller) label
        outputs — it only emitted 'donated buffers were not usable' warnings.
        Peak HBM is controlled by the in-place row assembly instead."""
        key = (im_size, windowed)
        if key not in self._vscan_cache:
            raw = self._raw_vwindow if windowed else self._raw_vscan

            def fn(refiner, feats, dp, ds, sf, sm, lut):
                return raw(refiner, feats, dp, ds, sf, sm, lut, im_size)

            self._vscan_cache[key] = jax.jit(
                fn,
                in_shardings=(self._repl,) + (self._seq_sh,) * 6,
                out_shardings=self._seq_sh,
            )
        return self._vscan_cache[key]

    # ------------------------------------------------------------------

    def run_sequences(self, sequences):
        """Track many sequences; returns {name: [(H, W) uint8 labels]}.

        Holds every prepared sequence and every result in RAM — fine for
        DAVIS-val-sized datasets; for large datasets use the streaming
        `run_dataset`, which bounds memory to one chunk."""
        groups = defaultdict(list)
        prepared = {}
        for seq in sequences:
            prep = self._prepare(seq)
            prepared[seq.name] = (seq, prep)
            groups[prep["group_key"]].append(seq.name)

        results = {}
        for key, names in groups.items():
            results.update(self._run_group([prepared[n] for n in names], key))
        return results

    def _group_key_meta(self, sequence):
        """The compiled-program group key from sequence METADATA only (one
        frame decoded for the image size) — lets run_dataset group without
        preparing, so memory stays bounded to one chunk."""
        im_size = tuple(np.asarray(sequence[0][0]).shape[:2])
        n_track = len(sequence) - 1
        bucket_T = -(-n_track // self.length_bucket) * self.length_bucket
        n_objects = len(sequence.obj_ids)
        n_pad = 1 << (n_objects - 1).bit_length()
        return (im_size, bucket_T, n_pad)

    def run_dataset(self, dataset, out_path, speedrun=False, restart=None,
                    chunk_multiple=1, pipeline=False):
        """Streaming dataset evaluation, memory bounded to one chunk
        (the reference streams sequence-by-sequence, model/tracker.py:88-99;
        here the unit is a mesh-sized chunk of sequences).

        `speedrun` warms every distinct group PROGRAM before the clock
        starts (round-3 verdict #5: a cold persistent cache otherwise puts
        ~90 s of remote compile into the first chunk's aggregate fps): one
        member of each group is prepared once and run at the chunk's real
        batch width (the prep is replicated, so the warm-up costs one
        sequence's host prep plus one device pass per distinct program). The
        reference's analogue is its DAVIS-2016 warm-up pass
        (model/tracker.py:120-127).

        Groups sequences by program shape from metadata, then per chunk of
        `n_devices * chunk_multiple` sequences: decode + init + track + write
        PNGs + release, before touching the next chunk.

        pipeline=True prefetches the NEXT chunk's host prep (decode, stack,
        augment) on a background thread while the current chunk's scan
        occupies the mesh — same overlap as the fused engine's pipelined
        runner, byte-identical outputs (deterministic per-object augment
        RNG). Memory then holds at most TWO chunks' preps instead of one."""
        from pathlib import Path
        from ..data.image import imwrite_indexed
        from ..utils.prefetch import prefetch_iter

        out_path = Path(out_path)
        groups = defaultdict(list)
        skipping = restart is not None
        for sequence in dataset:
            if skipping:
                if sequence.name != restart:
                    continue
                skipping = False
            groups[self._group_key_meta(sequence)].append(sequence)

        chunk = max(1, self.n_devices * chunk_multiple)
        jobs = [(key, members[lo:lo + chunk])
                for key, members in groups.items()
                for lo in range(0, len(members), chunk)]

        def _prep_chunk(batch):
            # sole augmenter user in pipeline mode (the main thread never
            # calls _prepare then), so its buffer reuse stays single-threaded
            return [(seq, self._prepare(seq)) for seq in batch]

        if speedrun:
            warmed = set()
            for key, batch in jobs:
                # one warm-up per (group key, mesh-padded batch width): a
                # partial FINAL chunk has a smaller Bp and therefore its own
                # scan/extract/init programs (the object-slot padding in
                # _run_group makes the init program a function of exactly
                # this pair, whatever the chunk's object-count mix)
                bp = -(-min(len(batch), chunk) // self.n_devices) \
                    * self.n_devices
                if (key, bp) in warmed:
                    continue
                warmed.add((key, bp))
                # replicate one prepared member to the chunk's real batch
                # width so the warm-up compiles the exact program the clocked
                # chunks will run
                preps = _prep_chunk(batch[:1]) * min(len(batch), chunk)
                # compilation is the goal: keep the label volume on device
                # and skip the warm-up's download + merge where the engine
                # allows it (the deferred merge runs on host post-download,
                # so that mode warms through the full path)
                outs = self._run_group(preps, key,
                                       as_device=self.merge_mode == "online")
                if self.merge_mode == "online":
                    outs.block_until_ready()
                del preps, outs
            print(f"speedrun: warmed {len(warmed)} group program(s) pre-clock")

        t0 = time.time()
        n_frames = 0
        seq_fps = []  # per-sequence completion fps (frames / chunk wall)
        for (key, batch), preps in prefetch_iter(
                ((j, _prep_chunk(j[1])) for j in jobs), enabled=pipeline):
            tc = time.time()
            results = self._run_group(preps, key)
            chunk_wall = max(time.time() - tc, 1e-9)
            del preps  # decoded frames/features/init state die here
            for seq in batch:
                dst = out_path / seq.name
                dst.mkdir(exist_ok=True, parents=True)
                for lb, f in zip(results[seq.name], seq.frame_names):
                    imwrite_indexed(dst / (f + ".png"), lb)
                n_frames += len(seq)
                seq_fps.append(len(seq) / chunk_wall)
                print(f"{seq.name}: {len(seq)} frames written")
                if getattr(seq, "preloaded", None) is not None:
                    seq.preloaded = None  # release decoded frames
            del results
        fps = n_frames / max(time.time() - t0, 1e-9)
        # TWO fps semantics, labeled so they are never cross-compared
        # (VERDICT r2 #9): `aggregate` is total frames / total wall across
        # all sequences (throughput — the batched engine's natural metric;
        # includes host prep whether it ran inline or prefetched);
        # `per-sequence mean` matches the reference's report shape (mean over
        # sequences of frames/wall, model/tracker.py:94-101) but each
        # sequence's wall here covers its whole chunk's DEVICE pass — host
        # prep is excluded in both pipeline modes so the two modes stay
        # comparable — so it reads ~1/B of aggregate: a latency figure, NOT
        # comparable to the host/fused engines' single-sequence fps.
        print("Sharded dataset pass: %.2f fps aggregate (all sequences / "
              "total wall)" % fps)
        if seq_fps:
            print("Sharded dataset pass: %.2f fps per-sequence mean "
                  "(completion rate, ex-prep; chunks of %d run concurrently)"
                  % (float(np.mean(seq_fps)), chunk))
        return fps

    def prepare_inputs(self, sequence):
        """Decode frames and start their device upload — the preload phase
        the reference excludes from its fps clock (model/tracker.py:88-91).
        Returns a dict consumable by `_prepare(..., preloaded=...)`."""
        images_np = np.stack([sequence[t][0] for t in range(len(sequence))])
        return dict(images=images_np,
                    frame0_dev=jax.device_put(images_np[0]),
                    chunks=self._upload_chunks(images_np[1:]))

    def _prepare(self, sequence, preloaded=None):
        """Host-side per-sequence prep: frames, objects, init solves."""
        if preloaded is None:
            images_np = np.stack([sequence[t][0] for t in range(len(sequence))])
            frame0_dev = jax.device_put(images_np[0])
            chunks = None
        else:
            images_np = preloaded["images"]
            frame0_dev = preloaded["frame0_dev"]
            chunks = preloaded["chunks"]
        T = images_np.shape[0]
        im_size = tuple(images_np.shape[1:3])
        objects = self._collect_objects(sequence)

        # augment only — the GN-CG init solves are deferred to _run_group,
        # which batches every object in the shape group into ONE extract +
        # ONE vmapped solve program (instead of 2 dispatches per object
        # inside the timed region). Each object's batch is packed + its
        # async upload started right here (slot-0 elision + bit-packed
        # masks, _pack_aug_batch), so the transfer streams while later
        # objects/sequences augment; copy=False is safe because the batch
        # is committed before the augmenter's next call reuses its buffers.
        aug = []
        for obj_id, start_idx, mask, image in objects:
            rng = np.random.RandomState(0)
            im_aug, lb_aug = self.augmenter.augment_first_frame(
                image, mask[..., None], rng, copy=False)
            aug.append(self._pack_aug_batch(im_aug, lb_aug))

        n_track = T - 1
        bucket_T = -(-n_track // self.length_bucket) * self.length_bucket
        # bucket the object count too (pad to the next power of two) so
        # differing object counts share groups and scan programs
        n_pad = 1 << (len(objects) - 1).bit_length()
        group_key = (im_size, bucket_T, n_pad)
        return dict(images=images_np, frame0_dev=frame0_dev, chunks=chunks,
                    objects=objects, aug=aug, n_track=n_track,
                    bucket_T=bucket_T, n_pad=n_pad, im_size=im_size,
                    group_key=group_key)

    def _run_group(self, seq_preps, key, as_device=False, timer=None):
        """Track one shape-group of prepared sequences in a single sharded
        vmapped scan program. as_device=True returns the raw (Bp, T, H, W)
        device label volume without downloading (callers that want the
        download outside a timing window, e.g. bench.py, fetch it
        themselves); only merge_mode='online' supports it. An optional
        PhaseTimer attributes the host-side dispatch wall to its three
        stages (init-solve upload+dispatch, per-sequence feature buffer
        build, scan dispatch) — bench.py uses this to report where a
        batched pass's wall goes."""
        from ..utils.profiling import PhaseTimer
        timer = timer or PhaseTimer(sync=False)
        im_size, bucket_T, n_obj = key
        B = len(seq_preps)
        Bp = -(-B // self.n_devices) * self.n_devices  # pad to mesh multiple

        # DISPATCH ORDER IS THE OPTIMISATION HERE: the TPU executes programs
        # in enqueue order, so the extracts (whose frame chunks are
        # device-resident from the pre-clock preload) are enqueued FIRST and
        # execute while the init program's augmented-batch uploads are still
        # streaming over the tunnel; the init solve is enqueued after.
        # Enqueueing init first (the round-3 order) stalled the whole stream
        # behind its uploads — measured as a 590-800 ms "feats" dispatch wall
        # on B=2 groups (bench.py b2_wall_ms) with the device idle.
        H, W = im_size
        t_f0, c_f0 = time.perf_counter(), time.thread_time()
        # TWO dispatches for the whole group (stack + fused shard_mapped
        # extract) instead of 2 per sequence: mesh-pad rows repeat the last
        # sequence's already-device-resident chunks (no upload, outputs are
        # dropped), and each row's chunk list is padded to the group's fixed
        # chunk count by repeating its last chunk — the clamped bucket
        # gather (rows >= n_track read frame n_track-1) never reads them
        nc_grp = -(-bucket_T // self.extract_chunk)
        rows, nts = [], []
        for i in range(Bp):
            sequence, prep = seq_preps[min(i, B - 1)]
            chunks = prep.get("chunks")
            if chunks is None:
                chunks = self._upload_chunks(prep["images"][1:])
                prep["chunks"] = chunks  # reused by start-frame lookups below
            cl = [c for c, _ in chunks]
            cl += [cl[-1]] * (nc_grp - len(cl))
            rows.append(tuple(cl))
            nts.append(prep["n_track"])
        stacked = self._stack_rows(tuple(rows))
        feats_bufs = self._grp_extract(self.backbone, stacked,
                                       jnp.asarray(nts, jnp.int32), bucket_T)
        del stacked
        timer.add("group_feats", time.perf_counter() - t_f0,
                  time.thread_time() - c_f0)

        # ONE batched extract + vmapped GN-CG over every object in the group
        # (the solves were deferred by _prepare, which already started the
        # packed uploads): a B=4 single-object group costs one dispatch pair
        # instead of eight inside the fps window. Start frames come from the
        # device-resident preload (slot-0 elision, _pack_aug_batch), and the
        # scan's start_masks come back from the device (sm_all).
        with timer.phase("group_init"):
            f0 = []
            for _, prep in seq_preps:
                for obj_id, start_idx, mask, image in prep["objects"]:
                    d = prep["frame0_dev"] if start_idx == 0 else \
                        self._frame_dev(start_idx, prep["images"],
                                        prep["chunks"])
                    if d is None:  # no preload: upload the start frame now
                        d = jnp.asarray(prep["images"][start_idx])
                    f0.append(d)
            pairs = [p for _, prep in seq_preps for p in prep["aug"]]
            # pad the object slots to the GROUP's fixed width (Bp * n_obj):
            # _init_objects is specialized on its tuple length, so without
            # this a partial final chunk or a mixed 1-/2-object chunk would
            # recompile the init program inside the fps clock even after the
            # speedrun warm-up. Padded slots repeat object 0's device-
            # resident refs (no upload, ~18 ms device per slot) and their
            # output rows are never read (obj_ofs spans real objects, which
            # come first)
            n_slots = Bp * n_obj
            f0 += [f0[0]] * (n_slots - len(f0))
            pairs = pairs + [pairs[0]] * (n_slots - len(pairs))
            params_all, states_all, sm_all = self._init_objects(
                self.backbone, self._disc_params0, tuple(f0),
                tuple(a for a, _ in pairs),
                tuple(b for _, b in pairs))
        obj_ofs = np.cumsum([0] + [len(prep["objects"])
                                   for _, prep in seq_preps])

        dp_b, ds_b, sf_b, sm_b, lut_b = [], [], [], [], []
        for i in range(B):
            sequence, prep = seq_preps[i]
            o0, o1 = int(obj_ofs[i]), int(obj_ofs[i + 1])
            disc_params = jax.tree.map(lambda x: x[o0:o1], params_all)
            disc_states = jax.tree.map(lambda x: x[o0:o1], states_all)

            # pad the object axis to the group width: padded objects have a
            # start frame beyond the sequence (never active), empty start
            # masks, and LUT entries mapping to background
            n_real = len(prep["objects"])
            assert n_real <= n_obj, (
                f"sequence '{sequence.name}' prepared {n_real} objects but its "
                f"metadata grouped it at width {n_obj} — start_frames and "
                "obj_ids disagree")
            opad = n_obj - n_real
            if opad:
                rep = lambda t: jnp.concatenate(
                    [t, jnp.repeat(t[-1:], opad, axis=0)])
                disc_params = jax.tree.map(rep, disc_params)
                disc_states = jax.tree.map(rep, disc_states)
            sf = np.full(n_obj, bucket_T + 2, np.int32)
            sf[:n_real] = [o[1] for o in prep["objects"]]
            # start masks: the device-derived slot-0 masks (sm_all) — padded
            # object rows are zeros, as before (they are never active, their
            # start frame is past the bucket end)
            sm = sm_all[o0:o1]
            if opad:
                sm = jnp.concatenate(
                    [sm, jnp.zeros((opad, H, W), sm.dtype)])
            lut = np.zeros(n_obj + 1, np.int32)
            lut[1:n_real + 1] = [o[0] for o in prep["objects"]]

            dp_b.append(disc_params)
            ds_b.append(disc_states)
            sf_b.append(sf)
            sm_b.append(sm)
            lut_b.append(lut)

        for i in range(B, Bp):  # mesh-multiple padding: reuse the last
            # sequence's arrays (outputs are dropped; the feats rows were
            # already padded inside the fused group extract)
            for lst in (dp_b, ds_b, sf_b, sm_b, lut_b):
                lst.append(lst[B - 1])

        # windowed frame-parallel program when every real object in the
        # group re-solve-aligns to window boundaries (bit-identical there;
        # see BatchedSequenceTracker.run_sequence's routing)
        w_win = max(int(self.disc_cfg.train_skipping), 1)
        windowed = (bucket_T % w_win == 0) and all(
            not self.disc_cfg.update_filters
            or all(o[1] % w_win == 0 for o in prep["objects"])
            for _, prep in seq_preps)
        with timer.phase("group_scan"):
            stack = lambda xs: jax.tree.map(lambda *a: jnp.stack(a), *xs)
            outs, _, _ = self._get_vscan(im_size, windowed)(
                self.refiner, feats_bufs, stack(dp_b),
                stack(ds_b), jnp.asarray(np.stack(sf_b)),
                jnp.stack(sm_b), jnp.asarray(np.stack(lut_b)))
        if as_device:
            assert self.merge_mode == "online"
            return outs
        outs = jax.device_get(outs)

        results = {}
        for i in range(B):
            sequence, prep = seq_preps[i]
            if self.merge_mode == "online":
                frame0 = np.asarray(self._frame0_label(prep["objects"], im_size))
                labels = [frame0] + [outs[i, t] for t in range(prep["n_track"])]
            else:
                fg = np.concatenate([np.zeros((1,) + outs.shape[2:], outs.dtype),
                                     outs[i, :prep["n_track"]]])
                for k, (obj_id, start_idx, mask, _) in enumerate(prep["objects"]):
                    fg[start_idx, k] = mask
                lut = jnp.asarray([0] + [o[0] for o in prep["objects"]], jnp.int32)
                merged = self._merge_volume(jnp.asarray(fg), lut)
                labels = [np.asarray(merged[t]) for t in range(len(prep["images"]))]
            results[sequence.name] = [np.asarray(l).astype(np.uint8) for l in labels]
        return results
