"""Sharded multi-sequence inference: results must match per-sequence fused
tracking, across an 8-virtual-device mesh; the streaming run_dataset must
bound memory to one chunk."""
import gc
import weakref
from dataclasses import replace

import numpy as np
import pytest
import jax

from frtm_tpu.config import eval_config
from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
from frtm_tpu.parallel import make_mesh, ShardedSequenceTracker
from frtm_tpu.data.synthetic import make_moving_square_sequence


def _tiny_cfg():
    cfg = eval_config("resnet18", fast=True, num_aug=2)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(2,), update_iters=(2,),
                                    memory_size=4, c_channels=8, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)
    return cfg, backbone, refiner


@pytest.mark.slow
def test_sharded_matches_single_sequence():
    cfg = eval_config("resnet18", fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5), update_iters=(3,),
                                    memory_size=8, c_channels=16, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)

    seqs = [make_moving_square_sequence(n_frames=5, size=(64, 96), square=20,
                                        seed=s, name=f"s{s}") for s in range(3)]

    mesh = make_mesh(8)
    sharded = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=4, length_bucket=4)
    results = sharded.run_sequences(seqs)
    assert set(results.keys()) == {"s0", "s1", "s2"}

    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4)
    for seq in seqs:
        want, _ = single.run_sequence(seq)
        got = results[seq.name]
        assert len(got) == len(want) == 5
        for t, (a, b) in enumerate(zip(got, want)):
            frac_diff = np.mean(a != b)
            assert frac_diff < 0.01, (seq.name, t, frac_diff)


@pytest.mark.slow
def test_sharded_mixed_object_counts():
    """Sequences with 1 and 2 objects share a group: the object axis pads to
    the group width (inactive objects, background LUT) and results still
    match per-sequence tracking."""
    cfg = eval_config("resnet18", fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5), update_iters=(3,),
                                    memory_size=8, c_channels=16, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)

    seqs = [make_moving_square_sequence(n_frames=5, size=(64, 96), square=18,
                                        n_objects=n, seed=10 + n, name=f"m{n}")
            for n in (1, 2)]
    mesh = make_mesh(8)
    sharded = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=4, length_bucket=4)
    results = sharded.run_sequences(seqs)
    # one group: both sequences pad to 2 objects
    assert len(sharded._vscan_cache) == 1
    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4)
    for seq in seqs:
        want, _ = single.run_sequence(seq)
        for t, (a, b) in enumerate(zip(results[seq.name], want)):
            assert np.mean(a != b) < 0.01, (seq.name, t)


@pytest.mark.slow
def test_sharded_mixed_chunk_counts_in_one_group():
    """Sequences whose lengths share a bucket but need DIFFERENT chunk
    counts (n_track 1 -> 1 chunk, n_track 4 -> 2 chunks at extract_chunk=2)
    must group into one program: the fused group extract pads short rows by
    repeating their last chunk, and the clamped bucket gather never reads
    the pad — results match per-sequence tracking exactly."""
    cfg, backbone, refiner = _tiny_cfg()
    seqs = [make_moving_square_sequence(n_frames=n, size=(64, 96), square=18,
                                        seed=20 + n, name=f"c{n}")
            for n in (2, 5)]  # n_track 1 and 4, both bucket 4
    mesh = make_mesh(8)
    sharded = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=2, length_bucket=4)
    assert (sharded._group_key_meta(seqs[0])
            == sharded._group_key_meta(seqs[1]))
    results = sharded.run_sequences(seqs)
    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=2)
    for seq in seqs:
        want, _ = single.run_sequence(seq)
        assert len(results[seq.name]) == len(want) == len(seq)
        for t, (a, b) in enumerate(zip(results[seq.name], want)):
            assert np.mean(a != b) < 0.01, (seq.name, t)


@pytest.mark.slow
def test_partial_final_chunk_reuses_group_programs():
    """A group whose sequence count does not divide the chunk width runs a
    smaller final chunk. The object-slot padding (_run_group pads the init
    tuples to Bp * n_obj) plus mesh padding must make that chunk reuse the
    SAME init/scan programs the warm-up compiled — a fresh trace here would
    put a ~90 s remote compile inside the fps clock on real hardware."""
    cfg, backbone, refiner = _tiny_cfg()
    seqs = [make_moving_square_sequence(n_frames=3, size=(32, 48), square=12,
                                        seed=30 + s, name=f"p{s}")
            for s in range(3)]  # chunks of 2 -> batches [2, 1]
    mesh = make_mesh(2)
    sharded = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=2, length_bucket=4)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        sharded.run_dataset(seqs, td, speedrun=True)
    assert sharded._init_objects._cache_size() == 1, \
        "the partial final chunk re-traced the init program"
    assert len(sharded._vscan_cache) == 1


@pytest.mark.slow
def test_sharded_routes_windowed_and_general():
    """Groups where every object's start frame aligns to the re-solve cadence
    take the vmapped WINDOWED program (the single-sequence fast path,
    measured ~2.3x faster per sequence on v5e than vmapping the per-frame
    scan); a mid-sequence entry off the cadence falls back to the general
    per-frame program. Both must match the single-sequence tracker."""
    cfg = eval_config("resnet18", fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5),
                                    update_iters=(3,), memory_size=8,
                                    c_channels=16, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)

    aligned = make_moving_square_sequence(n_frames=5, size=(64, 96), square=18,
                                          n_objects=2, seed=4, name="al")
    # different length -> different group, so each group routes independently
    unaligned = make_moving_square_sequence(n_frames=7, size=(64, 96),
                                            square=18, n_objects=2, seed=5,
                                            name="un")
    unaligned.start_frames = {"00000": [1], "00001": [2]}  # 1 % 2 != 0

    mesh = make_mesh(8)
    sharded = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=4, length_bucket=4)
    results = sharded.run_sequences([aligned, unaligned])
    routes = {k[1] for k in sharded._vscan_cache}
    assert routes == {True, False}, sharded._vscan_cache.keys()

    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4)
    for seq in (aligned, unaligned):
        want, _ = single.run_sequence(seq)
        for t, (a, b) in enumerate(zip(results[seq.name], want)):
            assert np.mean(a != b) < 0.01, (seq.name, t)


class _Token:
    """Weakref-able marker attached to each prepared chunk."""


@pytest.mark.slow
def test_run_dataset_streams_with_bounded_memory(tmp_path):
    """A 100+-sequence dataset through the streaming run_dataset: prepared
    chunks (decoded frames + features + init state) must be RELEASED before
    later chunks run — at most one chunk's preps alive at any _run_group
    call — and the written PNGs must match run_sequences' output."""
    cfg, backbone, refiner = _tiny_cfg()
    n_seqs = 104
    seqs = [make_moving_square_sequence(n_frames=3, size=(32, 48), square=12,
                                        seed=s, name=f"d{s:03d}")
            for s in range(n_seqs)]

    mesh = make_mesh(8)
    tracker = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=2, length_bucket=4)

    refs, alive_at_call = [], []
    orig = tracker._run_group

    def spy(seq_preps, key, **kw):
        gc.collect()
        alive_at_call.append(sum(1 for r in refs if r() is not None))
        for _, prep in seq_preps:
            prep["_token"] = _Token()
            refs.append(weakref.ref(prep["_token"]))
        return orig(seq_preps, key, **kw)

    tracker._run_group = spy
    out = tmp_path / "out"
    fps = tracker.run_dataset(seqs, out)
    assert fps > 0

    chunk = tracker.n_devices  # default chunk_multiple=1
    assert len(refs) == n_seqs
    # every _run_group call started with all PREVIOUS chunks released
    assert max(alive_at_call) == 0, alive_at_call

    # outputs exist for every sequence and match the non-streaming path
    from frtm_tpu.data.image import imread
    sample = seqs[0]
    ref_results = tracker.run_sequences([sample])[sample.name]
    for t, f in enumerate(sample.frame_names):
        png = out / sample.name / (f + ".png")
        assert png.exists()
        np.testing.assert_array_equal(np.asarray(imread(png)).squeeze(),
                                      ref_results[t].squeeze())
    assert sum(1 for _ in out.iterdir()) == n_seqs


def test_sharded_run_dataset_speedrun_warms_programs(tmp_path, capsys):
    """run_dataset(speedrun=True) compiles every distinct group program
    BEFORE the fps clock (round-3 verdict #5: a cold cache otherwise puts
    the first chunk's compile into the aggregate figure): every _run_group
    call inside the clocked loop must hit an already-populated program
    cache, and outputs must be byte-identical to the default pass."""
    cfg, backbone, refiner = _tiny_cfg()
    seqs = [make_moving_square_sequence(n_frames=3, size=(32, 48), square=12,
                                        seed=s, name=f"w{s:02d}")
            for s in range(10)]
    # a second shape group (longer sequences -> different length bucket)
    seqs += [make_moving_square_sequence(n_frames=7, size=(32, 48), square=12,
                                         seed=20 + s, name=f"wl{s}")
             for s in range(2)]

    mesh = make_mesh(8)
    tracker = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=2, length_bucket=4)

    def n_programs():
        # executables traced+compiled under the vmapped-scan jits (the two
        # groups here share a _vscan_cache entry but have different shapes,
        # i.e. different XLA programs under the same jit wrapper)
        return sum(f._cache_size() for f in tracker._vscan_cache.values())

    deltas = []
    orig = tracker._run_group

    def spy(seq_preps, key, **kw):
        before = n_programs()
        out = orig(seq_preps, key, **kw)
        deltas.append(n_programs() - before)
        return out

    tracker._run_group = spy
    tracker.run_dataset(list(seqs), tmp_path / "a", speedrun=True)
    assert "warmed 2 group program(s)" in capsys.readouterr().out
    # the two warm-up calls compile; every CLOCKED call hits a warm program
    assert deltas[0] == 1 and deltas[1] == 1 and len(deltas) > 2
    assert all(d == 0 for d in deltas[2:]), deltas

    tracker2 = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                      extract_chunk=2, length_bucket=4)
    tracker2.run_dataset(list(seqs), tmp_path / "b")
    files_a = sorted(p.relative_to(tmp_path / "a")
                     for p in (tmp_path / "a").rglob("*.png"))
    files_b = sorted(p.relative_to(tmp_path / "b")
                     for p in (tmp_path / "b").rglob("*.png"))
    assert files_a == files_b and len(files_a) == 44
    for rel in files_a:
        assert (tmp_path / "a" / rel).read_bytes() == \
               (tmp_path / "b" / rel).read_bytes(), rel


def test_sharded_pipelined_run_dataset_matches_default(tmp_path):
    """run_dataset(pipeline=True) prefetches the NEXT chunk's host prep on a
    background thread; the written PNGs must be byte-identical to the
    default streaming pass (deterministic per-object augment RNG; _prepare's
    copy=True batches never alias the augmenter's reused buffers)."""
    cfg, backbone, refiner = _tiny_cfg()
    seqs = [make_moving_square_sequence(n_frames=3, size=(32, 48), square=12,
                                        seed=s, name=f"q{s:02d}")
            for s in range(10)]  # chunk=8 -> 2 chunks, prefetch exercised

    mesh = make_mesh(8)
    tracker = ShardedSequenceTracker(cfg, backbone, refiner, mesh,
                                     extract_chunk=2, length_bucket=4)
    tracker.run_dataset(list(seqs), tmp_path / "a")
    tracker.run_dataset(list(seqs), tmp_path / "b", pipeline=True)

    files_a = sorted(p.relative_to(tmp_path / "a")
                     for p in (tmp_path / "a").rglob("*.png"))
    files_b = sorted(p.relative_to(tmp_path / "b")
                     for p in (tmp_path / "b").rglob("*.png"))
    assert files_a == files_b and len(files_a) == 30
    for rel in files_a:
        assert (tmp_path / "a" / rel).read_bytes() == \
               (tmp_path / "b" / rel).read_bytes(), rel
