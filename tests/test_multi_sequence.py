"""Sharded multi-sequence inference: results must match per-sequence fused
tracking, across an 8-virtual-device mesh."""
from dataclasses import replace

import numpy as np
import pytest
import jax

from frtm_tpu.config import eval_config
from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
from frtm_tpu.parallel import make_mesh, ShardedSequenceTracker
from frtm_tpu.data.synthetic import make_moving_square_sequence


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
