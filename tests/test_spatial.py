"""Spatially-partitioned inference (parallel/spatial.py) must agree with the
single-device program: GSPMD halo exchange is data movement, not math, so the
conv-only backbone pyramid should match to float rounding and the full frame
step (with its cross-shard resize contractions) to 1e-5."""
from dataclasses import replace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frtm_tpu.config import eval_config
from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
from frtm_tpu.models.discriminator import init_disc_params
from frtm_tpu.parallel.spatial import (make_spatial_mesh, make_spatial_extract,
                                       make_spatial_frame_step)

ARCH = "resnet18"


def _setup():
    cfg = eval_config(ARCH, fast=True)
    cfg = replace(cfg, disc=replace(cfg.disc, c_channels=16))
    backbone = init_resnet(jax.random.PRNGKey(1), ARCH)
    ch = {L: c for L, c in resnet_out_channels(ARCH).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch,
                               use_bn=cfg.refnet_use_bn)
    disc = init_disc_params(jax.random.PRNGKey(3), cfg.disc)
    return cfg, backbone, refiner, disc


def _images(batch, h=128, w=96, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32) * 255.0)


def test_spatial_extract_matches_single():
    from frtm_tpu.models.resnet import extract_features
    cfg, backbone, _, _ = _setup()
    mesh = make_spatial_mesh(n_spatial=4)
    images = _images(1)

    sharded = make_spatial_extract(ARCH, mesh, output_layers=cfg.refnet_layers)
    got = jax.device_get(sharded(backbone, images))
    want = jax.device_get(extract_features(backbone, images, ARCH,
                                           output_layers=cfg.refnet_layers))
    assert set(got) == set(want)
    for L in want:
        # not bitwise: partitioning moves XLA's fusion boundaries, which
        # changes rounding on a handful of elements (measured max 1.1e-5 on
        # O(1) activations at 2/12288 elements)
        np.testing.assert_allclose(got[L], want[L], rtol=0, atol=5e-5,
                                   err_msg=L)


def test_spatial_frame_step_matches_single():
    cfg, backbone, refiner, disc = _setup()
    mesh = make_spatial_mesh(n_spatial=4)
    images = _images(1)

    step = make_spatial_frame_step(cfg, mesh)
    got = np.asarray(step(backbone, refiner, disc, images))
    assert got.shape == (1, 128, 96, 1)

    # a user-built 1-D ('spatial',) mesh must work too (pure SP, no 'data')
    from jax.sharding import Mesh
    mesh1d = Mesh(np.asarray(jax.devices()[:4]), ("spatial",))
    got1d = np.asarray(make_spatial_frame_step(cfg, mesh1d)(
        backbone, refiner, disc, images))
    np.testing.assert_allclose(got1d, got, rtol=0, atol=1e-5)

    # single-device reference: the same fn, plain jit
    from frtm_tpu.models.resnet import extract_features
    from frtm_tpu.models.seg_network import seg_network_apply
    from frtm_tpu.models.discriminator import disc_apply

    @jax.jit
    def single(backbone, refiner, disc, image):
        feats = extract_features(backbone, image, ARCH,
                                 output_layers=cfg.refnet_layers)
        scores, _ = disc_apply(disc, feats[cfg.disc.layer])
        logits = seg_network_apply(refiner, scores, feats, image.shape[1:3],
                                   layers=cfg.refnet_layers)
        return jax.nn.sigmoid(logits)

    want = np.asarray(single(backbone, refiner, disc, images))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_spatial_dp_combo_matches_per_sample():
    """2x4 ('data','spatial') mesh: two frames, each split over 4 devices —
    every sample must equal its own single-device run (the DP axis must not
    mix samples; eval BN uses folded stats, so there is no cross-batch
    coupling to worry about)."""
    cfg, backbone, refiner, disc = _setup()
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_spatial_mesh(n_spatial=4, n_data=2)
    images = _images(2)

    step = make_spatial_frame_step(cfg, mesh)
    got = np.asarray(step(backbone, refiner, disc, images))

    single = make_spatial_mesh(n_spatial=1, n_data=1,
                               devices=jax.devices()[:1])
    step1 = make_spatial_frame_step(cfg, single)
    for b in range(2):
        want = np.asarray(step1(backbone, refiner, disc, images[b:b + 1]))
        np.testing.assert_allclose(got[b:b + 1], want, rtol=0, atol=1e-5,
                                   err_msg=f"sample {b}")


def test_spatially_sharded_scan_tracker_matches_single():
    """BatchedSequenceTracker(mesh=...) — the multi-chip single-sequence
    mode: the whole fused scan runs with activations sharded along frame
    height over the 'spatial' axis. Output labels must match the unsharded
    tracker (same math; partitioning only moves fusion boundaries, so allow
    the usual borderline-pixel tolerance)."""
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    from dataclasses import replace as _rp

    cfg = eval_config(ARCH, fast=True, num_aug=2)
    cfg = _rp(cfg, disc=_rp(cfg.disc, init_iters=(2,), update_iters=(2,),
                            memory_size=4, c_channels=8, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), ARCH)
    ch = {L: c for L, c in resnet_out_channels(ARCH).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch,
                               use_bn=cfg.refnet_use_bn)
    seq = make_moving_square_sequence(n_frames=5, size=(64, 96), square=16,
                                      seed=3)

    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                    scan_bucket=2)
    out_single, _ = single.run_sequence(seq)

    mesh = make_spatial_mesh(n_spatial=4)
    sharded = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                     scan_bucket=2, mesh=mesh)
    out_sharded, _ = sharded.run_sequence(seq)

    assert len(out_single) == len(out_sharded) == 5
    for t, (a, b) in enumerate(zip(out_single, out_sharded)):
        frac_diff = np.mean(a != b)
        assert frac_diff < 0.005, (t, frac_diff)


@pytest.mark.slow
def test_spatially_sharded_deferred_merge_matches_single():
    """mesh= x merge_mode='deferred' (the legacy YTVOS path): the deferred
    merge assembles the soft volume with jnp ops OUTSIDE jit on mesh-sharded
    scan outputs — must agree with the unsharded deferred tracker."""
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    from dataclasses import replace as _rp

    cfg = eval_config(ARCH, fast=True, num_aug=2)
    cfg = _rp(cfg, disc=_rp(cfg.disc, init_iters=(2,), update_iters=(2,),
                            memory_size=4, c_channels=8, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), ARCH)
    ch = {L: c for L, c in resnet_out_channels(ARCH).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch,
                               use_bn=cfg.refnet_use_bn)
    seq = make_moving_square_sequence(n_frames=4, size=(64, 96), square=16,
                                      n_objects=2, seed=5)

    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                    scan_bucket=2, merge_mode="deferred")
    out_single, _ = single.run_sequence(seq)

    mesh = make_spatial_mesh(n_spatial=4)
    sharded = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                     scan_bucket=2, merge_mode="deferred",
                                     mesh=mesh)
    out_sharded, _ = sharded.run_sequence(seq)

    assert len(out_single) == len(out_sharded) == 4
    for t, (a, b) in enumerate(zip(out_single, out_sharded)):
        frac_diff = np.mean(a != b)
        assert frac_diff < 0.005, (t, frac_diff)


@pytest.mark.slow
def test_spatially_sharded_multilayer_scan_matches_single():
    """mesh= x disc_layers=('layer4','layer3'): per-layer target models (the
    legacy multilayer capability) on the spatially-sharded fused scan must
    agree with the unsharded multilayer scan."""
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence
    from dataclasses import replace as _rp

    cfg = eval_config(ARCH, fast=True, num_aug=2)
    disc = _rp(cfg.disc, init_iters=(2,), update_iters=(2,), memory_size=4,
               c_channels=8, train_skipping=2)
    cfg = _rp(cfg, disc=disc, disc_layers=("layer4", "layer3"))
    backbone = init_resnet(jax.random.PRNGKey(1), ARCH)
    ch = {L: c for L, c in resnet_out_channels(ARCH).items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch,
                               in_channels=len(cfg.disc_layers),
                               use_bn=cfg.refnet_use_bn)
    seq = make_moving_square_sequence(n_frames=4, size=(64, 96), square=16,
                                      seed=6)

    single = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                    scan_bucket=2)
    out_single, _ = single.run_sequence(seq)

    mesh = make_spatial_mesh(n_spatial=4)
    sharded = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                     scan_bucket=2, mesh=mesh)
    out_sharded, _ = sharded.run_sequence(seq)

    for t, (a, b) in enumerate(zip(out_single, out_sharded)):
        frac_diff = np.mean(a != b)
        assert frac_diff < 0.005, (t, frac_diff)
