"""Device-side augmentation must reproduce the host pipeline: same specs
(same RNG stream), near-identical pixels/labels (XLA vs cv2 bicubic), and the
fused tracker must work end-to-end with it."""
from dataclasses import replace

import numpy as np
import pytest
import jax

from frtm_tpu.config import eval_aug_params, eval_config
from frtm_tpu.models.augmenter import ImageAugmenter
from frtm_tpu.models.device_augmenter import DeviceAugmenter
from frtm_tpu.data.synthetic import make_moving_square_sequence


def _scene(rng, H=96, W=128, sq=28):
    im = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    mask = np.zeros((H, W, 1), np.float32)
    mask[30:30 + sq, 40:40 + sq] = 1
    im[30:30 + sq, 40:40 + sq] = (rng.rand(sq, sq, 3) * 120 + 120).astype(np.uint8)
    return im, mask


def test_device_matches_host_augmentation(rng):
    im, mask = _scene(rng)
    host = ImageAugmenter(eval_aug_params(4), backend="cv2")
    dev = DeviceAugmenter(eval_aug_params(4))

    h_img, h_lbl = host.augment_first_frame(im, mask, np.random.RandomState(0))
    d_img, d_lbl = dev.augment_first_frame(im, mask, np.random.RandomState(0))
    d_img, d_lbl = np.asarray(d_img), np.asarray(d_lbl)

    assert d_img.shape == h_img.shape == (4, 96, 128, 3)
    # same spec stream -> same geometric placement: labels nearly identical
    for k in range(4):
        diff = np.mean((h_lbl[k] > 0) != (d_lbl[k] > 0))
        assert diff < 0.01, (k, diff)
    # pixels agree within cv2-vs-XLA bicubic tolerance
    assert np.percentile(np.abs(h_img[1:] - d_img[1:]), 98) < 8.0


@pytest.mark.slow
def test_tracker_with_device_augmentation():
    from frtm_tpu.models import init_resnet, init_seg_network, resnet_out_channels
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker

    seq = make_moving_square_sequence(n_frames=5, size=(96, 128), square=24, seed=2)
    cfg = eval_config("resnet18", fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5), update_iters=(3,),
                                    memory_size=8, c_channels=16, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch)

    host_tr = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                     augment_backend="host")
    dev_tr = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                    augment_backend="device")
    out_h, _ = host_tr.run_sequence(seq)
    out_d, _ = dev_tr.run_sequence(seq)
    for t, (a, b) in enumerate(zip(out_h, out_d)):
        frac = np.mean(a != b)
        assert frac < 0.02, (t, frac)
