"""Exactness gate for the compact augment encoding + device compose
(VERDICT r4 #1): the device-composed batch must match the dense host
augmenter per the documented bound — labels, slot 0, every paste rectangle,
and identity-background slots bit-exact; non-identity backgrounds within
1 uint8 count outside the paste (conv summation order / pre-blur uint8
quantization of warped bases)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frtm_tpu.config import eval_aug_params
from frtm_tpu.models.augmenter import ImageAugmenter
from frtm_tpu.models.aug_compose import (
    compose_aug_batch, pack_compact_batch, masked_paste,
)


def _frame_and_mask(h=96, w=144, sq=28, seed=3):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 256, (h, w, 3), np.uint8)
    # smooth it a bit so inpainting has structure to work with
    image = (image // 2 + 64).astype(np.uint8)
    mask = np.zeros((h, w), np.uint8)
    y, x = h // 3, w // 3
    mask[y:y + sq, x:x + sq] = 1
    image[y:y + sq, x:x + sq] = [200, 60, 30]  # distinct target appearance
    return image, mask


def _augment_both(num_aug=8, seed=0):
    image, mask = _frame_and_mask()
    aug = ImageAugmenter(eval_aug_params(num_aug))
    ims, lbs = aug.augment_first_frame(
        image, mask[..., None], np.random.RandomState(seed))
    compact = aug.augment_first_frame(
        image, mask[..., None], np.random.RandomState(seed), compact=True)
    return image, ims, lbs, compact


def test_compose_matches_dense_augment():
    image, ims, lbs, compact = _augment_both()
    K = ims.shape[0]
    packed = pack_compact_batch(compact)
    got_im, got_lb = jax.jit(compose_aug_batch)(jnp.asarray(image), packed)
    got_im = np.asarray(got_im)
    got_lb = np.asarray(got_lb)

    assert np.array_equal(got_lb, lbs), "labels must be bit-exact"
    assert np.array_equal(got_im[0], ims[0]), "slot 0 is the real frame"

    # the fixed seed must exercise every background class or the gate is
    # vacuous: identity, blur-only, and scale-warped specs
    kinds = [(int(compact.bg_idx[i]),
              compact.kernels[i].shape != (1, 1)) for i in range(K - 1)]
    assert (0, False) in kinds, "no identity-background slot drawn"
    assert any(k[1] for k in kinds), "no blurred-background slot drawn"
    assert any(k[0] > 0 for k in kinds), "no scale-warped background drawn"

    for k in range(1, K):
        base_idx, blurred = kinds[k - 1]
        diff = np.abs(got_im[k].astype(np.int32) - ims[k].astype(np.int32))
        y, x, h, w = compact.boxes[k - 1]
        assert diff[y:y + h, x:x + w].max() == 0, \
            f"slot {k}: paste rectangle must be bit-exact"
        if base_idx == 0 and not blurred:
            assert diff.max() == 0, f"slot {k}: identity bg must be bit-exact"
        else:
            assert diff.max() <= 1, \
                f"slot {k}: non-identity bg exceeded the 1-count bound"
            # and the disagreement must be rare, not structural
            assert (diff > 0).mean() < 0.35, (k, (diff > 0).mean())


def test_pack_padding_knobs_change_nothing():
    # multi-object callers force a common signature (n_bases / kernel_size /
    # patch_bucket) across objects; padding must not change the composition
    image, ims, lbs, compact = _augment_both()
    a = pack_compact_batch(compact)
    b = pack_compact_batch(compact, n_bases=len(compact.warp_bases) + 2,
                           kernel_size=11, patch_bucket=(192, 192))
    im_a, lb_a = jax.jit(compose_aug_batch)(jnp.asarray(image), a)
    im_b, lb_b = jax.jit(compose_aug_batch)(jnp.asarray(image), b)
    assert np.array_equal(np.asarray(im_a), np.asarray(im_b))
    assert np.array_equal(np.asarray(lb_a), np.asarray(lb_b))


def test_masked_paste_respects_valid_region_and_bounds():
    img = jnp.zeros((10, 12, 1), jnp.uint8)
    patch = jnp.full((8, 8, 1), 7, jnp.uint8)
    # valid 3x2 region pasted at the bottom-right corner: the padded patch
    # region hangs off the canvas and must not wrap, shift, or write
    out = np.asarray(masked_paste(img, patch, jnp.asarray([7, 10, 3, 2])))
    want = np.zeros((10, 12, 1), np.uint8)
    want[7:10, 10:12] = 7
    assert np.array_equal(out, want)


@pytest.mark.slow
@pytest.mark.parametrize("n_objects", [1, 2])
def test_fused_tracker_compact_matches_dense(n_objects):
    """End-to-end: the fused tracker with the compact init path must produce
    the same masks as the dense default (the <=1-count background deltas on
    one augment slot must not move tracked-mask pixels beyond the standard
    borderline tolerance)."""
    from dataclasses import replace
    from frtm_tpu.config import eval_config
    from frtm_tpu.models import (init_resnet, init_seg_network,
                                 resnet_out_channels)
    from frtm_tpu.runtime.sequence_tracker import BatchedSequenceTracker
    from frtm_tpu.data.synthetic import make_moving_square_sequence

    cfg = eval_config("resnet18", fast=True, num_aug=3)
    cfg = replace(cfg, disc=replace(cfg.disc, init_iters=(3, 5),
                                    update_iters=(3,), memory_size=8,
                                    c_channels=16, train_skipping=2))
    backbone = init_resnet(jax.random.PRNGKey(1), "resnet18")
    ch = {L: c for L, c in resnet_out_channels("resnet18").items()
          if L in cfg.refnet_layers}
    refiner = init_seg_network(jax.random.PRNGKey(2), ch,
                               use_bn=cfg.refnet_use_bn)
    seq = make_moving_square_sequence(n_frames=6, size=(96, 128), square=24,
                                      n_objects=n_objects, seed=2)
    dense = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                   aug_compact=False)
    out_d, _ = dense.run_sequence(seq)
    comp = BatchedSequenceTracker(cfg, backbone, refiner, extract_chunk=4,
                                  aug_compact=True)
    out_c, _ = comp.run_sequence(seq)
    assert len(out_d) == len(out_c) == 6
    for t, (a, b) in enumerate(zip(out_d, out_c)):
        frac_diff = np.mean(np.asarray(a) != np.asarray(b))
        assert frac_diff < 0.005, (t, frac_diff)


@pytest.mark.parametrize("d,f", [(1, 1), (9, 3)])
def test_subwindow_inpaint_matches_fullframe(d, f):
    """cut_and_inpaint now runs cv2.inpaint on a margin-padded sub-window
    enclosing the dilated hole (the TELEA FMM band only reads known pixels
    within inpaintRadius of the hole). Pin bit-identity against the
    full-frame call for several hole shapes and positions, including one
    touching the frame border."""
    import cv2
    from frtm_tpu.models.augmenter import ImageAugmenter
    rng = np.random.RandomState(11)
    for case in range(3):
        image = rng.randint(0, 256, (80, 120, 3), np.uint8)
        mask = np.zeros((80, 120), np.uint8)
        if case == 0:
            mask[30:52, 40:70] = 1
        elif case == 1:  # touches the top-left border
            mask[0:18, 0:25] = 1
        else:            # irregular blob
            mask[(rng.rand(80, 120) > 0.995)] = 1
            mask = cv2.dilate(mask, np.ones((9, 9), np.uint8))
        if not mask.any():
            continue
        tgt_a, inp_a = ImageAugmenter.cut_and_inpaint(
            image, mask[..., None], d=d, f=f)
        # reference: the pre-round-5 full-frame formulation
        m = (mask > 0).astype(np.uint8)[..., None]
        mask1 = cv2.dilate(m, cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (d * 2, d * 2)))
        want = cv2.inpaint(image, mask1, inpaintRadius=d,
                           flags=cv2.INPAINT_TELEA)
        if d > 1:
            mask0 = cv2.erode(m, cv2.getStructuringElement(
                cv2.MORPH_ELLIPSE, (d, d)))
            mm = ((1 - mask0) * mask1)[..., None] if mask0.ndim == 2 \
                else (1 - mask0) * mask1
            mm = (cv2.blur(mm.squeeze() * 255, ksize=(d, d))[..., None]
                  / 255.0).astype(np.float32)
            bim = cv2.blur(want, ksize=(d, d))
            want = (bim * mm + (1.0 - mm) * want).astype(np.uint8)
        np.testing.assert_array_equal(inp_a, np.atleast_3d(want).squeeze()
                                      if inp_a.ndim == 2 else want,
                                      err_msg=f"case {case}")


def test_compose_composes_inpainted_frame_exactly():
    # an identity-bg slot IS the inpainted frame outside its paste: rebuild
    # it from the compact pieces and compare against cut_and_inpaint's output
    image, mask = _frame_and_mask()
    aug = ImageAugmenter(eval_aug_params(5))
    _, inpainted = aug.cut_and_inpaint(image, mask[..., None], d=1, f=1)
    compact = aug.augment_first_frame(
        image, mask[..., None], np.random.RandomState(1), compact=True)
    packed = pack_compact_batch(compact)
    ip = np.asarray(masked_paste(jnp.asarray(image),
                                 packed["inpaint_patch"],
                                 packed["inpaint_box"]))
    assert np.array_equal(ip, np.atleast_3d(inpainted))
