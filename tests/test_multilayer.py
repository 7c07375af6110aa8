"""Multi-layer discriminator + multi-score decoder + legacy bicubic upsampler."""
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from frtm_tpu.models.multilayer import (
    ml_init_params, ml_disc_init, ml_disc_apply, ml_disc_update,
)
from frtm_tpu.models.discriminator import DiscConfig
from frtm_tpu.models.seg_network import init_seg_network, seg_network_apply


def _feats(rng, K, layer_shapes):
    return {L: jnp.asarray(rng.randn(K, h, w, c).astype(np.float32) * 0.3)
            for L, (h, w, c) in layer_shapes.items()}


def test_two_layer_models_and_decoder(rng):
    K, H, W = 3, 48, 64
    shapes = {"layer4": (6, 8, 16), "layer3": (12, 16, 8)}
    cfgs = {L: DiscConfig(in_channels=c, c_channels=8, init_iters=(2, 3),
                          update_iters=(3,), memory_size=6, train_skipping=2,
                          layer=L)
            for L, (h, w, c) in shapes.items()}
    feats = _feats(rng, K, shapes)
    masks = np.zeros((K, H, W, 1), np.float32)
    masks[:, 10:34, 14:44] = 1
    masks = jnp.asarray(masks)

    p0 = ml_init_params(jax.random.PRNGKey(0), cfgs)
    params, states = ml_disc_init(p0, feats, masks, cfgs)
    assert set(params) == {"layer3", "layer4"}

    scores, cfts = ml_disc_apply(params, feats, cfgs)
    assert len(scores) == 2
    assert scores[0].shape[:1] == (K,)

    # the decoder consumes the score list: TSE in_channels = 2
    dec_ft = {"layer5": (3, 4, 32), "layer4": (6, 8, 16),
              "layer3": (12, 16, 8), "layer2": (24, 32, 8)}
    dec = init_seg_network(jax.random.PRNGKey(1),
                           {L: c for L, (h, w, c) in dec_ft.items()},
                           in_channels=2)
    dfeats = _feats(rng, K, dec_ft)
    logits = seg_network_apply(dec, scores, dfeats, (H, W))
    assert logits.shape == (K, H, W, 1)

    # lock-step update across layers
    y = masks[0]
    params2, states2 = ml_disc_update(params, states,
                                      {L: cfts[L][0] for L in cfts}, y, cfgs)
    for L in params2:
        assert int(states2[L].frame_num) == 1
        assert int(states2[L].memory.current_size) == K + 1


def test_bicubic_upsampler_style(rng):
    ft = {"layer5": 32, "layer4": 16}
    dec = init_seg_network(jax.random.PRNGKey(0), ft)
    feats = {"layer5": jnp.asarray(rng.randn(1, 3, 4, 32).astype(np.float32)),
             "layer4": jnp.asarray(rng.randn(1, 6, 8, 16).astype(np.float32))}
    scores = jnp.asarray(rng.randn(1, 6, 8, 1).astype(np.float32))
    a = seg_network_apply(dec, scores, feats, (48, 64), layers=("layer5", "layer4"),
                          upsampler="pyrup")
    b = seg_network_apply(dec, scores, feats, (48, 64), layers=("layer5", "layer4"),
                          upsampler="bicubic")
    assert a.shape == b.shape == (1, 48, 64, 1)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # genuinely different heads
