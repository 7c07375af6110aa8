"""Multi-layer target models — one discriminator per feature layer.

Capability parity with the legacy stack's per-layer machinery
(/root/reference/ytvos_validation/discriminator.py:104-157, 245-257,
291-303: a TargetModel + Memory + optimizer per feature layer, applied and
updated in lock-step; ytvos_validation/memory.py stores per-layer
TensorLists). The shipped configurations use a single layer ('layer4'), but
the machinery exists for multi-layer experiments; the decoder consumes the
resulting score-map list via channel concatenation
(seg_network_apply(scores=[...])).

Functional form: plain dicts keyed by layer name over the single-layer
primitives — each layer's solve is independent, so they parallelise
trivially (and vmap over objects per layer as usual)."""
from typing import Dict

import jax
import jax.numpy as jnp

from .discriminator import (
    DiscConfig, DiscParams, init_disc_params,
    disc_init, disc_apply, disc_update,
)


def ml_init_params(key, cfgs: Dict[str, DiscConfig]) -> Dict[str, DiscParams]:
    keys = jax.random.split(key, len(cfgs))
    return {L: init_disc_params(k, cfg)
            for k, (L, cfg) in zip(keys, sorted(cfgs.items()))}


def ml_disc_init(params0: Dict[str, DiscParams], features: Dict[str, jnp.ndarray],
                 labels, cfgs: Dict[str, DiscConfig]):
    """Initialise one target model per layer on its own feature map.

    :param features: {layer: (K, h_L, w_L, C_L)} augmented first-frame features
    :param labels:   (K, H, W, 1) shared augmented masks
    :return: ({layer: DiscParams}, {layer: DiscState})
    """
    params, states = {}, {}
    for L in sorted(cfgs):
        params[L], states[L] = disc_init(params0[L], features[L], labels, cfgs[L])
    return params, states


def ml_disc_apply(params: Dict[str, DiscParams], features: Dict[str, jnp.ndarray],
                  cfgs: Dict[str, DiscConfig]):
    """Classify with every layer's model; returns ([score maps deep->shallow
    order of sorted names], {layer: compressed sample})."""
    scores, cfts = [], {}
    for L in sorted(params):
        s, cft = disc_apply(params[L], features[L],
                            clamp_output=cfgs[L].clamp_output)
        scores.append(s)
        cfts[L] = cft
    return scores, cfts


def ml_disc_update(params, states, cfts, train_y, cfgs):
    """Per-frame online update of every layer's model with the shared merged
    mask (the legacy stack updates all layer optimizers in lock-step)."""
    new_p, new_s = {}, {}
    for L in sorted(params):
        new_p[L], new_s[L] = disc_update(params[L], states[L], cfts[L],
                                         train_y, cfgs[L])
    return new_p, new_s
