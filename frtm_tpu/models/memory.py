"""Fixed-capacity sample memory with exponentially-decaying sample weights.

Capability parity with /root/reference/model/memory.py (DiMP-style): K init
slots with the real first frame double-weighted (reference lines 33-46), and
per-frame replacement at the minimum-weight slot with learning-rate decay and
renormalisation (reference lines 59-92).

TPU-first: the reference already uses fixed-capacity buffers, so this maps
1:1 onto static-shape functional arrays. Empty slots keep weight 0, which
makes them contribute zero residual/curvature in the solver — replacing the
reference's dynamic `weights > 0` row selection with static shapes. State is
a NamedTuple pytree so it rides in `lax.scan` carries and vmaps over objects.
"""
from typing import NamedTuple

import jax.numpy as jnp


class MemoryState(NamedTuple):
    samples: jnp.ndarray        # (cap, h, w, C) feature maps
    labels: jnp.ndarray         # (cap, H, W, 1) soft masks
    pixel_weights: jnp.ndarray  # (cap, H, W, 1)
    weights: jnp.ndarray        # (cap,) sample weights (0 = empty slot)
    current_size: jnp.ndarray   # int32 scalar
    prev_ind: jnp.ndarray       # int32 scalar, -1 = no previous insert


def memory_init(capacity: int, features, labels, pixel_weights) -> MemoryState:
    """Fill the first K slots with the augmented first-frame samples.
    Slot 0 (the real frame) gets twice the weight before renormalising
    (reference memory.py:38-46)."""
    K, h, w, C = features.shape
    _, H, W, _ = labels.shape
    assert K <= capacity

    samples = jnp.zeros((capacity, h, w, C), features.dtype).at[:K].set(features)
    lab = jnp.zeros((capacity, H, W, 1), jnp.float32).at[:K].set(labels.astype(jnp.float32))
    pw = jnp.zeros((capacity, H, W, 1), jnp.float32).at[:K].set(pixel_weights)
    wts = jnp.zeros((capacity,), jnp.float32).at[:K].set(1.0 / K).at[0].set(2.0 / K)
    wts = wts.at[:K].set(wts[:K] / wts[:K].sum())
    return MemoryState(samples, lab, pw, wts,
                       jnp.asarray(K, jnp.int32), jnp.asarray(-1, jnp.int32))


def memory_update(state: MemoryState, feature, label, pixel_weight,
                  learning_rate: float, enabled=None) -> MemoryState:
    """Insert one sample: replace the min-weight slot, decay/renormalise
    weights (reference memory.py:59-92). Pure function of the state.

    :param enabled: optional bool scalar — when False the state is returned
    unchanged. The gating happens at the inserted ROW (and the tiny weight
    vector), not by selecting whole buffers, so a skipped frame costs no
    HBM traffic over the sample/label stores."""
    sw = state.weights
    lr = learning_rate

    r_ind_normal = jnp.argmin(sw).astype(jnp.int32)
    first_insert = state.prev_ind < 0
    sw_first = (sw / (1.0 - lr)).at[r_ind_normal].set(lr)
    sw_chain = sw.at[r_ind_normal].set(sw[state.prev_ind] / (1.0 - lr))
    sw_new = jnp.where(first_insert, sw_first, sw_chain)

    # degenerate branch (empty memory or lr == 1): everything on slot 0
    # (reference update_sample_weights routes `num_samp == 0 or lr == 1`
    # there; without it lr=1.0 divides by (1-lr)=0 and NaNs every weight).
    # lr is a static Python float, so the lr test folds at trace time.
    degen = jnp.logical_or(state.current_size == 0, lr >= 1.0)
    sw_new = jnp.where(degen, jnp.zeros_like(sw).at[0].set(1.0), sw_new)
    r_ind = jnp.where(degen, 0, r_ind_normal)

    sw_new = sw_new / sw_new.sum()

    if enabled is None:
        row_feature, row_label, row_pw = feature, label.astype(jnp.float32), pixel_weight
        new_size = jnp.minimum(state.current_size + 1, state.samples.shape[0])
        new_prev = r_ind
    else:
        row_feature = jnp.where(enabled, feature, state.samples[r_ind])
        row_label = jnp.where(enabled, label.astype(jnp.float32), state.labels[r_ind])
        row_pw = jnp.where(enabled, pixel_weight, state.pixel_weights[r_ind])
        sw_new = jnp.where(enabled, sw_new, sw)
        new_size = jnp.where(enabled,
                             jnp.minimum(state.current_size + 1, state.samples.shape[0]),
                             state.current_size)
        new_prev = jnp.where(enabled, r_ind, state.prev_ind)

    return MemoryState(
        samples=state.samples.at[r_ind].set(row_feature),
        labels=state.labels.at[r_ind].set(row_label),
        pixel_weights=state.pixel_weights.at[r_ind].set(row_pw),
        weights=sw_new,
        current_size=new_size.astype(jnp.int32),
        prev_ind=new_prev.astype(jnp.int32),
    )
