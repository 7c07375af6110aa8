"""Sample-memory semantics (fuzzed against a from-spec numpy mirror) and
discriminator pixel weighting / init / update behavior."""
import numpy as np
import jax
import jax.numpy as jnp

from frtm_tpu.models.memory import memory_init, memory_update
from frtm_tpu.models.discriminator import (
    DiscConfig, DiscParams, init_disc_params, compute_pixel_weights,
    disc_init, disc_apply, disc_update,
)
from frtm_tpu.ops.conv import conv2d
from frtm_tpu.ops.resize import resize_bilinear


# ---------------------------------------------------------------------------
# Memory


def _np_update_weights(sw, current_size, prev_ind, lr):
    """From-spec mirror of Memory.update_sample_weights (memory.py:65-92)."""
    sw = sw.copy()
    if current_size == 0 or lr == 1:
        sw[:] = 0
        sw[0] = 1
        r_ind = 0
    else:
        r_ind = int(np.argmin(sw))
        if prev_ind is None:
            sw /= (1 - lr)
            sw[r_ind] = lr
        else:
            sw[r_ind] = sw[prev_ind] / (1 - lr)
    sw /= sw.sum()
    return sw, r_ind


def test_memory_init_weights():
    K, cap = 5, 8
    ft = jnp.ones((K, 2, 2, 3))
    lb = jnp.ones((K, 4, 4, 1))
    pw = jnp.ones((K, 4, 4, 1))
    st = memory_init(cap, ft, lb, pw)
    w = np.asarray(st.weights)
    # [2,1,1,1,1]/6 then zeros
    np.testing.assert_allclose(w[:K], np.array([2, 1, 1, 1, 1]) / 6.0, atol=1e-6)
    np.testing.assert_allclose(w[K:], 0.0)
    assert int(st.current_size) == K
    assert int(st.prev_ind) == -1


def test_memory_update_fuzz(rng):
    K, cap, lr = 5, 8, 0.1
    ft = jnp.asarray(rng.randn(K, 2, 2, 3).astype(np.float32))
    lb = jnp.asarray(rng.rand(K, 4, 4, 1).astype(np.float32))
    pw = jnp.asarray(rng.rand(K, 4, 4, 1).astype(np.float32))
    st = memory_init(cap, ft, lb, pw)

    sw_np = np.asarray(st.weights).copy()
    prev = None
    cur = K
    for step in range(20):
        f = jnp.asarray(rng.randn(2, 2, 3).astype(np.float32))
        l = jnp.asarray(rng.rand(4, 4, 1).astype(np.float32))
        p = jnp.asarray(rng.rand(4, 4, 1).astype(np.float32))
        st = memory_update(st, f, l, p, lr)
        sw_np, r_ind = _np_update_weights(sw_np, cur, prev, lr)
        prev = r_ind
        cur = min(cur + 1, cap)
        np.testing.assert_allclose(np.asarray(st.weights), sw_np, atol=1e-6,
                                   err_msg=f"step {step}")
        assert int(st.prev_ind) == r_ind
        np.testing.assert_allclose(np.asarray(st.samples[r_ind]), f, atol=1e-6)
        assert int(st.current_size) == cur


# ---------------------------------------------------------------------------
# Pixel weighting (reference discriminator.py:107-152)


def test_pixel_weights_hinge(rng):
    cfg = DiscConfig()
    H = W = 32
    y = np.zeros((3, H, W, 1), np.float32)
    y[0, :4, :4] = 1          # small-ish object: af=16/1024 < tf -> reweighted
    y[1, :24, :24] = 1        # large object: af > tf -> weights 1
    y[2, 0, 0] = 1            # tiny (<10px): af treated as tf
    w = np.asarray(compute_pixel_weights(jnp.asarray(y), cfg))

    af0 = 16 / 1024
    wf0, wb0 = 0.1 / af0, 0.9 / (1 - af0)
    np.testing.assert_allclose(w[0, 0, 0, 0], np.sqrt(wf0), atol=1e-5)
    np.testing.assert_allclose(w[0, -1, -1, 0], np.sqrt(wb0), atol=1e-5)
    np.testing.assert_allclose(w[1], 1.0, atol=1e-5)  # af>tf -> all ones
    af2 = 0.1
    np.testing.assert_allclose(w[2, 0, 0, 0], np.sqrt(0.1 / af2 * 1), atol=1e-5)  # = 1
    np.testing.assert_allclose(w[2, -1, -1, 0], np.sqrt(0.9 / 0.9), atol=1e-5)


# ---------------------------------------------------------------------------
# Discriminator init / apply / update


def _toy_problem(rng, K=4, Cin=16, c=8, h=8, w=12, H=32, W=48):
    cfg = DiscConfig(in_channels=Cin, c_channels=c, init_iters=(3, 5), update_iters=(5,),
                     memory_size=10, train_skipping=2, layer="layer4")
    # features correlated with the mask so the model is learnable
    masks = np.zeros((K, H, W, 1), np.float32)
    feats = rng.randn(K, h, w, Cin).astype(np.float32) * 0.2
    for k in range(K):
        r0, c0 = rng.randint(0, H - 12), rng.randint(0, W - 16)
        masks[k, r0:r0 + 12, c0:c0 + 16] = 1
        fr0, fc0 = int(r0 * h / H), int(c0 * w / W)
        feats[k, fr0:fr0 + max(1, 12 * h // H), fc0:fc0 + max(1, 16 * w // W), :4] += 2.0
    return cfg, jnp.asarray(feats), jnp.asarray(masks)


def test_disc_init_learns_target(rng):
    cfg, feats, masks = _toy_problem(rng)
    params0 = init_disc_params(jax.random.PRNGKey(0), cfg)
    params, state = disc_init(params0, feats, masks, cfg)

    # after init the model should score fg above bg on the training frames
    scores, cft = disc_apply(params, feats)
    s_up = resize_bilinear(scores, masks.shape[1:3])
    fg = float((s_up * masks).sum() / masks.sum())
    bg = float((s_up * (1 - masks)).sum() / (1 - masks).sum())
    assert fg > bg + 0.3, (fg, bg)
    assert cft.shape == feats.shape[:3] + (cfg.c_channels,)
    assert int(state.memory.current_size) == feats.shape[0]
    assert bool(state.cg.have_p)


def test_disc_update_schedule(rng):
    cfg, feats, masks = _toy_problem(rng)
    params0 = init_disc_params(jax.random.PRNGKey(0), cfg)
    params, state = disc_init(params0, feats, masks, cfg)

    _, cft = disc_apply(params, feats[:1])
    filt_before = np.asarray(params.filter).copy()

    # frame 1: insert only (train_skipping=2) -> filter unchanged
    params, state = disc_update(params, state, cft[0], masks[0], cfg)
    assert int(state.frame_num) == 1
    assert int(state.memory.current_size) == feats.shape[0] + 1
    np.testing.assert_allclose(np.asarray(params.filter), filt_before)

    # frame 2: re-solve -> filter changes
    params, state = disc_update(params, state, cft[0], masks[0], cfg)
    assert int(state.frame_num) == 2
    assert not np.allclose(np.asarray(params.filter), filt_before)

    # tiny mask (<10 px): no insert, no train, but frame counter advances
    size_before = int(state.memory.current_size)
    tiny = jnp.zeros_like(masks[0]).at[0, 0, 0].set(1.0)
    filt2 = np.asarray(params.filter).copy()
    params, state = disc_update(params, state, cft[0], tiny, cfg)
    assert int(state.frame_num) == 3
    assert int(state.memory.current_size) == size_before
    np.testing.assert_allclose(np.asarray(params.filter), filt2)


def test_disc_update_vmaps(rng):
    """Multi-object tracking vmaps the whole update over the object axis."""
    cfg, feats, masks = _toy_problem(rng)
    params0 = init_disc_params(jax.random.PRNGKey(0), cfg)
    params, state = disc_init(params0, feats, masks, cfg)

    n_obj = 3
    stack = lambda t: jax.tree.map(lambda x: jnp.stack([x] * n_obj), t)
    p_b, s_b = stack(params), stack(state)
    _, cft = disc_apply(params, feats[:1])
    cft_b = jnp.stack([cft[0]] * n_obj)
    y_b = jnp.stack([masks[0]] * n_obj)

    upd = jax.vmap(lambda p, s, c, y: disc_update(p, s, c, y, cfg))
    p2, s2 = upd(p_b, s_b, cft_b, y_b)
    assert p2.filter.shape[0] == n_obj
    assert int(s2.frame_num[0]) == 1


def test_memory_update_lr_one_degenerate():
    """learning_rate=1.0 is the reference's 'always replace' degenerate case
    (memory.py routes `lr == 1` with `num_samp == 0` to the all-on-slot-0
    path); without the branch every weight NaNs via division by (1-lr)=0."""
    from frtm_tpu.models.memory import memory_init, memory_update
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(4, 6, 8, 5).astype(np.float32))
    labels = jnp.asarray((rng.rand(4, 6, 8, 1) > 0.5).astype(np.float32))
    pw = jnp.ones_like(labels)
    st = memory_init(3, feats[:3], labels[:3], pw[:3])
    st = memory_update(st, feats[3], labels[3], pw[3], learning_rate=1.0)
    w = np.asarray(st.weights)
    assert np.isfinite(w).all(), w
    assert w[0] == 1.0 and w[1:].sum() == 0.0, w
