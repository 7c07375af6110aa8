"""The stencil (quadratic-form) solver must reproduce the residual-form
solver exactly: same CG trajectory, same solutions — it is an algebraic
identity, not an approximation."""
from dataclasses import replace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frtm_tpu.models.discriminator import (
    DiscConfig, init_disc_params, disc_init, disc_apply, filter_resolve,
    DiscState,
)
from frtm_tpu.models.lsq_stencil import (
    precompute_stencil, project_targets, apply_stencil,
)
from frtm_tpu.ops.resize import resize_bilinear


def test_stencil_is_exact_curvature(rng):
    """apply_stencil(M9, s) == U'(w2 * (U s)) for random weights/scores."""
    S, h, w, H, W = 3, 6, 9, 33, 47
    w2 = jnp.asarray(rng.rand(S, H, W).astype(np.float32))
    s = jnp.asarray(rng.randn(S, h, w).astype(np.float32))

    M9 = precompute_stencil(w2, (h, w))
    got = apply_stencil(M9, s)

    up = resize_bilinear(s[..., None], (H, W))[..., 0]
    # transpose of the resize: apply the matrices transposed
    from frtm_tpu.ops.resize import _linear_matrix
    Uh = jnp.asarray(_linear_matrix(h, H))
    Uw = jnp.asarray(_linear_matrix(w, W))
    full = jnp.einsum("Ya,SYX,Xb->Sab", Uh, w2 * up, Uw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_project_targets_matches_transpose(rng):
    S, h, w, H, W = 2, 5, 7, 20, 28
    w2 = jnp.asarray(rng.rand(S, H, W).astype(np.float32))
    y = jnp.asarray(rng.rand(S, H, W).astype(np.float32))
    v = project_targets(w2, y, (h, w))
    from frtm_tpu.ops.resize import _linear_matrix
    Uh = jnp.asarray(_linear_matrix(h, H))
    Uw = jnp.asarray(_linear_matrix(w, W))
    want = jnp.einsum("Ya,SYX,Xb->Sab", Uh, w2 * y, Uw)
    np.testing.assert_allclose(np.asarray(v), np.asarray(want), atol=1e-5)


def _toy(rng, K=4, Cin=12, H=40, W=56, h=10, w=14):
    masks = np.zeros((K, H, W, 1), np.float32)
    feats = rng.randn(K, h, w, Cin).astype(np.float32) * 0.3
    for k in range(K):
        r0, c0 = rng.randint(0, H - 16), rng.randint(0, W - 20)
        masks[k, r0:r0 + 16, c0:c0 + 20] = 1
        feats[k, r0 * h // H:(r0 + 16) * h // H + 1,
              c0 * w // W:(c0 + 16) * w // W + 1, :3] += 1.5
    return jnp.asarray(feats), jnp.asarray(masks)


@pytest.mark.slow
def test_solvers_agree_on_disc_init(rng):
    feats, masks = _toy(rng)
    base = DiscConfig(in_channels=12, c_channels=6, init_iters=(3, 4),
                      update_iters=(4,), memory_size=8, train_skipping=2)
    p0 = init_disc_params(jax.random.PRNGKey(0), base)

    p_res, st_res = disc_init(p0, feats, masks, replace(base, solver="residual"))
    p_stn, st_stn = disc_init(p0, feats, masks, replace(base, solver="stencil"))

    np.testing.assert_allclose(np.asarray(p_res.project), np.asarray(p_stn.project),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(p_res.filter), np.asarray(p_stn.filter),
                               atol=2e-4, rtol=2e-3)
    # warm-start CG state matches too (it feeds future updates)
    np.testing.assert_allclose(float(st_res.cg.rho), float(st_stn.cg.rho),
                               rtol=1e-2)

    # and a follow-up re-solve stays in agreement
    pr2, cg_r = filter_resolve(p_res, st_res, replace(base, solver="residual"))
    ps2, cg_s = filter_resolve(p_stn, st_stn, replace(base, solver="stencil"))
    np.testing.assert_allclose(np.asarray(pr2.filter), np.asarray(ps2.filter),
                               atol=3e-4, rtol=3e-3)
