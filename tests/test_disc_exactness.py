"""Independent ground-truth check of the discriminator's filter problem: the
weighted LSQ objective ||w (U conv(x, f) - y)||^2 + ||reg f||^2 is solved
exactly by explicit matrix least squares (im2col + the real resize operator,
no CG, no autodiff) and our GN-CG solve must converge to that optimum. This
validates the entire problem construction — pixel/sample weight folding,
in-loss upsampling, regularisation — independently of the solver."""
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from frtm_tpu.models.discriminator import (
    DiscConfig, compute_pixel_weights, _effective_weights, init_disc_params,
    disc_init,
)
from frtm_tpu.models.memory import memory_init
from frtm_tpu.ops.resize import _linear_matrix
from frtm_tpu.ops.conv import conv2d


def _conv_matrix(x, kh, kw):
    """(K*h*w, kh*kw*c) matrix whose product with vec(f) equals
    vec(conv2d(x, f)) for a single-output-channel filter."""
    K, h, w, c = x.shape
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            for ci in range(c):
                f = np.zeros((kh, kw, c, 1), np.float32)
                f[dy, dx, ci, 0] = 1.0
                s = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(f)))[..., 0]
                cols.append(s.reshape(-1))
    return np.stack(cols, axis=1)


def test_filter_solve_reaches_exact_lsq_optimum(rng):
    K, h, w, c = 4, 6, 8, 4
    H, W = 18, 24
    x = rng.randn(K, h, w, c).astype(np.float32) * 0.5
    y = (rng.rand(K, H, W, 1) > 0.7).astype(np.float32)
    reg = 1e-2

    cfg = DiscConfig(in_channels=c, c_channels=c, out_channels=1,
                     init_iters=(0,), update_iters=(40,), memory_size=K,
                     filter_reg=(1e-4, reg), precond=(1e-4, reg),
                     pixel_weighting_method="hinge")

    pw = compute_pixel_weights(jnp.asarray(y), cfg)
    mem = memory_init(K, jnp.asarray(x), jnp.asarray(y), pw)
    weff = np.asarray(_effective_weights(mem))[..., 0]  # (K, H, W)

    # explicit system: rows = w * (Uh (conv) Uw') per sample, plus reg rows
    C = _conv_matrix(x, 3, 3)                      # (K*h*w, 36... 3*3*c)
    Uh = _linear_matrix(h, H)
    Uw = _linear_matrix(w, W)
    U = np.kron(Uh, Uw)                            # (H*W, h*w)
    rows, targets = [], []
    for k in range(K):
        Ck = C[k * h * w:(k + 1) * h * w]          # (h*w, P)
        A_k = (weff[k].reshape(-1, 1)) * (U @ Ck)  # (H*W, P)
        rows.append(A_k)
        targets.append((weff[k] * y[k, ..., 0]).reshape(-1))
    P = C.shape[1]
    A = np.concatenate(rows + [reg * np.eye(P, dtype=np.float32)])
    b = np.concatenate(targets + [np.zeros(P, np.float32)])
    f_star, *_ = np.linalg.lstsq(A, b, rcond=None)

    # our solve: phase 2 of disc_init with an identity-like projection is
    # awkward to isolate, so call the internal solve directly
    from frtm_tpu.models.discriminator import _solve
    from frtm_tpu.models.solver import init_cg_state

    def filter_net(theta, xx):
        return conv2d(xx, theta[0])

    theta0 = (jnp.zeros((3, 3, c, 1), jnp.float32),)
    theta, _ = _solve(mem, (reg,), (reg,), filter_net, theta0,
                      init_cg_state(theta0), (40,), cfg, (h, w))
    # (3,3,c,1) row-major flattening = the (dy, dx, ci) basis order above
    got_vec = np.asarray(theta[0]).reshape(-1)
    np.testing.assert_allclose(got_vec, f_star, atol=2e-3, rtol=2e-2)

    # the residual-form solver agrees with the stencil form on the same optimum
    theta_r, _ = _solve(mem, (reg,), (reg,), filter_net, theta0,
                        init_cg_state(theta0), (40,),
                        replace(cfg, solver="residual"), (h, w))
    np.testing.assert_allclose(np.asarray(theta_r[0]).reshape(-1), f_star,
                               atol=2e-3, rtol=2e-2)
