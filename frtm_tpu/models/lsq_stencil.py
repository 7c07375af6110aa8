"""Exact low-resolution reduction of the discriminator's weighted
least-squares operator.

The loss is ||W (U s - y)||^2 over memory rows, where s is the coarse score
map (h, w), U the fixed bilinear upsampling to label resolution (H, W), and
W per-pixel weights (DiscriminatorLoss, /root/reference/model/discriminator.py:45-50).
Its curvature in score space is M = U' diag(w^2) U. Because each bilinear row
of U touches at most 2 source cells per axis, M[(a,b),(a',b')] vanishes unless
|a-a'|<=1 and |b-b'|<=1 — M is an exact 3x3 STENCIL on the score grid:

    M_{da,db}[a, b] = sum_{Y,X} Uh[Y,a] Uh[Y,a+da] Uw[X,b] Uw[X,b+db] w2[Y,X]

So one full-resolution pass per solve precomputes 9 coefficient maps
(S, 3, 3, h, w) plus the projected target v = U'(w^2 * y), and every CG
iteration then works entirely at score resolution: A(p) contracts the net's
jvp with the stencil instead of round-tripping (S, H, W) buffers through HBM
(~5 MB instead of ~650 MB of traffic per iteration at DAVIS scale). This is
an algebraic identity — solutions match the residual-form solver to float
tolerance (tests/test_stencil_solver.py).

The precompute is three row-stage matmuls (shared across db) and nine
column-stage matmuls per sample — MXU work streamed over one read of w^2.
"""
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..ops.resize import _linear_matrix


@lru_cache(maxsize=None)
def _up_matrices(h, w, H, W):
    """(H, h) and (W, w) bilinear upsampling matrices (the exact operators
    behind ops.resize.resize_bilinear)."""
    return _linear_matrix(h, H), _linear_matrix(w, W)


@lru_cache(maxsize=None)
def _shifted_products(in_size, out_size):
    """P_d[Y, a] = U[Y, a] * U[Y, a+d] for d in (-1, 0, 1), as (3, out, in)."""
    U = _linear_matrix(in_size, out_size).astype(np.float64)
    out = np.zeros((3, out_size, in_size), np.float64)
    for di, d in enumerate((-1, 0, 1)):
        a0 = max(0, -d)
        a1 = min(in_size, in_size - d)
        out[di, :, a0:a1] = U[:, a0:a1] * U[:, a0 + d:a1 + d]
    return out.astype(np.float32)


def precompute_stencil(w2, score_hw):
    """Stencil coefficients M9 and the apply function's static data.

    :param w2: (S, H, W) squared residual weights (pixel^2 x sample weight)
    :param score_hw: (h, w) score-map size
    :return: (S, 3, 3, h, w) stencil maps
    """
    S, H, W = w2.shape
    h, w = score_hw
    Ph = jnp.asarray(_shifted_products(h, H))   # (3, H, h)
    Pw = jnp.asarray(_shifted_products(w, W))   # (3, W, w)
    # row stage: (3, S, h, W) = Ph' applied per da  — shared across db
    row = jnp.einsum("dYa,SYX->dSaX", Ph, w2)
    # column stage: (S, 3, 3, h, w)
    M9 = jnp.einsum("dSaX,eXb->Sdeab", row, Pw)
    return M9


def project_targets(w2, y, score_hw):
    """v = U'(w^2 * y) at score resolution: (S, h, w)."""
    S, H, W = w2.shape
    h, w = score_hw
    Uh, Uw = _up_matrices(h, w, H, W)
    g = w2 * y
    g = jnp.einsum("Ya,SYX->SaX", jnp.asarray(Uh), g)
    return jnp.einsum("SaX,Xb->Sab", g, jnp.asarray(Uw))


def apply_stencil(M9, s):
    """M(s) = sum over the 3x3 neighborhood of M9 * shifted(s).

    :param M9: (S, 3, 3, h, w)
    :param s:  (S, h, w)
    :return: (S, h, w)
    """
    # pad so shifts are static slices
    sp = jnp.pad(s, ((0, 0), (1, 1), (1, 1)))
    h, w = s.shape[1], s.shape[2]
    out = jnp.zeros_like(s)
    for di in range(3):
        for dj in range(3):
            # neighbor value s[a+da, b+db] with da = di-1, db = dj-1
            shifted = sp[:, di:di + h, dj:dj + w]
            out = out + M9[:, di, dj] * shifted
    return out
