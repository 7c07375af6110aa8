"""The online discriminative target model D(x) = filter_3x3(project_1x1(x)),
learned per object by weighted least squares.

Capability parity with /root/reference/model/discriminator.py:
  * hinge pixel weighting with target influence tf (reference lines 107-152)
  * two-phase init (reference lines 154-199): a joint GN-CG solve over
    {projection, filter} on the augmented raw features, then re-projection,
    a large memory over compressed features, and a filter-only solve whose
    warm CG state persists into future updates
  * apply: project -> cache compressed sample -> filter (reference 201-206)
  * update: threshold mask for weights but store the soft mask, insert every
    frame, re-solve every `train_skipping` frames (reference 208-227)

TPU-first: everything is a pure function over (params, state); the per-object
axis vmaps (all objects share shapes), and the update schedule is a lax.cond
in the tracker's frame scan. Residuals keep all memory rows at static shape —
zero-weight rows contribute nothing (see models/solver.py docstring).
"""
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import conv2d
from ..ops.resize import resize_bilinear
from .memory import MemoryState, memory_init, memory_update
from .solver import (
    CGState, gauss_newton_cg, gauss_newton_cg_quadform, init_cg_state,
    scalar_preconditioner,
)
from .lsq_stencil import precompute_stencil, project_targets


@dataclass(frozen=True)
class DiscConfig:
    """Static hyper-parameters (the reference Discriminator ctor args,
    defaults = eval settings from /root/reference/evaluate.py:77-84)."""
    in_channels: int = 1024
    c_channels: int = 96
    out_channels: int = 1
    init_iters: Tuple[int, ...] = (5, 10, 10, 10, 10)
    update_iters: Tuple[int, ...] = (10,)
    filter_reg: Tuple[float, ...] = (1e-4, 1e-2)
    precond: Tuple[float, ...] = (1e-4, 1e-2)
    precond_lr: float = 0.1
    cg_forgetting_rate: float = 750
    memory_size: int = 80
    train_skipping: int = 8
    learning_rate: float = 0.1
    update_filters: bool = True  # disable all online updates (reference flag)
    pixel_weighting_method: str = "hinge"   # 'none'|'fixed'|'hinge'|'first-frame'
    pixel_weighting_tf: float = 0.1
    pixel_weighting_per_frame: bool = True  # legacy stack: False = global af
    distractor_mult: float = 1.0            # weight multiplier where labels > 1
    update_method: str = "frtm"  # 'frtm' (main stack: soft label, thresholded
    # weights) | legacy 'thresh'/'conf'/'raw'/'raw-conf'
    # (/root/reference/ytvos_validation/discriminator.py:374-394)
    clamp_output: bool = False   # clamp scores to (-0.1, 1.2) (legacy :341-344)
    solver: str = "stencil"  # 'stencil': exact score-space reduction of the
    # label-space curvature (models/lsq_stencil.py) — same math, no full-res
    # HBM round trips per CG iteration; 'residual': direct residual form
    layer: str = "layer4"

    @property
    def direction_forget_factor(self) -> float:
        return (1.0 - self.precond_lr) ** self.cg_forgetting_rate


class DiscParams(NamedTuple):
    project: jnp.ndarray  # (1, 1, Cin, c) 1x1 conv, no bias
    filter: jnp.ndarray   # (3, 3, c, out) 3x3 conv, no bias


class DiscState(NamedTuple):
    memory: MemoryState
    cg: CGState           # warm-start state of the filter update solver
    frame_num: jnp.ndarray  # int32


def init_disc_params(key, cfg: DiscConfig) -> DiscParams:
    """Random init matching torch Conv2d defaults (kaiming_uniform a=sqrt(5));
    the solve immediately overwrites these, so only the scale matters."""
    k1, k2 = jax.random.split(key)
    import numpy as np
    b1 = np.sqrt(6.0 / (6.0 * cfg.in_channels))
    b2 = np.sqrt(6.0 / (6.0 * 9 * cfg.c_channels))
    return DiscParams(
        project=jax.random.uniform(k1, (1, 1, cfg.in_channels, cfg.c_channels),
                                   jnp.float32, -b1, b1),
        filter=jax.random.uniform(k2, (3, 3, cfg.c_channels, cfg.out_channels),
                                  jnp.float32, -b2, b2),
    )


def compute_pixel_weights(y, cfg: DiscConfig):
    """Pixel weighting (reference discriminator.py:107-152 and the legacy
    stack's richer variants, ytvos_validation/discriminator.py:162-223):
      * 'fixed': foreground weighted to a fixed target influence tf
      * 'hinge': like fixed, but disabled (weights 1) once af > tf
      * 'first-frame': every sample reuses the first sample's af
      * per_frame=False: af computed globally over all samples
      * distractor_mult: extra weight where labels > 1 (distractor objects)
    Small objects (<10 px) are treated as af = tf. Returns sqrt of the
    per-pixel weight. y: (N, H, W, 1), values in [0, 1] (or >1 = distractor)."""
    method = cfg.pixel_weighting_method
    if method == "none":
        return jnp.ones_like(y, jnp.float32)
    assert method in ("fixed", "hinge", "first-frame")
    tf = cfg.pixel_weighting_tf
    y = y.astype(jnp.float32)
    distractors = y > 1
    N, H, W, _ = y.shape
    if cfg.pixel_weighting_per_frame:
        px = y.sum(axis=(1, 2, 3)).reshape(N, 1, 1, 1)
        af = px / (H * W)
    else:
        px = y.sum() * jnp.ones((N, 1, 1, 1))
        af = px / y.size
    af = jnp.where(px < 10, tf, af)
    if method == "hinge":
        tf_eff = jnp.where(af > tf, af, tf)
    elif method == "first-frame":
        af = jnp.broadcast_to(af[0:1], af.shape)
        tf_eff = jnp.where(af > tf, af, tf)
    else:  # fixed
        tf_eff = jnp.full_like(af, tf)
    wf = tf_eff / af
    wf = jnp.where(jnp.isfinite(wf), wf, 1.0)
    wb = (1.0 - tf_eff) / (1.0 - af)
    wb = jnp.where(jnp.isfinite(wb), wb, 1.0)
    # deliberate reference-faithful quirk: the interpolation uses the RAW
    # label values, so distractor labels (y > 1) can produce w = 2*wf - wb
    # < 0 and sqrt -> NaN when the object is large — the legacy reference
    # has the identical formula and exposure
    # (ytvos_validation/discriminator.py:219-221); kept for parity.
    w = wf * y + wb * (1.0 - y)
    if cfg.distractor_mult != 1.0:
        w = jnp.where(distractors, w * cfg.distractor_mult, w)
    return jnp.sqrt(w)


def _effective_weights(memory: MemoryState):
    """Per-row residual weights: pixel weights x sqrt(sample weight)
    (DiscriminatorLoss.initialize, reference discriminator.py:38-43).
    Zero-weight (empty) rows vanish from the problem."""
    sw = jnp.sqrt(memory.weights).reshape(-1, 1, 1, 1)
    return memory.pixel_weights * sw


def _make_residual_fn(memory: MemoryState, regs, apply_net):
    """Residuals: [w * (bilinear_up(net(x)) - y), reg_i * theta_i]
    (DiscriminatorLoss.__call__, reference discriminator.py:45-50)."""
    w = _effective_weights(memory)
    y = memory.labels
    y_size = y.shape[1:3]
    x = memory.samples

    def residual_fn(theta):
        s = apply_net(theta, x)
        s = resize_bilinear(s, y_size)
        data = w * (s - y)
        reg_terms = tuple(r * t for r, t in zip(regs, jax.tree.leaves(theta)))
        return (data,) + reg_terms

    return residual_fn


def _solve(memory: MemoryState, regs, precond, apply_net, theta, state,
           schedule, cfg: DiscConfig, score_hw, collect_losses: bool = False):
    """Run one GN-CG schedule on the memory's weighted LSQ problem, via the
    configured solver form. apply_net(theta, x) -> (S, h, w, 1).

    collect_losses: also return the per-GN-iteration squared residual norms
    (the legacy stack's convergence instrumentation,
    /root/reference/ytvos_validation/optimizer.py:194-274) — supported by BOTH
    solver forms; the stencil form reports the identical quantity via the
    quadratic identity (same data term plus the constant y'W^2y)."""
    M1 = scalar_preconditioner(tuple(jnp.asarray(p, jnp.float32) for p in precond))
    dff = cfg.direction_forget_factor
    if cfg.solver == "residual":
        resid = _make_residual_fn(memory, regs, apply_net)
        return gauss_newton_cg(resid, theta, state, schedule, M1, dff,
                               fletcher_reeves=False,
                               collect_losses=collect_losses)
    assert cfg.solver == "stencil"
    w2 = jnp.square(_effective_weights(memory))[..., 0]          # (S, H, W)
    M9 = precompute_stencil(w2, score_hw)
    v = project_targets(w2, memory.labels[..., 0], score_hw)
    x = memory.samples

    def net_fn(theta):
        return apply_net(theta, x)[..., 0]

    loss_const = jnp.vdot(w2, jnp.square(memory.labels[..., 0])) \
        if collect_losses else 0.0
    return gauss_newton_cg_quadform(net_fn, theta, state, schedule, M1, dff,
                                    M9, v, regs, fletcher_reeves=False,
                                    collect_losses=collect_losses,
                                    loss_const=loss_const)


def disc_init(params: DiscParams, features, labels, cfg: DiscConfig,
              collect_losses: bool = False):
    """Two-phase target-model initialisation (reference discriminator.py:154-199).

    :param features: (K, h, w, Cin) augmented first-frame features (raw)
    :param labels:   (K, H, W, 1) augmented masks
    :param collect_losses: also return {'init': (len(init_iters)+1,),
        'update': (len(update_iters)+1,)} squared-residual-norm trajectories
        (legacy convergence instrumentation; works for BOTH solver forms)
    :return: (DiscParams, DiscState[, losses])
    """
    pw = compute_pixel_weights(labels, cfg)
    K = features.shape[0]
    score_hw = features.shape[1:3]

    # Phase 1: joint solve over {project, filter} on raw features
    mem1 = memory_init(K, features, labels, pw)

    def joint_net(theta, x):
        # tapsum=False: the solver's conv numerics stay lowering-independent
        # (CG trajectories are pinned against reference mirrors)
        return conv2d(conv2d(x, theta[0]), theta[1], tapsum=False)

    theta = (params.project, params.filter)
    out1 = _solve(mem1, cfg.filter_reg, cfg.precond, joint_net, theta,
                  init_cg_state(theta), cfg.init_iters, cfg, score_hw,
                  collect_losses=collect_losses)
    theta = out1[0]
    params = DiscParams(project=theta[0], filter=theta[1])

    # Phase 2: re-project, build the big compressed memory, filter-only solve
    compressed = conv2d(features, params.project)
    mem2 = memory_init(cfg.memory_size, compressed, labels, pw)

    def filter_net(theta, x):
        return conv2d(x, theta[0], tapsum=False)

    theta_f = (params.filter,)
    out2 = _solve(mem2, cfg.filter_reg[1:], cfg.precond[1:], filter_net,
                  theta_f, init_cg_state(theta_f), cfg.update_iters,
                  cfg, score_hw, collect_losses=collect_losses)
    (theta_f, cg) = out2[:2]
    params = params._replace(filter=theta_f[0])

    state = DiscState(memory=mem2, cg=cg, frame_num=jnp.zeros((), jnp.int32))
    if collect_losses:
        return params, state, {"init": out1[2], "update": out2[2]}
    return params, state


def disc_apply(params: DiscParams, ft, clamp_output: bool = False):
    """Classify one frame's features: returns (coarse scores, compressed sample).
    The compressed sample is what `disc_update` later inserts into memory
    (reference discriminator.py:201-206 caches it as `current_sample`).
    clamp_output bounds scores to (-0.1, 1.2) (legacy stack option)."""
    cft = conv2d(ft, params.project)
    scores = conv2d(cft, params.filter, tapsum=False)
    if clamp_output:
        scores = jnp.clip(scores, -0.1, 1.2)
    return scores, cft


def online_update_weights(train_y, cfg: DiscConfig):
    """Label + pixel-weight pair for an online memory insert, per update mode
    (main stack: reference discriminator.py:214-219; legacy modes:
    ytvos_validation/discriminator.py:374-394).

    :param train_y: (H, W, 1) soft mask
    :return: (label_to_store (H,W,1), pixel_weights (H,W,1))
    """
    m = cfg.update_method
    if m == "frtm":  # store the soft mask, weights from the thresholded mask
        ys = (train_y > 0.5).astype(jnp.float32)
        pw = compute_pixel_weights(ys[None], cfg)[0]
        return train_y, pw
    if m == "thresh":
        ys = (train_y > 0.5).astype(jnp.float32)
        pw = compute_pixel_weights(ys[None], cfg)[0]
        return ys, pw
    if m == "conf":
        ys = (train_y > 0.5).astype(jnp.float32)
        conf = 2.0 * jnp.abs(0.5 - train_y)
        pw = jnp.sqrt(conf) * compute_pixel_weights(ys[None], cfg)[0]
        return ys, pw
    if m == "raw":
        return train_y, jnp.ones_like(train_y)
    if m == "raw-conf":
        return train_y, 2.0 * jnp.abs(train_y - 0.5)
    raise ValueError(f"unknown update_method: {m}")


def filter_resolve(params: DiscParams, state: DiscState, cfg: DiscConfig,
                   collect_losses: bool = False):
    """Re-run the filter-only GN-CG solve on the current memory, warm-started
    from the carried CG state (reference discriminator.py:221-227).

    collect_losses: also return the (len(update_iters)+1,) squared residual
    norms of the solve — convergence instrumentation available under EITHER
    solver form (the production default 'stencil' included)."""
    def filter_net(theta, x):
        return conv2d(x, theta[0], tapsum=False)

    score_hw = state.memory.samples.shape[1:3]
    out = _solve(state.memory, cfg.filter_reg[1:], cfg.precond[1:],
                 filter_net, (params.filter,), state.cg,
                 cfg.update_iters, cfg, score_hw,
                 collect_losses=collect_losses)
    if collect_losses:
        theta_f, cg, losses = out
        return params._replace(filter=theta_f[0]), cg, losses
    theta_f, cg = out
    return params._replace(filter=theta_f[0]), cg


def disc_update(params: DiscParams, state: DiscState, compressed_sample, train_y,
                cfg: DiscConfig):
    """Per-frame online update (reference discriminator.py:208-227):
      * skip everything when the soft mask has < 10 foreground pixels
      * insert (sample, soft mask, weights-from-thresholded-mask) into memory
      * every `train_skipping`-th frame: re-solve the filter (lax.cond)

    :param compressed_sample: (h, w, c) from disc_apply's second output
    :param train_y: (H, W, 1) soft merged mask for this object
    :return: (DiscParams, DiscState)
    """
    if not cfg.update_filters:
        return params, state._replace(frame_num=state.frame_num + 1)
    frame_num = state.frame_num + 1
    enough_fg = (train_y > 0.5).sum() >= 10

    label, pw = online_update_weights(train_y, cfg)
    memory = memory_update(state.memory, compressed_sample, label, pw,
                           cfg.learning_rate, enabled=enough_fg)
    state = state._replace(memory=memory, frame_num=frame_num)

    do_train = enough_fg & (frame_num % cfg.train_skipping == 0)

    def train_branch(args):
        params, state = args
        new_params, cg = filter_resolve(params, state, cfg)
        return new_params, state._replace(cg=cg)

    def skip_branch(args):
        return args

    params, state = jax.lax.cond(do_train, train_branch, skip_branch, (params, state))
    return params, state
