"""SegNetwork — the multi-scale refinement decoder, TPU-native.

Capability parity with /root/reference/model/seg_network.py: per refinement
layer (deep->shallow) a target-specific encoder (TSE), residual refinement
blocks (RRB) around a channel-attention block (CAB), then a two-stage bicubic
pyramid upsampler ("BackwardCompatibleUpsampler", reference lines 129-146)
whose exact numerics the published checkpoints were trained with:
  * PyrUpBicubic2d (reference lines 75-126): 2x bicubic upsampling via four
    phase filters built from the Keys kernel (A=-0.75) at offsets -0.25/-0.75,
    replicate padding 2, pixel interleave, crop 1. The reference materialises
    non-separable 4x4 grouped convs; the filters are outer products of 4-tap
    1-D kernels, so we apply the two 1-D passes as shifted weighted slice sums
    (pure VPU work, no gathers) — numerically identical, cheaper.
  * the reference's `relu()` is LeakyReLU(0.0) and RRB uses true relu at the
    residual join (reference lines 50-56) — both are max(x, 0) here.
  * BatchNorm runs in inference mode from running stats; the trainer has a
    batch-stats mode (see runtime/trainer.py).

All state is a params pytree; `seg_network_from_torch_state_dict` maps the
published `refiner.*` checkpoint keys (e.g. 'TSE.layer4.reduce.0.weight',
see /root/reference/evaluate.py:38) onto it.
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, batch_norm, relu
from ..ops.resize import interpolate, adaptive_cat, _cubic_kernel


# ---------------------------------------------------------------------------
# Init


def _conv_params(key, kh, kw, cin, cout, bias=True):
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) on weight,
    # uniform(-1/sqrt(fan_in), ...) on bias
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = np.sqrt(6.0 / ((1 + 5.0) * fan_in))
    p = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -bound, bound)}
    if bias:
        bb = 1.0 / np.sqrt(fan_in)
        p["b"] = jax.random.uniform(k2, (cout,), jnp.float32, -bb, bb)
    return p


def _bn_params(c):
    return dict(scale=jnp.ones((c,)), bias=jnp.zeros((c,)),
                mean=jnp.zeros((c,)), var=jnp.ones((c,)))


def init_seg_network(key, ft_channels, in_channels=1, out_channels=32, use_bn=True):
    """:param ft_channels: deep-to-shallow {layer_name: feature channels} of the
    refinement layers (e.g. layer5..layer2), as the reference's SegNetwork takes."""
    keys = iter(jax.random.split(key, 128))
    oc, ic = out_channels, in_channels
    params = {"tse": {}, "rrb1": {}, "cab": {}, "rrb2": {}, "meta": None}
    for L, fc in ft_channels.items():
        nc = ic + oc
        params["tse"][L] = {
            "reduce1": _conv_params(next(keys), 1, 1, fc, oc),
            "reduce2": _conv_params(next(keys), 1, 1, oc, oc),
            "transform1": _conv_params(next(keys), 3, 3, nc, nc),
            "transform2": _conv_params(next(keys), 3, 3, nc, nc),
            "transform3": _conv_params(next(keys), 3, 3, nc, oc),
        }
        for rrb in ("rrb1", "rrb2"):
            p = {
                "conv1x1": _conv_params(next(keys), 1, 1, oc, oc),
                "bb1": _conv_params(next(keys), 3, 3, oc, oc),
                "bb2": _conv_params(next(keys), 3, 3, oc, oc, bias=False),
            }
            if use_bn:
                p["bn"] = _bn_params(oc)
            params[rrb][L] = p
        params["cab"][L] = {
            "conv1": _conv_params(next(keys), 1, 1, 2 * oc, oc),
            "conv2": _conv_params(next(keys), 1, 1, oc, oc),
        }
    params["up"] = {
        "conv1": _conv_params(next(keys), 3, 3, oc, oc // 2),
        "conv2": _conv_params(next(keys), 3, 3, oc // 2, 1),
    }
    return params


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (refiner.* keys from the published .pth files)


def _t2j_cw(w):
    return jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0))))


def _conv_from(sd, name):
    p = {"w": _t2j_cw(sd[name + ".weight"])}
    if name + ".bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[name + ".bias"]))
    return p


def seg_network_from_torch_state_dict(sd, layers=("layer5", "layer4", "layer3", "layer2"),
                                      use_bn=True, prefix="refiner."):
    """Map the reference checkpoint's refiner keys onto our pytree.
    Reference module naming: TSE.{L}.reduce.{0,2}, TSE.{L}.transform.{0,2,4},
    RRB{1,2}.{L}.conv1x1 / .bblock.{0,1,3 or 0,2}, CAB.{L}.convreluconv.{0,2},
    project.conv{1,2} (the upsampler; its bicubic filters are fixed buffers and
    absent from checkpoints)."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params = {"tse": {}, "rrb1": {}, "cab": {}, "rrb2": {}}
    for L in layers:
        params["tse"][L] = {
            "reduce1": _conv_from(sd, f"TSE.{L}.reduce.0"),
            "reduce2": _conv_from(sd, f"TSE.{L}.reduce.2"),
            "transform1": _conv_from(sd, f"TSE.{L}.transform.0"),
            "transform2": _conv_from(sd, f"TSE.{L}.transform.2"),
            "transform3": _conv_from(sd, f"TSE.{L}.transform.4"),
        }
        for rrb in ("rrb1", "rrb2"):
            R = rrb.upper()[:3] + rrb[-1]  # RRB1 / RRB2
            p = {
                "conv1x1": _conv_from(sd, f"{R}.{L}.conv1x1"),
                "bb1": _conv_from(sd, f"{R}.{L}.bblock.0"),
            }
            if use_bn:
                p["bn"] = dict(
                    scale=jnp.asarray(np.asarray(sd[f"{R}.{L}.bblock.1.weight"])),
                    bias=jnp.asarray(np.asarray(sd[f"{R}.{L}.bblock.1.bias"])),
                    mean=jnp.asarray(np.asarray(sd[f"{R}.{L}.bblock.1.running_mean"])),
                    var=jnp.asarray(np.asarray(sd[f"{R}.{L}.bblock.1.running_var"])),
                )
                p["bb2"] = _conv_from(sd, f"{R}.{L}.bblock.3")
            else:
                p["bb2"] = _conv_from(sd, f"{R}.{L}.bblock.2")
            params[rrb][L] = p
        params["cab"][L] = {
            "conv1": _conv_from(sd, f"CAB.{L}.convreluconv.0"),
            "conv2": _conv_from(sd, f"CAB.{L}.convreluconv.2"),
        }
    params["up"] = {
        "conv1": _conv_from(sd, "project.conv1"),
        "conv2": _conv_from(sd, "project.conv2"),
    }
    return params


# ---------------------------------------------------------------------------
# Apply


def _c(p, x, **kw):
    return conv2d(x, p["w"], p.get("b"), **kw)


def _tse_reduce(p, ft):
    """The score-independent half of the TSE: feature reduction + its pooled
    vector. Split out so multi-object trackers can run it ONCE per frame and
    broadcast the (cheap, 32-channel) result across object lanes instead of
    broadcasting the full backbone pyramid. Same math on identical inputs;
    only conv-backend batch-size vectorisation ulps can differ (~1e-8)."""
    h = _c(p["reduce2"], relu(_c(p["reduce1"], ft)))
    hpool = jnp.mean(h, axis=(1, 2), keepdims=True)
    return h, hpool


def _tse_transform(p, h, score):
    # measured anti-lesson (round 3, v5e): splitting transform1 as
    # conv(h, W[:oc]) + conv(score, W[oc:]) to skip this concat was 2.6 ms
    # SLOWER per 2-object pass (four extra tiny conv ops) and the in-scan
    # concatenate time didn't move — the decode concats are the PyrUp
    # interleave stacks, not adaptive_cat
    h = adaptive_cat((h, score), ref_index=0)
    h = relu(_c(p["transform1"], h))
    h = relu(_c(p["transform2"], h))
    h = relu(_c(p["transform3"], h))
    return h


def _tse(p, ft, score):
    h, hpool = _tse_reduce(p, ft)
    return _tse_transform(p, h, score), hpool


def seg_network_reduce(params, features,
                       layers=("layer5", "layer4", "layer3", "layer2")):
    """Precompute the object-independent TSE reductions for a batch of frames:
    {layer: (reduced (B,h,w,oc), pooled (B,1,1,oc))}. Feed the result to
    seg_network_apply(reduced=...) to decode many per-object score maps
    against shared frames without re-reducing (or even materialising) the
    backbone pyramid per object."""
    return {L: _tse_reduce(params["tse"][L], features[L]) for L in layers}


def _rrb(p, x, bn_updates=None, bn_key=None):
    h = _c(p["conv1x1"], x)
    b = _c(p["bb1"], h)
    if "bn" in p:
        if bn_updates is None:
            b = batch_norm(b, p["bn"])
        else:
            b, new_stats = _batch_norm_train(b, p["bn"])
            bn_updates[bn_key] = new_stats
    b = relu(b)
    b = conv2d(b, p["bb2"]["w"])
    return relu(h + b)


def _batch_norm_train(x, params, momentum: float = 0.1, eps: float = 1e-5):
    """Training-mode BN: normalise with batch statistics, return momentum-
    updated running stats (torch semantics: biased var for normalisation,
    unbiased var for the running estimate)."""
    axes = (0, 1, 2)
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    var_unbiased = var * n / max(n - 1, 1)
    inv = params["scale"] * jax.lax.rsqrt(var + eps)
    y = x * inv + (params["bias"] - mean * inv)
    new_stats = dict(
        scale=params["scale"], bias=params["bias"],
        mean=(1 - momentum) * params["mean"] + momentum * jax.lax.stop_gradient(mean),
        var=(1 - momentum) * params["var"] + momentum * jax.lax.stop_gradient(var_unbiased),
    )
    return y, new_stats


def _cab(p, deeper, shallower, deepest):
    shallow_pool = jnp.mean(shallower, axis=(1, 2), keepdims=True)
    deeper_pool = deeper if deepest else jnp.mean(deeper, axis=(1, 2), keepdims=True)
    g = jnp.concatenate([shallow_pool, deeper_pool], axis=-1)
    g = _c(p["conv2"], relu(_c(p["conv1"], g)))
    out = shallower * jax.nn.sigmoid(g) + interpolate(deeper, shallower.shape[-3:-1])
    return out


def _pyr_taps(phase):
    """Four Keys-cubic taps (A=-0.75) at the reference's phase offsets
    (PyrUpBicubic2d.kernel, seg_network.py:82-90)."""
    x = phase + np.arange(-1, 3, dtype=np.float64)
    return _cubic_kernel(x).astype(np.float32)


_W_EVEN = _pyr_taps(-0.25)
_W_ODD = _pyr_taps(-0.75)


def _filt4(x, taps, axis):
    """4-tap 1-D filter along a spatial axis of a replicate-padded NHWC array;
    output length = in - 3 (matches the valid 4-tap conv). Taps are applied as
    weak Python floats so the input dtype (e.g. bfloat16) is preserved."""
    n = x.shape[axis] - 3
    sl = [slice(None)] * x.ndim

    def take(off):
        sl2 = list(sl)
        sl2[axis] = slice(off, off + n)
        return x[tuple(sl2)]

    t0, t1, t2, t3 = (float(t) for t in taps)
    return t0 * take(0) + t1 * take(1) + t2 * take(2) + t3 * take(3)


def pyr_up_bicubic(x):
    """2x bicubic pyramid upsampling, numerically identical to the reference's
    PyrUpBicubic2d (separable form of its four 4x4 phase filters)."""
    a = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge")
    # rows (H axis): even/odd phases; then columns (W axis)
    re = _filt4(a, _W_EVEN, 1)
    ro = _filt4(a, _W_ODD, 1)
    i00 = _filt4(re, _W_EVEN, 2)
    i01 = _filt4(re, _W_ODD, 2)
    i10 = _filt4(ro, _W_EVEN, 2)
    i11 = _filt4(ro, _W_ODD, 2)
    n, h, w, c = i00.shape
    j0 = jnp.stack([i00, i01], axis=3).reshape(n, h, 2 * w, c)
    j1 = jnp.stack([i10, i11], axis=3).reshape(n, h, 2 * w, c)
    out = jnp.stack([j0, j1], axis=2).reshape(n, 2 * h, 2 * w, c)
    return out[:, 1:-1, 1:-1, :]


def _upsampler(p, x, image_size, style="pyrup"):
    """Two-stage upsampling head. 'pyrup' = the main stack's
    BackwardCompatibleUpsampler (reference seg_network.py:129-146; what the
    published checkpoints were trained with); 'bicubic' = the legacy stack's
    plain interpolating Upsampler (ytvos_validation/seg_network.py:63-77)."""
    if style == "pyrup":
        x = pyr_up_bicubic(x)
        x = relu(_c(p["conv1"], x))
        x = pyr_up_bicubic(x)
        x = interpolate(x, image_size)
        x = _c(p["conv2"], x)
        return x
    assert style == "bicubic"
    from ..ops.resize import resize_bicubic
    x = resize_bicubic(x, (2 * x.shape[-3], 2 * x.shape[-2]))
    x = relu(_c(p["conv1"], x))
    x = resize_bicubic(x, image_size)
    x = _c(p["conv2"], x)
    return x


def seg_network_apply(params, scores, features, image_size,
                      layers=("layer5", "layer4", "layer3", "layer2"),
                      train_bn: bool = False, upsampler: str = "pyrup",
                      reduced=None):
    """Refine coarse score map(s) into a full-resolution mask logit.

    :param scores:     (N, h, w, C) coarse discriminator scores, or a LIST of
                       such maps (the legacy stack's multi-layer scores: each
                       is resized to the refinement layer's size and
                       channel-concatenated, ytvos_validation/seg_network.py:106-110)
    :param features:   {layer: (N, h, w, c)} backbone pyramid (may be None
                       when `reduced` is given)
    :param image_size: (H, W) output size
    :param train_bn:   use batch statistics in the RRB BatchNorms (training);
                       returns (logits, bn_updates) where bn_updates maps
                       (rrb_name, layer) -> updated running-stat dicts
    :param upsampler:  'pyrup' | 'bicubic' upsampling head
    :param reduced:    optional precomputed seg_network_reduce() output
                       (already broadcast to the score batch); skips the
                       object-independent TSE reductions — bit-identical
    :return: (N, H, W, 1) mask logits (caller applies sigmoid, as the
             reference Tracker does at model/tracker.py:203)
    """
    score_list = scores if isinstance(scores, (list, tuple)) else [scores]
    bn_updates = {} if train_bn else None
    x = None
    for i, L in enumerate(layers):
        if reduced is None:
            h0, hpool = _tse_reduce(params["tse"][L], features[L])
        else:
            h0, hpool = reduced[L]
        sz = h0.shape[-3:-1]
        s = jnp.concatenate([interpolate(ss, sz) for ss in score_list], axis=-1)
        h = _tse_transform(params["tse"][L], h0, s)
        if x is not None:
            hpool = x
        h = _rrb(params["rrb1"][L], h, bn_updates, ("rrb1", L))
        h = _cab(params["cab"][L], hpool, h, deepest=(i == 0))
        x = _rrb(params["rrb2"][L], h, bn_updates, ("rrb2", L))
    logits = _upsampler(params["up"], x, image_size, style=upsampler)
    if train_bn:
        return logits, bn_updates
    return logits


def apply_bn_updates(params, bn_updates):
    """Fold train-mode BN running-stat updates back into the params pytree.

    ONLY mean/var are taken from the update dicts: scale/bias are ordinary
    trainable parameters (torch trains BN weight/bias through the optimizer,
    reference model/seg_network.py RRB blocks), and the update dicts carry
    the values captured BEFORE the optimizer step — overwriting them here
    would silently pin the BN affine at its initial (1, 0) forever."""
    params = dict(params)
    for (rrb, L), stats in bn_updates.items():
        params[rrb] = dict(params[rrb])
        params[rrb][L] = dict(params[rrb][L])
        bn = dict(params[rrb][L]["bn"])
        bn["mean"] = stats["mean"]
        bn["var"] = stats["var"]
        params[rrb][L]["bn"] = bn
    return params
