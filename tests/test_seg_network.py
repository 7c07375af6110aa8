"""SegNetwork decoder tests: PyrUp bicubic parity vs the reference algorithm
(spec: 4x4 outer-product phase filters, grouped conv, interleave, crop),
block-level parity via torch functional ops, and checkpoint key conversion."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from frtm_tpu.models.seg_network import (
    init_seg_network, seg_network_apply, seg_network_from_torch_state_dict,
    pyr_up_bicubic,
)


def _torch_pyrup_reference(x_nchw: torch.Tensor) -> torch.Tensor:
    """Direct torch implementation of the PyrUpBicubic2d spec
    (/root/reference/model/seg_network.py:75-126): four 4x4 filters from
    outer products of Keys(A=-0.75) taps at phases -0.25 / -0.75."""
    def taps(d):
        x = d + torch.arange(-1, 3, dtype=torch.float32)
        x = torch.abs(x)
        a = -0.75
        return torch.where(
            x < 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            torch.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                        torch.zeros_like(x)))

    we = taps(torch.tensor(-0.25)).reshape(1, 4)
    wo = taps(torch.tensor(-0.75)).reshape(1, 4)
    C = x_nchw.shape[1]
    filt = {}
    for (ra, rb), (wa, wb) in {("e", "e"): (we, we), ("e", "o"): (we, wo),
                               ("o", "e"): (wo, we), ("o", "o"): (wo, wo)}.items():
        filt[ra + rb] = (wa.t() @ wb).expand(C, 1, 4, 4).contiguous()
    a = F.pad(x_nchw, (2, 2, 2, 2), "replicate")
    i00 = F.conv2d(a, filt["ee"], groups=C)
    i01 = F.conv2d(a, filt["eo"], groups=C)
    i10 = F.conv2d(a, filt["oe"], groups=C)
    i11 = F.conv2d(a, filt["oo"], groups=C)
    n, c, h, w = i00.shape
    j0 = torch.stack((i00, i01), dim=-1).view(n, c, h, 2 * w)
    j1 = torch.stack((i10, i11), dim=-1).view(n, c, h, 2 * w)
    out = torch.stack((j0, j1), dim=-2).view(n, c, 2 * h, 2 * w)
    return out[:, :, 1:-1, 1:-1]


@pytest.mark.parametrize("shape", [(1, 7, 9, 3), (2, 16, 16, 8)])
def test_pyr_up_bicubic_matches_reference_spec(rng, shape):
    x = rng.randn(*shape).astype(np.float32)
    got = np.asarray(pyr_up_bicubic(jnp.asarray(x)))
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    want = np.moveaxis(_torch_pyrup_reference(xt).numpy(), 1, -1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def _fake_torch_refiner_sd(rng, layers, ft_channels, oc=32, ic=1, use_bn=True):
    """Synthetic state dict with the reference's refiner.* key naming/shapes."""
    sd = {}

    def conv(name, cin, cout, k, bias=True):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        if bias:
            sd[name + ".bias"] = rng.randn(cout).astype(np.float32) * 0.05

    for L in layers:
        fc = ft_channels[L]
        nc = ic + oc
        conv(f"refiner.TSE.{L}.reduce.0", fc, oc, 1)
        conv(f"refiner.TSE.{L}.reduce.2", oc, oc, 1)
        conv(f"refiner.TSE.{L}.transform.0", nc, nc, 3)
        conv(f"refiner.TSE.{L}.transform.2", nc, nc, 3)
        conv(f"refiner.TSE.{L}.transform.4", nc, oc, 3)
        for R in ("RRB1", "RRB2"):
            conv(f"refiner.{R}.{L}.conv1x1", oc, oc, 1)
            conv(f"refiner.{R}.{L}.bblock.0", oc, oc, 3)
            if use_bn:
                sd[f"refiner.{R}.{L}.bblock.1.weight"] = rng.rand(oc).astype(np.float32) + 0.5
                sd[f"refiner.{R}.{L}.bblock.1.bias"] = rng.randn(oc).astype(np.float32) * 0.1
                sd[f"refiner.{R}.{L}.bblock.1.running_mean"] = rng.randn(oc).astype(np.float32) * 0.1
                sd[f"refiner.{R}.{L}.bblock.1.running_var"] = rng.rand(oc).astype(np.float32) + 0.5
                conv(f"refiner.{R}.{L}.bblock.3", oc, oc, 3, bias=False)
            else:
                conv(f"refiner.{R}.{L}.bblock.2", oc, oc, 3, bias=False)
        conv(f"refiner.CAB.{L}.convreluconv.0", 2 * oc, oc, 1)
        conv(f"refiner.CAB.{L}.convreluconv.2", oc, oc, 1)
    conv("refiner.project.conv1", oc, oc // 2, 3)
    conv("refiner.project.conv2", oc // 2, 1, 3)
    return sd


LAYERS = ("layer5", "layer4", "layer3", "layer2")
FT = {"layer5": 512, "layer4": 256, "layer3": 128, "layer2": 64}


def test_state_dict_conversion_and_forward(rng):
    sd = _fake_torch_refiner_sd(rng, LAYERS, FT)
    params = seg_network_from_torch_state_dict(sd, layers=LAYERS, use_bn=True)
    # backbone-shaped pyramid for a 64x96 image
    feats = {
        "layer5": jnp.asarray(rng.randn(1, 2, 3, 512).astype(np.float32)),
        "layer4": jnp.asarray(rng.randn(1, 4, 6, 256).astype(np.float32)),
        "layer3": jnp.asarray(rng.randn(1, 8, 12, 128).astype(np.float32)),
        "layer2": jnp.asarray(rng.randn(1, 16, 24, 64).astype(np.float32)),
    }
    scores = jnp.asarray(rng.randn(1, 4, 6, 1).astype(np.float32))
    logits = seg_network_apply(params, scores, feats, (64, 96), layers=LAYERS)
    assert logits.shape == (1, 64, 96, 1)
    assert bool(jnp.isfinite(logits).all())


@pytest.mark.slow
def test_init_forward_shapes():
    params = init_seg_network(jax.random.PRNGKey(0), FT)
    feats = {L: jnp.zeros((2, 64 // (2 ** (5 - int(L[-1]))), 96 // (2 ** (5 - int(L[-1]))), c))
             for L, c in FT.items()}
    scores = jnp.zeros((2, 4, 6, 1))
    logits = seg_network_apply(params, scores, feats, (64, 96))
    assert logits.shape == (2, 64, 96, 1)


def test_cab_gating_math(rng):
    """CAB must gate the shallow branch with a sigmoid of pooled context and add
    the (resized) deeper branch (reference seg_network.py:32-41)."""
    from frtm_tpu.models.seg_network import _cab
    oc = 4
    p = {"conv1": {"w": jnp.asarray(rng.randn(1, 1, 2 * oc, oc).astype(np.float32) * 0.1),
                   "b": jnp.zeros((oc,))},
         "conv2": {"w": jnp.asarray(rng.randn(1, 1, oc, oc).astype(np.float32) * 0.1),
                   "b": jnp.zeros((oc,))}}
    deeper = jnp.asarray(rng.randn(1, 4, 4, oc).astype(np.float32))
    shallower = jnp.asarray(rng.randn(1, 8, 8, oc).astype(np.float32))
    out = _cab(p, deeper, shallower, deepest=False)
    assert out.shape == (1, 8, 8, oc)
    # torch mirror
    dt = torch.from_numpy(np.moveaxis(np.asarray(deeper), -1, 1).copy())
    st = torch.from_numpy(np.moveaxis(np.asarray(shallower), -1, 1).copy())
    w1 = torch.from_numpy(np.transpose(np.asarray(p["conv1"]["w"]), (3, 2, 0, 1)).copy())
    w2 = torch.from_numpy(np.transpose(np.asarray(p["conv2"]["w"]), (3, 2, 0, 1)).copy())
    gp = torch.cat((F.adaptive_avg_pool2d(st, 1), F.adaptive_avg_pool2d(dt, 1)), dim=1)
    g = F.conv2d(F.relu(F.conv2d(gp, w1)), w2)
    want = st * torch.sigmoid(g) + F.interpolate(dt, (8, 8), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(out), np.moveaxis(want.numpy(), 1, -1),
                               atol=1e-5, rtol=0)


def test_precomputed_reduce_is_bit_identical():
    """seg_network_apply(reduced=...) — the shared-TSE-reduce path the
    multi-object trackers use — computes the same math as the direct path;
    only last-ulp noise from the conv backend's batch-size-dependent
    vectorisation may differ (measured 1.5e-8 on CPU)."""
    import jax
    from frtm_tpu.models.seg_network import (
        init_seg_network, seg_network_apply, seg_network_reduce)
    rng = np.random.RandomState(7)
    layers = ("layer5", "layer4", "layer3", "layer2")
    ch = {"layer5": 48, "layer4": 32, "layer3": 24, "layer2": 16}
    params = init_seg_network(jax.random.PRNGKey(3), ch)
    hw = {"layer5": (2, 3), "layer4": (4, 6), "layer3": (8, 12), "layer2": (16, 24)}
    N = 3
    feats1 = {L: jnp.asarray(rng.randn(1, *hw[L], ch[L]).astype(np.float32))
              for L in layers}
    featsN = {L: jnp.broadcast_to(f, (N,) + f.shape[1:]) for L, f in feats1.items()}
    scores = jnp.asarray(rng.randn(N, 2, 3, 1).astype(np.float32))

    direct = seg_network_apply(params, scores, featsN, (32, 48), layers=layers)
    red1 = seg_network_reduce(params, feats1, layers)
    redN = {L: (jnp.broadcast_to(h, (N,) + h.shape[1:]),
                jnp.broadcast_to(hp, (N,) + hp.shape[1:]))
            for L, (h, hp) in red1.items()}
    shared = seg_network_apply(params, scores, None, (32, 48), layers=layers,
                               reduced=redN)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(shared),
                               atol=1e-6, rtol=1e-6)
