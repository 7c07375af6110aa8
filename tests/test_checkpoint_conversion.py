"""End-to-end checkpoint conversion: a reference-format torch .pth (trainer
checkpoint with 'model' holding refiner.* keys) must load through
load_reference_model with backbone autodetection, and torchvision-format
backbone .pth files through load_backbone."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from frtm_tpu.utils.checkpoints import (
    load_reference_model, load_backbone, save_pytree, load_pytree,
)


def _refiner_sd(rng, in_ch):
    """Minimal refiner.* state dict with the reference's key layout and the
    layer4 reduce conv that drives backbone autodetection (evaluate.py:36-44)."""
    sd = {}

    def conv(name, cin, cout, k, bias=True):
        sd[name + ".weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32))
        if bias:
            sd[name + ".bias"] = torch.from_numpy(rng.randn(cout).astype(np.float32))

    chans = {"layer5": in_ch * 2, "layer4": in_ch, "layer3": in_ch // 2,
             "layer2": in_ch // 4}
    oc, ic = 32, 1
    for L, fc in chans.items():
        nc = ic + oc
        conv(f"refiner.TSE.{L}.reduce.0", fc, oc, 1)
        conv(f"refiner.TSE.{L}.reduce.2", oc, oc, 1)
        conv(f"refiner.TSE.{L}.transform.0", nc, nc, 3)
        conv(f"refiner.TSE.{L}.transform.2", nc, nc, 3)
        conv(f"refiner.TSE.{L}.transform.4", nc, oc, 3)
        for R in ("RRB1", "RRB2"):
            conv(f"refiner.{R}.{L}.conv1x1", oc, oc, 1)
            conv(f"refiner.{R}.{L}.bblock.0", oc, oc, 3)
            sd[f"refiner.{R}.{L}.bblock.1.weight"] = torch.ones(oc)
            sd[f"refiner.{R}.{L}.bblock.1.bias"] = torch.zeros(oc)
            sd[f"refiner.{R}.{L}.bblock.1.running_mean"] = torch.zeros(oc)
            sd[f"refiner.{R}.{L}.bblock.1.running_var"] = torch.ones(oc)
            sd[f"refiner.{R}.{L}.bblock.1.num_batches_tracked"] = torch.tensor(0)
            conv(f"refiner.{R}.{L}.bblock.3", oc, oc, 3, bias=False)
        conv(f"refiner.CAB.{L}.convreluconv.0", 2 * oc, oc, 1)
        conv(f"refiner.CAB.{L}.convreluconv.2", oc, oc, 1)
    conv("refiner.project.conv1", oc, oc // 2, 3)
    conv("refiner.project.conv2", oc // 2, 1, 3)
    return sd


@pytest.mark.parametrize("in_ch,arch", [(1024, "resnet101"), (256, "resnet18")])
def test_load_reference_pth(tmp_path, rng, in_ch, arch):
    sd = _refiner_sd(rng, in_ch)
    ckpt = {"model": sd, "epoch": 260, "optimizer": {}, "scheduler": {}}
    p = tmp_path / "ckpt.pth"
    torch.save(ckpt, p)

    got_arch, refiner = load_reference_model(p)
    assert got_arch == arch
    w = np.asarray(refiner["tse"]["layer4"]["reduce1"]["w"])
    want = sd["refiner.TSE.layer4.reduce.0.weight"].numpy()
    np.testing.assert_allclose(w, np.transpose(want, (2, 3, 1, 0)))


def test_load_torchvision_backbone_pth(tmp_path, rng):
    # fabricate a torchvision-format resnet18 state dict
    import torch.nn as nn
    from tests.test_resnet import _TorchResnet, _BasicBlock
    tm = _TorchResnet(_BasicBlock, (2, 2, 2, 2))
    p = tmp_path / "rn18.pth"
    torch.save(tm.state_dict(), p)
    params = load_backbone(p, "resnet18")
    assert params["conv1"].shape == (7, 7, 3, 64)
    assert len(params["stages"]) == 4


def test_native_pytree_roundtrip(tmp_path, rng):
    tree = {"a": jnp.asarray(rng.randn(3, 4).astype(np.float32)),
            "b": [jnp.ones((2,)), {"c": jnp.zeros((5,), jnp.int32)}],
            "name": "sess"}
    save_pytree(tmp_path / "t", tree)
    back = load_pytree(tmp_path / "t")
    assert back["name"] == "sess"
    np.testing.assert_allclose(np.asarray(back["a"]), np.asarray(tree["a"]))
    assert back["b"][1]["c"].dtype == jnp.int32
