"""ResNet extractor tests: full-network numerical parity against a torch mirror
loaded with identical weights, plus pyramid-shape and channel-map checks."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp
import jax

from frtm_tpu.models import (
    init_resnet, resnet_from_torch_state_dict, extract_features, resnet_out_channels,
)


# --- minimal torch ResNet mirror (standard architecture, test scaffolding only) ---

class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, w, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, w, 1, stride, bias=False), nn.BatchNorm2d(w))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idn)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, w, stride):
        super().__init__()
        cout = w * 4
        self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.conv3 = nn.Conv2d(w, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.relu(h + idn)


class _TorchResnet(nn.Module):
    def __init__(self, block, depths):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for si, (w, d) in enumerate(zip([64, 128, 256, 512], depths)):
            blocks = []
            for bi in range(d):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(block(cin, w, stride))
                cin = w * block.expansion
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        out = {}
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        out["layer1"] = x
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            out[f"layer{i + 1}"] = x
        return out


def _randomize_bn(m, rng):
    for mod in m.modules():
        if isinstance(mod, nn.BatchNorm2d):
            c = mod.num_features
            mod.running_mean.copy_(torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1))
            mod.running_var.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
            mod.weight.data.copy_(torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))
            mod.bias.data.copy_(torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1))


@pytest.mark.parametrize("arch,block,depths", [
    ("resnet18", _BasicBlock, (2, 2, 2, 2)),
    ("resnet50", _Bottleneck, (3, 4, 6, 3)),
])
def test_extractor_matches_torch_mirror(rng, arch, block, depths):
    tm = _TorchResnet(block, depths).eval()
    with torch.no_grad():
        _randomize_bn(tm, rng)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = resnet_from_torch_state_dict(sd, arch)

    img = (rng.rand(1, 64, 96, 3) * 255).astype(np.float32)
    feats = extract_features(params, jnp.asarray(img), arch)

    # torch forward with the reference's normalisation convention
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    x = (x / 255.0 - mean) / std
    with torch.no_grad():
        want = tm(x)

    for L in ["layer1", "layer2", "layer3", "layer4", "layer5"]:
        got = np.asarray(feats[L])
        ref = np.moveaxis(want[L].numpy(), 1, -1)
        assert got.shape == ref.shape, L
        np.testing.assert_allclose(got, ref, atol=2e-3, rtol=0, err_msg=L)


@pytest.mark.slow
def test_pyramid_shapes_and_channels():
    for arch in ["resnet18", "resnet101"]:
        params = init_resnet(jax.random.PRNGKey(0), arch)
        feats = extract_features(params, jnp.zeros((2, 64, 96, 3)), arch)
        ch = resnet_out_channels(arch)
        assert feats["layer1"].shape == (2, 16, 24, 64)
        assert feats["layer2"].shape[1:3] == (16, 24)
        assert feats["layer3"].shape[1:3] == (8, 12)
        assert feats["layer4"].shape == (2, 4, 6, ch["layer4"])
        assert feats["layer5"].shape == (2, 2, 3, ch["layer5"])
    assert resnet_out_channels("resnet101")["layer4"] == 1024
    assert resnet_out_channels("resnet18")["layer4"] == 256


def test_output_layers_subset():
    params = init_resnet(jax.random.PRNGKey(0), "resnet18")
    feats = extract_features(params, jnp.zeros((1, 32, 32, 3)), "resnet18",
                             output_layers=["layer4"])
    assert list(feats.keys()) == ["layer4"]
