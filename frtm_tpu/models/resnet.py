"""Frozen ResNet-18/34/50/101 feature pyramid extractor, TPU-native.

Capability parity with /root/reference/model/feature_extractor.py:
  * input is raw uint8-range (0..255) NHWC images; ImageNet normalisation is
    folded into one affine `x * norm_weight + norm_bias`
    (reference lines 27-32, 42)
  * emits a dict of 5 pyramid levels named layer1..layer5 = stem/maxpool and
    the four residual stages (strides 4, 4, 8, 16, 32; reference lines 50-68)
  * channel map reported deep-to-shallow as required by the decoder
    (reference lines 20-25)
  * weights are frozen — the extractor is a pure function of (params, images)
    and its params are excluded from training checkpoints.

TPU-first details: NHWC activations / HWIO kernels, optional bfloat16 compute
with float32 batch-norm folding, and a batched apply — the extractor has no
per-frame state, so whole sequences are stacked on the batch axis to fill the
MXU (the reference processes one frame at a time; batching is our headline
throughput lever, SURVEY.md §7).
"""
import numpy as np
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d, max_pool_3x3_s2, batch_norm, relu

# (block_type, stage_depths, stage_width_mult)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def resnet_out_channels(arch: str):
    """Deep-to-shallow {layer_name: channels} (decoder ordering,
    reference feature_extractor.py:20-25)."""
    block, _ = RESNET_SPECS[arch]
    expansion = 4 if block == "bottleneck" else 1
    widths = [64, 128, 256, 512]
    return {
        "layer5": widths[3] * expansion,
        "layer4": widths[2] * expansion,
        "layer3": widths[1] * expansion,
        "layer2": widths[0] * expansion,
        "layer1": 64,
    }


# ---------------------------------------------------------------------------
# Initialisation


def _conv_init(key, kh, kw, cin, cout):
    # He-normal fan_out, matching torchvision's kaiming_normal_(mode='fan_out')
    fan_out = kh * kw * cout
    std = np.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return dict(scale=jnp.ones((c,)), bias=jnp.zeros((c,)),
                mean=jnp.zeros((c,)), var=jnp.ones((c,)))


def init_resnet(key, arch: str):
    """Random-init params pytree (used when no pretrained weights are supplied,
    e.g. benchmarking; real runs convert torchvision weights)."""
    block, depths = RESNET_SPECS[arch]
    keys = iter(jax.random.split(key, 256))

    params = {
        "conv1": _conv_init(next(keys), 7, 7, 3, 64),
        "bn1": _bn_init(64),
        "stages": [],
    }
    cin = 64
    widths = [64, 128, 256, 512]
    expansion = 4 if block == "bottleneck" else 1
    for si, (w, d) in enumerate(zip(widths, depths)):
        stage = []
        for bi in range(d):
            stride = 2 if (si > 0 and bi == 0) else 1
            cout = w * expansion
            blk = {}
            if block == "basic":
                blk["conv1"] = _conv_init(next(keys), 3, 3, cin, w)
                blk["bn1"] = _bn_init(w)
                blk["conv2"] = _conv_init(next(keys), 3, 3, w, w)
                blk["bn2"] = _bn_init(w)
            else:
                blk["conv1"] = _conv_init(next(keys), 1, 1, cin, w)
                blk["bn1"] = _bn_init(w)
                blk["conv2"] = _conv_init(next(keys), 3, 3, w, w)
                blk["bn2"] = _bn_init(w)
                blk["conv3"] = _conv_init(next(keys), 1, 1, w, cout)
                blk["bn3"] = _bn_init(cout)
            if stride != 1 or cin != cout:
                blk["downsample"] = {
                    "conv": _conv_init(next(keys), 1, 1, cin, cout),
                    "bn": _bn_init(cout),
                }
            stage.append(blk)
            cin = cout
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# Torch weight conversion


def _t2j_conv(w):
    # torch OIHW -> HWIO
    return jnp.asarray(np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0))))


def _t2j_bn(sd, prefix):
    return dict(
        scale=jnp.asarray(np.asarray(sd[prefix + ".weight"])),
        bias=jnp.asarray(np.asarray(sd[prefix + ".bias"])),
        mean=jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
        var=jnp.asarray(np.asarray(sd[prefix + ".running_var"])),
    )


def resnet_from_torch_state_dict(sd, arch: str, prefix: str = ""):
    """Convert a torchvision-format resnet state dict (numpy-convertible values)
    into our pytree. `prefix` strips e.g. 'resnet.' from key names."""
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    block, depths = RESNET_SPECS[arch]
    n_convs = {"basic": 2, "bottleneck": 3}[block]
    params = {
        "conv1": _t2j_conv(sd["conv1.weight"]),
        "bn1": _t2j_bn(sd, "bn1"),
        "stages": [],
    }
    for si, d in enumerate(depths):
        stage = []
        for bi in range(d):
            p = f"layer{si + 1}.{bi}"
            blk = {}
            for ci in range(1, n_convs + 1):
                blk[f"conv{ci}"] = _t2j_conv(sd[f"{p}.conv{ci}.weight"])
                blk[f"bn{ci}"] = _t2j_bn(sd, f"{p}.bn{ci}")
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _t2j_conv(sd[f"{p}.downsample.0.weight"]),
                    "bn": _t2j_bn(sd, f"{p}.downsample.1"),
                }
            stage.append(blk)
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# Apply


def _basic_block(p, x, stride):
    idn = x
    h = relu(batch_norm(conv2d(x, p["conv1"], stride=stride), p["bn1"]))
    h = batch_norm(conv2d(h, p["conv2"]), p["bn2"])
    if "downsample" in p:
        idn = batch_norm(conv2d(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"])
    return relu(h + idn)


def _bottleneck_block(p, x, stride):
    idn = x
    h = relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    h = relu(batch_norm(conv2d(h, p["conv2"], stride=stride), p["bn2"]))
    h = batch_norm(conv2d(h, p["conv3"]), p["bn3"])
    if "downsample" in p:
        idn = batch_norm(conv2d(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"])
    return relu(h + idn)


def extract_features(params, images, arch: str, output_layers=None,
                     dtype=jnp.float32, out_dtype=jnp.float32):
    """Run the frozen backbone on a batch of raw 0-255 NHWC images.

    :param images:        (N, H, W, 3), any dtype holding 0..255 values
    :param output_layers: optional iterable of layer names to keep
    :param dtype:         compute dtype (jnp.bfloat16 on TPU for 2x MXU rate)
    :param out_dtype:     dtype of the emitted feature maps (bf16 halves the
                          pyramid's HBM footprint for consumers that compute
                          in bf16 anyway; the solver path wants float32)
    :return: {layer1..layer5: (N, h, w, c) feature maps}
    """
    block, depths = RESNET_SPECS[arch]
    block_fn = _basic_block if block == "basic" else _bottleneck_block
    want = None if output_layers is None else set(output_layers)
    deepest = "layer5" if want is None else max(want)  # layerN names sort correctly

    norm_w = jnp.asarray(1.0 / 255.0 / _IMAGENET_STD, dtype)
    norm_b = jnp.asarray(-_IMAGENET_MEAN / _IMAGENET_STD, dtype)
    x = images.astype(dtype) * norm_w + norm_b

    cast = lambda t: t.astype(dtype) if dtype != jnp.float32 else t

    out = {}

    def save(name, t):
        if want is None or name in want:
            out[name] = t.astype(out_dtype)

    with jax.named_scope("stem"):
        x = relu(batch_norm(conv2d(x, cast(params["conv1"]), stride=2), jax.tree.map(cast, params["bn1"])))
        x = max_pool_3x3_s2(x)
    save("layer1", x)
    if deepest == "layer1":  # stem-only request: skip all residual stages
        return out
    for si, stage in enumerate(params["stages"]):
        name = f"layer{si + 2}"
        with jax.named_scope(f"stage{si + 1}"):
            for bi, blk in enumerate(stage):
                stride = 2 if (si > 0 and bi == 0) else 1
                x = block_fn(jax.tree.map(cast, blk), x, stride)
        save(name, x)
        if name == deepest:
            break
    return out
