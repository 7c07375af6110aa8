"""Checkpoint handling: conversion of the reference's torch `.pth` files
(refiner weights + torchvision backbones) into our pytrees, and a native
numpy-based format for our own checkpoints.

The published FRTM checkpoints hold only `refiner.*` keys (the backbone is
deliberately excluded — /root/reference/model/feature_extractor.py is not an
nn.Module; see SURVEY.md §2.2), so a full model load is: refiner from the
.pth + a torchvision-format backbone state dict."""
import pickle
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def load_torch_state_dict(path):
    """torch.load a .pth and return {key: numpy array}. Accepts either a raw
    state dict or a trainer checkpoint with a 'model' entry
    (reference evaluate.py:144 loads ckpt['model'])."""
    import torch  # local import: torch only needed for conversion

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and not _looks_like_state_dict(ckpt):
        ckpt = ckpt["model"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in ckpt.items()}


def _looks_like_state_dict(d):
    return any(k.endswith(".weight") for k in d)


def load_reference_model(path):
    """Load a published FRTM checkpoint: returns (arch, refiner_params).
    Backbone autodetection per reference evaluate.py:36-44."""
    from ..config import autodetect_arch
    from ..models.seg_network import seg_network_from_torch_state_dict

    sd = load_torch_state_dict(path)
    arch = autodetect_arch(sd)
    refiner = seg_network_from_torch_state_dict(sd)
    return arch, refiner


def load_backbone(path_or_sd, arch):
    """Convert a torchvision-format resnet state dict (path to .pth or dict)."""
    from ..models.resnet import resnet_from_torch_state_dict

    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, (str, Path)) \
        else path_or_sd
    return resnet_from_torch_state_dict(sd, arch)


# ---------------------------------------------------------------------------
# Native checkpoint format: flattened-pytree .npz + pickled treedef sidecar.


def save_pytree(path, tree):
    """Save any pytree as <path>.npz (flattened leaves) + <path>.treedef."""
    path = str(path).removesuffix(".npz")
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(path + ".npz", **{str(i): np.asarray(l) for i, l in enumerate(leaves)})
    with open(path + ".treedef", "wb") as f:
        pickle.dump(treedef, f)


def load_pytree(path):
    path = str(path).removesuffix(".npz")
    with np.load(path + ".npz", allow_pickle=True) as z:
        leaves = []
        for i in range(len(z.files)):
            a = z[str(i)]
            if a.dtype.kind in "biufc":  # numeric -> device array
                leaves.append(jnp.asarray(a))
            else:  # strings/objects (e.g. a session name) stay host-side
                leaves.append(a.item() if a.ndim == 0 else a)
    with open(path + ".treedef", "rb") as f:
        treedef = pickle.load(f)
    return jax.tree.unflatten(treedef, leaves)
