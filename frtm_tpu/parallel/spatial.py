"""Spatially-partitioned (SP) single-frame inference over a device mesh.

Why SP for this model family: VOS inference is latency-bound work at batch 1
on large frames (480x854) — data parallelism (train_step.py) and sequence
parallelism (multi_sequence.py) add throughput but cannot make ONE frame
faster. Sharding the image height across a 'spatial' mesh axis does: every
conv, norm, and elementwise op in the backbone/decoder partitions cleanly
along H, and GSPMD inserts the halo exchanges the 3x3/7x7 conv stencils need
at shard boundaries (a ring of `collective-permute`s over ICI, each moving
only pad-rows — O(W*C) bytes, not O(H*W*C)). The reference has no analogue:
it is strictly single-GPU (SURVEY.md §2.11), and its per-frame hot path
(model/tracker.py:182-204) runs the whole frame on one device.

What partitions how (all automatic under GSPMD once the image is sharded):
  - backbone convs / BN / relu / maxpool: pointwise or stencil along H ->
    local compute + halo exchange; channels and W stay unsharded so the
    MXU-facing layout (8,128) tiling is untouched on each shard.
  - target-model classify conv (disc_apply): a KxK conv — same story.
  - decoder TSE/RRB/CAB convs: same.
  - matmul resizes (ops/resize.py) and the PyrUp upsampler contract over the
    sharded H axis -> XLA lowers them to a local matmul on the shard plus a
    boundary exchange (the resize matrices are band-diagonal, so the
    "contraction over a sharded axis" touches at most the neighbouring
    shard's boundary rows).

The mesh may be 1-D ('spatial') for pure SP or 2-D ('data','spatial') for
DP x SP: batch over 'data', every frame split over 'spatial' — the layout for
serving N streams on N*K chips at K-chip per-frame latency.

Numerics: halo exchange moves data, it does not reassociate reductions; the
only cross-shard reductions are the band-diagonal resize contractions.
Partitioning does move XLA's fusion boundaries, which perturbs rounding on
scattered elements, so sharded-vs-single agrees to float rounding — measured
max ~1e-5 absolute on O(1) activations — not bitwise (pinned by
tests/test_spatial.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_spatial_mesh(n_spatial, n_data=1, devices=None):
    """('data', 'spatial') mesh over n_data*n_spatial devices.

    n_data=1 gives the pure-SP layout (the 'data' axis is size 1 and every
    sharding over it is a no-op), so one mesh constructor serves both."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def spatial_image_sharding(mesh):
    """(B, H, W, C) images: batch over 'data' (when the mesh has that axis —
    a user-built 1-D ('spatial',) mesh is fine too), height over 'spatial'."""
    batch_axis = "data" if "data" in mesh.axis_names else None
    return NamedSharding(mesh, P(batch_axis, "spatial"))


def make_spatial_frame_step(cfg, mesh, dtype=jnp.float32):
    """Jit the per-frame hot path (backbone pyramid -> target-model classify
    -> decoder refinement -> sigmoid; the fn of __graft_entry__.entry and of
    Tracker.track's inner loop, reference model/tracker.py:182-204) with the
    image and every activation sharded along H over the mesh's 'spatial'
    axis and all params replicated.

    :param cfg:   TrackerConfig (layers / arch / disc layer)
    :param mesh:  a make_spatial_mesh() mesh (axes 'data','spatial')
    :param dtype: backbone compute dtype (bfloat16 on TPU for 2x MXU rate)
    :return: fn(backbone, refiner, disc_params, image) -> (B, H, W, 1)
             mask probabilities, image (B, H, W, 3) raw 0-255
    """
    from ..models.resnet import extract_features
    from ..models.seg_network import seg_network_apply
    from ..models.discriminator import disc_apply

    layers = cfg.refnet_layers
    arch = cfg.feature_extractor

    def fn(backbone, refiner, disc, image):
        im_size = image.shape[1:3]
        feats = extract_features(backbone, image, arch, output_layers=layers,
                                 dtype=dtype)
        scores, _ = disc_apply(disc, feats[cfg.disc.layer])
        logits = seg_network_apply(refiner, scores, feats, im_size,
                                   layers=layers)
        return jax.nn.sigmoid(logits)

    repl = NamedSharding(mesh, P())
    img_sh = spatial_image_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, repl, repl, img_sh),
                   out_shardings=img_sh)


def make_spatial_extract(arch, mesh, output_layers=None, dtype=jnp.float32):
    """Spatially-sharded backbone extraction alone — the single biggest
    device cost of a tracked sequence (~73 ms of a 65-frame rn101 pass, see
    CLAUDE.md trace). Conv/BN/pool only — no cross-shard reductions at all;
    matches single-device to float rounding (see module docstring).

    :return: fn(backbone, images) -> {layer: (B, h, w, c)}, images sharded
             (batch over 'data', H over 'spatial'), features likewise
    """
    from ..models.resnet import extract_features

    def fn(backbone, images):
        return extract_features(backbone, images, arch,
                                output_layers=output_layers, dtype=dtype)

    repl = NamedSharding(mesh, P())
    img_sh = spatial_image_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, img_sh), out_shardings=img_sh)
