"""Device-mesh construction and sharding helpers.

The reference is strictly single-process/single-GPU (SURVEY.md §2.11 — no
torch.distributed anywhere), so everything here is new TPU capability. This
model family's natural parallelism is over samples/sequences/objects (the
per-frame temporal chain is sequential by construction): training is data
parallelism whose gradient all-reduce XLA inserts when params are replicated
and the batch is sharded; inference shards independent sequences across
chips. BatchNorm batch statistics become global (sync-BN) for free under
GSPMD since the mean/var reductions span the sharded batch axis."""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis_name="data"):
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh, batch_axis=0, axis_name="data"):
    """Shard the given positional axis over the mesh's data axis."""
    spec = [None] * batch_axis + [axis_name]
    return NamedSharding(mesh, P(*spec))
