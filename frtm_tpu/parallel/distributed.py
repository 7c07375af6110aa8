"""Multi-host (multi-process) readiness — the next structural rung above the
single-process mesh layer (VERDICT r3 #8; the reference is strictly
single-GPU/single-process, SURVEY.md §2.11, so everything here is new
capability).

Architecture (the scaling-book recipe, applied to this model family):

  * INFERENCE scales by partitioning SEQUENCES across hosts: frames of one
    sequence form a sequential chain, but sequences are independent, so the
    right pod-scale design runs each host's ShardedSequenceTracker on its
    own addressable devices with a process-local slice of the dataset — no
    cross-host collectives at all, nothing rides DCN, scaling is exactly
    linear. `process_slice` computes the assignment.
  * TRAINING scales as data parallelism over the GLOBAL mesh: every process
    runs the same jitted train step over a mesh of jax.devices() (all
    hosts); each process feeds the batch rows its own devices own
    (`global_batch` wraps jax.make_array_from_process_local_data), and
    GSPMD inserts the gradient all-reduce — over ICI within a slice, DCN
    between slices — exactly as in the single-host DP path
    (parallel/train_step.py), which needs no changes.

Everything is guarded: on one process `init_distributed` is a no-op and
both helpers degrade to the single-host fast paths, so `--multihost` can
always be passed. A single machine cannot *execute* a multi-process run, so
the multi-process branches are exercised only structurally here (the
runbook in docs/MULTIHOST.md covers real-pod usage)."""
import os

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Guarded `jax.distributed.initialize`.

    Returns (process_id, num_processes). A run is multi-process when any of
    the explicit args or the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) say so, OR when the Cloud TPU pod
    runtime's own env marks a multi-worker slice (TPU_WORKER_HOSTNAMES
    lists several comma-separated workers — single-host boxes show one
    hostname) — in that case `initialize()` is called with no args and
    jax.distributed auto-discovers the coordinator from the TPU metadata.
    Otherwise this is a no-op that returns (0, 1) — the graceful
    single-host degrade VERDICT r3 #8 asks for.

    Failure scoping (ADVICE r4): when the run was EXPLICITLY declared
    multi-process (args or JAX_* env vars), an initialize() failure
    re-raises — degrading one worker of a real pod to (0, 1) would make it
    re-track the full dataset (process_slice keeps everything at n=1) and
    leave the other workers hung at their first collective. Only the
    heuristic pod_hint path (TPU metadata sniffing, no explicit intent)
    degrades to single-process with a warning."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = bool(coordinator or num_processes is not None
                    or process_id is not None)
    pod_hint = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if not explicit and not pod_hint:
        return 0, 1  # single host: nothing to initialize
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception as e:
        if explicit:  # a declared multi-process run must not silently fork
            raise
        import warnings  # heuristic hint on a lone box must not be fatal
        warnings.warn(f"jax.distributed.initialize failed ({e!r}); "
                      "continuing single-process")
        return 0, 1
    return jax.process_index(), jax.process_count()


def process_slice(n_items, process_id=None, num_processes=None):
    """Round-robin item assignment for embarrassingly-parallel work
    (inference sequences): item i belongs to process (i % num_processes).
    Round-robin rather than contiguous blocks so sorted-by-length datasets
    load-balance across hosts."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(range(pid, n_items, n))


def global_mesh(axis_name="data"):
    """1-D mesh over every device of every process (training)."""
    from .mesh import make_mesh
    return make_mesh(axis_name=axis_name)


def local_mesh(axis_name="data"):
    """1-D mesh over this process's addressable devices only (inference —
    each host tracks its own sequences; no cross-host program)."""
    from jax.sharding import Mesh
    return Mesh(np.array(jax.local_devices()), (axis_name,))


def global_batch(mesh, local_np, batch_axis=0):
    """Assemble a global batch-sharded jax.Array from this process's rows.

    Single process: a plain device_put with the batch axis sharded over the
    mesh (unchanged fast path). Multi-process: `local_np` holds only the
    rows this process's devices own (callers slice with `batch_rows`), and
    jax.make_array_from_process_local_data builds the global array without
    any cross-host transfer."""
    spec = P(*([None] * batch_axis + ["data"]))
    sharding = NamedSharding(mesh, spec)
    arr = np.asarray(local_np)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    global_shape = (arr.shape[:batch_axis]
                    + (arr.shape[batch_axis] * jax.process_count(),)
                    + arr.shape[batch_axis + 1:])
    return jax.make_array_from_process_local_data(sharding, arr, global_shape)


def batch_rows(batch_size, process_id=None, num_processes=None):
    """The contiguous row range of a (batch_size,)-leading global batch this
    process must materialize: NamedSharding(P('data')) over a process-major
    device order gives process p rows [p*b, (p+1)*b) with b = B/n."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    if batch_size % n:
        raise ValueError(f"global batch {batch_size} not divisible by "
                         f"{n} processes")
    b = batch_size // n
    return pid * b, (pid + 1) * b
