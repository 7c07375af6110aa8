"""Data-parallel training step over a jax.sharding.Mesh.

Refiner/backbone/optimizer state are replicated; the batch axis (samples with
their per-sample frozen target models) is sharded over the 'data' mesh axis.
jit + GSPMD insert the gradient all-reduce over ICI; BatchNorm statistics are
computed over the global batch (the mean/var reductions span the sharded
axis), i.e. sync-BN without any explicit collective code."""
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def make_sharded_train_step(train_step_fn, mesh, tx):
    """Wrap a TrainerModel train step with explicit shardings.

    train_step_fn(refiner, opt_state, backbone, disc_batch, images, labels,
                  mask, tx)
      with images/labels shaped (T, B, ...), disc_batch and the (B,) sample
      validity mask batched on axis 0.

    :return: jitted fn(refiner, opt_state, backbone, disc_batch, images,
                       labels, mask)
    """
    repl = NamedSharding(mesh, P())
    disc_sh = NamedSharding(mesh, P("data"))          # (B, ...) target models
    frames_sh = NamedSharding(mesh, P(None, "data"))  # (T, B, H, W, C)

    def step(refiner, opt_state, backbone, disc_batch, images, labels, mask):
        return train_step_fn(refiner, opt_state, backbone, disc_batch,
                             images, labels, mask, tx)

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, disc_sh, frames_sh, frames_sh, disc_sh),
        out_shardings=(repl, repl, repl),
    )
