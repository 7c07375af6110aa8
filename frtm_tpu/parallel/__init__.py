from .mesh import make_mesh, replicated, batch_sharded
from .train_step import make_sharded_train_step
from .multi_sequence import ShardedSequenceTracker

__all__ = ["make_mesh", "replicated", "batch_sharded", "make_sharded_train_step",
           "ShardedSequenceTracker"]
