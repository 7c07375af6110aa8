from .mesh import make_mesh, replicated, batch_sharded
from .train_step import make_sharded_train_step
from .multi_sequence import ShardedSequenceTracker
from .spatial import (make_spatial_mesh, make_spatial_frame_step,
                      make_spatial_extract)

__all__ = ["make_mesh", "replicated", "batch_sharded", "make_sharded_train_step",
           "ShardedSequenceTracker", "make_spatial_mesh",
           "make_spatial_frame_step", "make_spatial_extract"]
