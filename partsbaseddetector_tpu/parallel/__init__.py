"""Multi-chip scaling: meshes, batched/sharded detection, sharded
training steps."""

from .mesh import batched_detect_fn, make_mesh, sharded_train_step
from .distributed import (
    distributed_batched_detect_fn,
    distributed_train_step,
    initialize_distributed,
    make_global_mesh,
)
