"""Multi-chip scaling: meshes, batched/sharded detection, sharded
training steps."""

from .mesh import batched_detect_fn, make_mesh, sharded_train_step
