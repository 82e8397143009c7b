"""Multi-chip execution: device meshes, batched DP, map-sharded steps."""

from .batched import BatchedOdometryRunner
from .mesh import initialize_distributed, make_mesh
from .sharded import (init_sharded_state, make_sharded_step,
                      sharded_register_frame)

__all__ = [
    "BatchedOdometryRunner", "init_sharded_state", "initialize_distributed",
    "make_mesh", "make_sharded_step", "sharded_register_frame",
]
