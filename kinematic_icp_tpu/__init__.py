"""kinematic_icp_tpu — a TPU-native LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
PRBonn/kinematic-icp: kinematically-constrained (unicycle model) point-to-point
ICP on top of a device-resident sparse voxel local map, with batched
multi-sequence and multi-chip sharded execution.
"""

from .config import Config, ServerConfig, load_yaml_config

__version__ = "0.1.0"

__all__ = ["Config", "ServerConfig", "load_yaml_config", "__version__"]
