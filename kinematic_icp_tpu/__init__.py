"""kinematic_icp_tpu — a TPU-native LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
PRBonn/kinematic-icp: kinematically-constrained (unicycle model) point-to-point
ICP on top of a device-resident sparse voxel local map, with batched
multi-sequence and multi-chip sharded execution.
"""

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some site hooks (e.g. remote-TPU PJRT plugins) re-pin the platform at
    # interpreter startup, silently overriding the JAX_PLATFORMS env var.
    # Re-assert the user's choice via jax.config (a no-op when they agree).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from .config import Config, ServerConfig, load_yaml_config

__version__ = "0.1.0"

__all__ = ["Config", "ServerConfig", "load_yaml_config", "__version__"]
