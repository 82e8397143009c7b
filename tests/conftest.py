"""Test environment: force an 8-device virtual CPU mesh before jax init.

Multi-chip sharding logic is validated on a virtual CPU mesh, the standard
way to test pod-slice code without TPU hardware.  The ambient environment may
pin JAX_PLATFORMS to a TPU plugin (axon); unit tests always run on CPU — we
hard-override the env var, and also update jax.config in case another pytest
plugin imported jax before this conftest ran (the backend is only committed on
first use, so this is still effective).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinematic_icp_tpu.utils.compilation_cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()
