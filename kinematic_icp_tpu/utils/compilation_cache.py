"""Persistent XLA compilation cache management.

The full odometry step is a large fused program (sort + hash probing +
GN while_loop); cold XLA compiles can take tens of seconds at production map
capacities.  Enabling JAX's persistent compilation cache makes every
subsequent process start in ~1 s.  Called automatically by the server, the
offline runner, and the benchmarks; opt out with
``KINEMATIC_ICP_TPU_NO_COMPILATION_CACHE=1``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "kinematic_icp_tpu", "xla")

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("KINEMATIC_ICP_TPU_NO_COMPILATION_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get(
        "KINEMATIC_ICP_TPU_COMPILATION_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _enabled = True
