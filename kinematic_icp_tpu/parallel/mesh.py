"""Device mesh construction for multi-chip / multi-host odometry.

The framework's two parallel axes (SURVEY.md section 2e / 7):
  * ``data`` — independent sequences (embarrassingly parallel batch DP),
  * ``map``  — voxel hash-table slots sharded across chips, with psum'd
    2-DoF normal equations and the packed-key pmin NN combine.

The reference is single-process shared-memory (TBB); its only "axis" is
threads over points.  Here intra-frame point parallelism is the VPU's job,
and the mesh scales sequences and map capacity across chips/hosts.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, map: int = 1, devices=None) -> Mesh:
    """Build a (data, map) mesh over the available devices.

    ``data=None`` uses all remaining devices on the data axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % map == 0, f"{n} devices not divisible by map={map}"
        data = n // map
    assert data * map == n, f"mesh {data}x{map} != {n} devices"
    return Mesh(devices.reshape(data, map), ("data", "map"))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (jax.distributed) — call once per host process.

    On a TPU pod slice the arguments auto-detect; on CPU test fixtures pass
    them explicitly.  The reference has no distributed runtime (SURVEY.md
    section 5.8); this is the TPU-native replacement.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
