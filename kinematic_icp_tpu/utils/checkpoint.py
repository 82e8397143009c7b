"""Odometry state snapshot / restore.

The reference has no checkpointing (SURVEY.md section 5.4 — its closest
analogue is the destructive ``set_pose`` reset).  Here the complete device
state (pose, packed voxel map, threshold accumulators) round-trips through a
single compressed npz, making long sequences resumable and serving
deployments restartable.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

import jax.numpy as jnp

from ..config import Config
from ..models.pipeline import OdometryState
from ..ops import hashmap, threshold

_FORMAT_VERSION = 3  # v3: bucket_of hash changed (additive+murmur); v2 tables
# have every voxel in a different bucket and must not load silently


def save_state(path, state: OdometryState, config: Config | None = None,
               extra: dict | None = None):
    """Write the full odometry state (and optionally its config) to npz."""
    meta = {"format_version": _FORMAT_VERSION,
            "bucket_slots": state.map.bucket_slots}
    if config is not None:
        meta["config"] = dataclasses.asdict(config)
    if extra:
        meta["extra"] = extra
    np.savez_compressed(
        path,
        pose=np.asarray(state.pose),
        map_table=np.asarray(state.map.table),
        threshold_sse=np.asarray(state.threshold.odom_sse),
        threshold_n=np.asarray(state.threshold.num_samples),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_state(path):
    """Returns (OdometryState, meta dict)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported checkpoint version {meta.get('format_version')}")
        state = OdometryState(
            pose=jnp.asarray(z["pose"]),
            map=hashmap.MapState(
                table=jnp.asarray(z["map_table"]),
                bucket_slots=int(meta["bucket_slots"])),
            threshold=threshold.ThresholdState(
                odom_sse=jnp.asarray(z["threshold_sse"]),
                num_samples=jnp.asarray(z["threshold_n"])),
        )
    return state, meta


def load_config(meta: dict) -> Config | None:
    if "config" not in meta:
        return None
    return Config(**meta["config"])
