"""Voxel-grid utilities: point->voxel coords, spatial hashing, downsampling.

TPU-native equivalent of ``kiss_icp::VoxelDownsample`` / ``PointToVoxel``
(KISS-ICP v1.2.0, used at /root/reference/cpp/kinematic_icp/pipeline/
KinematicICP.cpp:38-44).  The robin-map based "keep first point per voxel"
becomes a lexicographic multi-key sort + run-head compaction under static
shapes: invalid/padded points carry a sentinel voxel key that sorts last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: sentinel voxel coordinate for invalid/padded points (sorts after any real
#: coordinate and never equals a real voxel of an in-range point)
SENTINEL = jnp.iinfo(jnp.int32).max

# KISS-ICP spatial hash constants (VoxelHashMap.cpp, v1.2.0).  Plain ints so
# importing this module does not initialize a JAX backend.
_HX = 73856093
_HY = 19349669
_HZ = 83492791


def voxel_coords(points, voxel_size: float):
    """floor(p / voxel_size) as int32, per KISS-ICP PointToVoxel."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def spatial_hash(coords):
    """(..., 3) int32 voxel coords -> (...,) uint32 hash (KISS-ICP constants)."""
    c = coords.astype(jnp.uint32)
    return ((c[..., 0] * jnp.uint32(_HX))
            ^ (c[..., 1] * jnp.uint32(_HY))
            ^ (c[..., 2] * jnp.uint32(_HZ)))


def voxel_downsample(points, mask, voxel_size: float, out_size: int):
    """Keep the first (in input order) point of each occupied voxel.

    Args:
      points: (N, 3) float points (padded).
      mask: (N,) bool validity.
      voxel_size: grid pitch.
      out_size: static output capacity.

    Returns:
      (out_points (out_size, 3), out_mask (out_size,)).  Output order is
      voxel-lexicographic (the reference's robin_map iteration order is
      arbitrary, so downstream consumers cannot depend on order anyway).
      Voxels beyond ``out_size`` are dropped (choose capacities generously).
    """
    n = points.shape[0]
    coords = voxel_coords(points, voxel_size)
    coords = jnp.where(mask[:, None], coords, SENTINEL)

    # Lexicographic stable sort by (kx, ky, kz); stability keeps the first
    # input point at the head of each equal-key run ("first point wins").
    kx, ky, kz = coords[:, 0], coords[:, 1], coords[:, 2]
    kx, ky, kz, px, py, pz = jax.lax.sort(
        (kx, ky, kz, points[:, 0], points[:, 1], points[:, 2]),
        num_keys=3, is_stable=True)
    sorted_coords = jnp.stack([kx, ky, kz], axis=-1)
    sorted_points = jnp.stack([px, py, pz], axis=-1)

    valid_sorted = kx != SENTINEL
    prev = jnp.roll(sorted_coords, 1, axis=0)
    head = jnp.any(sorted_coords != prev, axis=-1)
    head = head.at[0].set(True)
    head = head & valid_sorted

    # Compact heads into the output buffer.
    pos = jnp.cumsum(head) - 1  # output index per head
    dest = jnp.where(head, pos, out_size)  # out-of-range => dropped
    out_points = jnp.zeros((out_size, 3), dtype=points.dtype)
    out_points = out_points.at[dest].set(sorted_points, mode="drop")
    num_kept = jnp.minimum(jnp.sum(head), out_size)
    out_mask = jnp.arange(out_size) < num_kept
    return out_points, out_mask


def double_downsample(points, mask, voxel_size: float, *,
                      max_downsampled: int, max_source: int):
    """KISS-ICP's double downsample (reference KinematicICP.cpp:38-44).

    Returns (source, source_mask, frame_downsample, frame_downsample_mask):
    frame_downsample at 0.5 * voxel_size feeds the map update; source at
    1.5 * voxel_size (of frame_downsample) feeds the ICP.
    """
    frame_ds, frame_ds_mask = voxel_downsample(
        points, mask, voxel_size * 0.5, max_downsampled)
    source, source_mask = voxel_downsample(
        frame_ds, frame_ds_mask, voxel_size * 1.5, max_source)
    return source, source_mask, frame_ds, frame_ds_mask
