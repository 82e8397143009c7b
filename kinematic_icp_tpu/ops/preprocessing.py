"""Scan preprocessing: motion deskew + range filtering.

TPU-native equivalent of ``kiss_icp::Preprocessor`` (KISS-ICP v1.2.0, used at
/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.cpp:56-57).  The
reference deskews with per-point constant-velocity pose interpolation along
``omega = log(relative_motion)``: with normalized per-point times
``tau in [0, 1]`` each point is mapped by ``exp((tau - 1) * omega)`` (unwarp to
the scan-end pose), then range-filters ``min_range < |p| < max_range`` on the
deskewed coordinates.  TBB's per-point parallel_for becomes one fused batched
XLA computation; the dynamic ``std::vector`` output becomes a validity mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def deskew(points, timestamps, relative_motion, enable):
    """Constant-velocity motion compensation, anchored at scan end.

    Args:
      points: (N, 3) raw points in the lidar frame.
      timestamps: (N,) per-point times normalized to [0, 1].
      relative_motion: (4, 4) frame-to-frame motion *in the lidar frame*
        (the pipeline conjugates the base-frame odometry by the extrinsic,
        reference KinematicICP.cpp:53-55).
      enable: scalar bool — deskewing active (config flag AND timestamps
        present; reference disables when the timestamp field is missing).

    Returns: (N, 3) deskewed points.
    """
    omega = se3.se3_log(relative_motion)  # (6,)
    scale = jnp.where(enable, timestamps - 1.0, jnp.zeros_like(timestamps))
    per_point_motion = se3.se3_exp(scale[:, None] * omega[None, :])  # (N, 4, 4)
    moved = (per_point_motion[:, :3, :3] @ points[..., None])[..., 0] \
        + per_point_motion[:, :3, 3]
    return moved


def range_filter_mask(points, mask, min_range: float, max_range: float):
    """Keep ``min_range < |p| < max_range`` (strict, like KISS-ICP).

    NaN coordinates fail both comparisons and are dropped, matching C++
    semantics where NaN norms fail the predicate.
    """
    r = jnp.linalg.norm(points, axis=-1)
    keep = (r < max_range) & (r > min_range)
    return mask & keep


def preprocess(points, timestamps, mask, relative_motion_in_lidar, *,
               min_range: float, max_range: float, deskew_enabled,
               has_timestamps):
    """Full Preprocessor::Preprocess equivalent.

    Returns (deskewed_points, mask) with the range filter applied to the
    deskewed coordinates (KISS-ICP v1.2.0 order: deskew first, then filter).
    """
    enable = jnp.logical_and(deskew_enabled, has_timestamps)
    out = deskew(points, timestamps, relative_motion_in_lidar, enable)
    new_mask = range_filter_mask(out, mask, min_range, max_range)
    return out, new_mask
