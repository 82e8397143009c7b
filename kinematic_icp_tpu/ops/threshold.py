"""Adaptive correspondence threshold (functional form).

TPU-native reimplementation of the reference ``CorrespondenceThreshold``
(/root/reference/cpp/kinematic_icp/correspondence_threshold/
CorrespondenceThreshold.{hpp,cpp}).  The C++ class's two mutable doubles
(``odom_sse_``, ``num_samples_``) become an explicit state array threaded
through the jitted step function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import se3


class ThresholdState(NamedTuple):
    odom_sse: jnp.ndarray   # scalar
    num_samples: jnp.ndarray  # scalar


def init_state(dtype=jnp.float32) -> ThresholdState:
    """Reset state (reference CorrespondenceThreshold.hpp:40-43)."""
    return ThresholdState(
        odom_sse=jnp.zeros((), dtype=dtype),
        num_samples=jnp.asarray(1e-8, dtype=dtype),
    )


def compute_threshold(state: ThresholdState, *, map_discretization_error: float,
                      use_adaptive: bool, fixed_threshold: float):
    """tau = 3 * (sigma_map + sigma_odom)  (CorrespondenceThreshold.cpp:27-35).

    ``use_adaptive`` / the sigmas are static config; state is traced.
    """
    if not use_adaptive:
        return jnp.asarray(fixed_threshold, dtype=state.odom_sse.dtype)
    sigma_odom = jnp.sqrt(state.odom_sse / state.num_samples)
    sigma_map = map_discretization_error
    return 3.0 * (sigma_map + sigma_odom)


def odometry_error_in_point_space(pose, max_range: float):
    """|t| + 2 * max_range * sin(theta/2)  (CorrespondenceThreshold.cpp:7-12)."""
    theta = se3.rotation_angle(pose)
    delta_rot = 2.0 * max_range * jnp.sin(theta / 2.0)
    delta_trans = jnp.linalg.norm(pose[..., :3, 3], axis=-1)
    return delta_trans + delta_rot


def update_odometry_error(state: ThresholdState, odometry_error_pose, *,
                          max_range: float, use_adaptive: bool) -> ThresholdState:
    """Accumulate squared odometry error (CorrespondenceThreshold.cpp:37-44)."""
    if not use_adaptive:
        return state
    err = odometry_error_in_point_space(odometry_error_pose, max_range)
    return update_odometry_error_scalar(state, err, use_adaptive=True)


def update_odometry_error_scalar(state: ThresholdState, err, *,
                                 use_adaptive: bool) -> ThresholdState:
    """``update_odometry_error`` given the precomputed point-space error
    (e.g. from the fused GN kernel, which has both poses in registers)."""
    if not use_adaptive:
        return state
    return ThresholdState(
        odom_sse=state.odom_sse + err * err,
        num_samples=state.num_samples + 1.0,
    )
