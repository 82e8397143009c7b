"""The per-frame odometry pipeline (TPU-native ``KinematicICP``).

Functional equivalent of ``kinematic_icp::pipeline::KinematicICP``
(/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.{hpp,cpp}): the C++
class's mutable members (pose, voxel map, threshold accumulators) become an
explicit ``OdometryState`` pytree, and ``RegisterFrame`` becomes a pure
function ``register_frame(state, inputs) -> (state', outputs)`` that jits to
one XLA program per (Config, point-capacity) pair.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import hashmap, preprocessing, registration, se3, threshold, voxel
from ..ops.points import P3, transform


class OdometryState(NamedTuple):
    pose: jnp.ndarray                 # (4, 4) — last_pose_
    map: hashmap.MapState             # local_map_
    threshold: threshold.ThresholdState  # correspondence_threshold_


class FrameOutputs(NamedTuple):
    """Per-frame outputs, mirroring the reference's return + debug topics."""
    frame: P3                   # (N,) planes — deskewed frame in base coords
    frame_mask: jnp.ndarray     # (N,)
    source: P3                  # (S,) planes — ICP keypoints (base frame)
    source_mask: jnp.ndarray    # (S,)
    pose: jnp.ndarray           # (4, 4) new pose
    debug: registration.RegistrationDebug
    #: (3,) int32 capacity-overflow counters [downsample voxels dropped,
    #: source voxels dropped, map insert bucket-overflow voxels].  The
    #: reference's dynamic containers drop nothing (README.md:79), so any
    #: nonzero value means the static capacities are undersized — surfaced
    #: here instead of failing silently.
    overflow: jnp.ndarray


def init_state(config: Config, dtype=jnp.float32,
               initial_pose: jnp.ndarray | None = None) -> OdometryState:
    pose = (jnp.eye(4, dtype=dtype) if initial_pose is None
            else jnp.asarray(initial_pose, dtype=dtype))
    return OdometryState(
        pose=pose,
        map=hashmap.empty(config.map_capacity, config.max_points_per_voxel,
                          dtype, bucket_slots=config.max_probes),
        threshold=threshold.init_state(dtype),
    )


def set_pose(state: OdometryState, pose, config: Config) -> OdometryState:
    """SetPose: reset pose, clear map and threshold (KinematicICP.hpp:86-90)."""
    return OdometryState(
        pose=jnp.asarray(pose, dtype=state.pose.dtype),
        map=hashmap.clear(state.map),
        threshold=threshold.init_state(state.pose.dtype),
    )


def register_frame(state: OdometryState, points, timestamps, mask,
                   has_timestamps, lidar_to_base, relative_odometry,
                   config: Config, active=None,
                   rel_twist_in_lidar=None
                   ) -> tuple[OdometryState, FrameOutputs]:
    """One odometry step (KinematicICP.cpp:48-85).

    Args:
      state: current odometry state.
      points: (N, 3) raw scan in the lidar frame (padded).
      timestamps: (N,) per-point times normalized to [0, 1] (zeros if absent).
      mask: (N,) validity of the padded rows.
      has_timestamps: scalar bool — whether the timestamp field existed
        (missing field disables deskew, reference TimeStampHandler.cpp:51-54).
      lidar_to_base: (4, 4) static extrinsic.
      relative_odometry: (4, 4) wheel odometry delta in the base frame.
      config: static configuration (one jit specialization per value).
      active: optional scalar bool — the caller's stationary gate
        (LidarOdometryServer.cpp:202).  When False the returned state is
        byte-identical to the input.  Folding the gate in here lets the map
        update mask its writes instead of the caller selecting between two
        full map tables after the fact.
      rel_twist_in_lidar: optional precomputed (6,)
        ``se3_log(lidar_to_base^-1 @ relative_odometry @ lidar_to_base)``.
        The conjugation + matrix log are pose-independent per frame, so
        sequence runners hoist them out of the scan body (vectorized over
        all frames) — ~15 tiny fusions (~launch-bound) saved per frame.
    """
    dtype = state.pose.dtype
    # Host boundary: (N, 3) -> planar SoA once per frame.
    p = P3.from_array(points).astype(dtype)

    if config.deskew:
        if rel_twist_in_lidar is None:
            # Deskew happens in the lidar frame: conjugate the base-frame
            # odometry by the extrinsic (KinematicICP.cpp:53-55).
            ext_inv = se3.inverse(lidar_to_base)
            rel_odom_in_lidar = se3.compose44(
                se3.compose44(ext_inv, relative_odometry), lidar_to_base)
            rel_twist_in_lidar = se3.se3_log(rel_odom_in_lidar)
        frame, frame_mask = preprocessing.preprocess(
            p, timestamps, mask, None,
            min_range=config.min_range, max_range=config.max_range,
            deskew_enabled=True, has_timestamps=has_timestamps,
            twist=rel_twist_in_lidar)
    else:
        frame = p
        frame_mask = preprocessing.range_filter_mask(
            p, mask, config.min_range, config.max_range)

    # To base frame (KinematicICP.cpp:59).
    frame_in_base = transform(lidar_to_base, frame)

    # Double voxel downsample (KinematicICP.cpp:38-44, 61-62).
    source, source_mask, frame_ds, frame_ds_mask, ds_dropped = \
        voxel.double_downsample(
        frame_in_base, frame_mask, config.voxel_size,
        max_downsampled=config.max_downsampled, max_source=config.max_source,
        max_extent=2.0 * config.max_range,
        tiebreak=config.downsample_tiebreak)

    # Adaptive correspondence threshold tau (CorrespondenceThreshold.cpp:49-56).
    tau = threshold.compute_threshold(
        state.threshold,
        map_discretization_error=config.map_resolution(),
        use_adaptive=config.use_adaptive_threshold,
        fixed_threshold=config.fixed_threshold)

    # Kinematic ICP (Registration.cpp:151-190).
    new_pose, debug = registration.compute_robot_motion(
        state.map, source, source_mask, state.pose, relative_odometry, tau,
        voxel_size=config.voxel_size, max_probes=config.max_probes,
        max_num_iterations=config.max_num_iterations,
        convergence_criterion=config.convergence_criterion,
        use_adaptive_odometry_regularization=(
            config.use_adaptive_odometry_regularization),
        fixed_regularization=config.fixed_regularization,
        num_candidate_voxels=config.neighbor_candidates,
        exact_gn_reassociation=config.exact_gn_reassociation,
        exact_prune_candidates=config.exact_prune_candidates,
        gn_candidates_per_voxel=config.gn_candidates_per_voxel,
        gn_backend=config.gn_backend,
        threshold_max_range=config.max_range)

    if debug.odometry_error_pt is not None:
        # The fused kernel already computed the point-space error of
        # guess^-1 @ new_pose in registers (KinematicICP.cpp:75 +
        # CorrespondenceThreshold.cpp:37-44).
        new_threshold = threshold.update_odometry_error_scalar(
            state.threshold, debug.odometry_error_pt,
            use_adaptive=config.use_adaptive_threshold)
    else:
        # odometry_error = (last * rel_odom)^-1 * new (KinematicICP.cpp:75).
        prediction = se3.compose44(state.pose, relative_odometry)
        odometry_error = se3.compose44(se3.inverse(prediction), new_pose)
        new_threshold = threshold.update_odometry_error(
            state.threshold, odometry_error,
            max_range=config.max_range,
            use_adaptive=config.use_adaptive_threshold)

    new_map, insert_failed = hashmap.update(
        state.map, frame_ds, frame_ds_mask, new_pose,
        config.voxel_size, config.max_range, config.max_probes,
        enable=active, max_extent=2.0 * config.max_range,
        return_failed=True)

    if active is not None:
        new_pose = jnp.where(active, new_pose, state.pose)
        new_threshold = jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new_threshold,
            state.threshold)

    new_state = OdometryState(pose=new_pose, map=new_map, threshold=new_threshold)
    outputs = FrameOutputs(
        frame=frame_in_base, frame_mask=frame_mask,
        source=source, source_mask=source_mask,
        pose=new_pose, debug=debug,
        overflow=jnp.concatenate([ds_dropped,
                                  insert_failed[None]]).astype(jnp.int32))
    return new_state, outputs


@functools.lru_cache(maxsize=32)
def make_step(config: Config, donate: bool = True):
    """Build the jitted step function for a given static config.

    The state argument is donated so the (large) map buffers update in place.
    """
    base = functools.partial(register_frame, config=config)

    def fn(*args, **kwargs):
        # All matmuls in this pipeline are tiny (3x3 pose algebra, Nx3 point
        # transforms); on TPU the MXU's default bf16 passes would inject
        # centimetre-level coordinate noise, so force full fp32 precision.
        with jax.default_matmul_precision("highest"):
            return base(*args, **kwargs)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
