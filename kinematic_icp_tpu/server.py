"""Host-side odometry server: the L2 glue layer, ROS-free.

TPU-native replacement for the reference ``LidarOdometryServer``
(/root/reference/ros/src/kinematic_icp_ros/server/LidarOdometryServer.cpp):
instead of ROS messages/tf it consumes plain numpy arrays from any ingestion
source (mcap reader, synthetic generator, live feed), handles the
stationary-skip gate, pads variable-length scans into static shape buckets
(one jit specialization per bucket), tracks stamped poses, and computes the
published twist.  Heavy state (map) lives on device; only the 4x4 pose is
mirrored to host per frame.
"""

from __future__ import annotations

import math
import warnings

import jax.numpy as jnp
import numpy as np

from .config import Config, ServerConfig
from .models import pipeline
from .oracle import reference as _ref  # float64 SE(3) helpers for host math


def next_bucket(n: int, max_points: int, min_bucket: int = 1024) -> int:
    """Smallest power-of-two >= n (clamped to [min_bucket, max_points])."""
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, max_points)


class LidarOdometryServer:
    """Stateful odometry service over the jitted pipeline step.

    Mirrors the reference server's behavior:
      * lazy pose initialization from an externally supplied initial pose
        (the tf ``odom -> base`` seed, LidarOdometryServer.cpp:160-184),
      * per-frame stationary gate ``|log(delta)| > 1e-3`` (cpp:202),
      * twist = log(last^-1 new)/dt (cpp:210-214),
      * ``set_pose`` service that re-seeds the pose and clears map+threshold.
    """

    def __init__(self, config: Config | None = None,
                 server_config: ServerConfig | None = None,
                 extrinsic=None, initial_pose=None, dtype=jnp.float32):
        from .utils.compilation_cache import enable_compilation_cache
        enable_compilation_cache()
        self.config = config or Config()
        self.server_config = server_config or ServerConfig()
        self.extrinsic = np.eye(4) if extrinsic is None else np.asarray(
            extrinsic, np.float64)
        self.dtype = dtype
        self.state = pipeline.init_state(self.config, dtype, initial_pose)
        self._steps = {}
        self.last_stamp: float | None = None
        self.poses_with_stamps: list[tuple[float, np.ndarray]] = []
        self.frames_registered = 0
        self.frames_skipped = 0
        #: data-loss counters — the reference's dynamic containers drop
        #: nothing (README.md:79), so every drop is counted and warned once:
        #: raw points truncated past max_points, downsample/source voxels
        #: past capacity, map-insert bucket overflows.
        self.overflow_stats = {"points_truncated": 0,
                               "downsample_dropped": 0,
                               "source_dropped": 0,
                               "insert_failed": 0}
        self._overflow_warned = False
        #: device-side overflow results of not-yet-drained non-blocking
        #: frames (see register_frame(blocking=False) / drain())
        self._pending_overflow: list = []
        # message-interface state (lazy init like LidarOdometryServer.cpp:160)
        self._initialized = initial_pose is not None or extrinsic is not None
        self._stamps_handler = None

    # ------------------------------------------------------------------
    @property
    def pose(self) -> np.ndarray:
        return np.asarray(self.state.pose, np.float64)

    def set_pose(self, pose):
        """Re-seed pose; clears map and threshold (KinematicICP.hpp:86-90)."""
        self.state = pipeline.set_pose(self.state, jnp.asarray(
            np.asarray(pose, np.float64), dtype=self.dtype), self.config)

    def local_map_pointcloud(self) -> np.ndarray:
        from .ops import hashmap
        pts, mask = hashmap.pointcloud(self.state.map, self.config.voxel_size)
        arr = np.stack([np.asarray(pts.x), np.asarray(pts.y),
                        np.asarray(pts.z)], axis=-1)
        return arr[np.asarray(mask)]

    # ------------------------------------------------------------------
    def _warn_overflow(self, msg: str):
        """Warn once per server (counters in ``overflow_stats`` keep the
        full tally).  The reference drops nothing (README.md:79), so data
        loss must never be silent."""
        if not self._overflow_warned:
            warnings.warn(f"kinematic_icp_tpu data loss: {msg}",
                          RuntimeWarning, stacklevel=3)
            self._overflow_warned = True

    def _step_for(self, bucket: int):
        if bucket not in self._steps:
            cfg = self.config.replace(max_points=bucket)
            self._steps[bucket] = pipeline.make_step(cfg, donate=True)
        return self._steps[bucket]

    def register_frame(self, points, timestamps=None, relative_odometry=None,
                       stamp: float | None = None, blocking: bool = True):
        """Process one scan.

        Args:
          points: (N, 3) float array, lidar frame.
          timestamps: optional (N,) per-point times normalized to [0, 1]
            (missing -> deskew disabled for this frame, like the reference).
          relative_odometry: (4, 4) wheel odometry delta in the base frame
            (identity if unavailable).
          stamp: scan end timestamp in seconds (for twist & TUM output).
          blocking: True (default) returns only after the device finished
            the frame and mirrors pose/overflow to host — the reference's
            synchronous per-message shape (online_node.cpp:40-67).  False
            is the pipelined streaming mode: the frame is ENQUEUED (JAX
            async dispatch — host padding + transfer + dispatch only,
            no device->host sync), the returned ``pose`` is a device
            array whose materialization blocks until ready, ``twist`` is
            None, and overflow accounting is deferred to ``drain()``
            (totals stay exact; the capacity warning fires at drain time
            instead of mid-stream).  On a remote/tunnel-attached device
            the sync round trip dominates per-frame latency, so the
            non-blocking mode recovers device-rate throughput while
            frame k+1's host work overlaps frame k's compute; call
            ``drain()`` (or read ``pose`` / ``overflow_stats`` via
            ``drain``) at any sync point.

        Returns dict with pose, twist (6,) or None, registered: bool.
        """
        rel = (np.eye(4) if relative_odometry is None
               else np.asarray(relative_odometry, np.float64))
        # The pre-step pose is only needed for the twist (blocking mode);
        # reading it in streaming mode would force a device sync per frame.
        last_pose = self.pose if blocking else None

        # Stationary gate (LidarOdometryServer.cpp:202).
        gate = float(np.linalg.norm(_ref.se3_log(rel)))
        registered = False
        if gate > self.server_config.stationary_gate:
            points = np.asarray(points, np.float32).reshape(-1, 3)
            n = len(points)
            bucket = next_bucket(max(n, 1), self.config.max_points)
            npts = min(n, bucket)
            if npts < n:
                self.overflow_stats["points_truncated"] += n - npts
                self._warn_overflow(
                    f"scan has {n} points > Config.max_points="
                    f"{self.config.max_points}; {n - npts} dropped")
            pad_pts = np.zeros((bucket, 3), np.float32)
            pad_pts[:npts] = points[:npts]
            pad_ts = np.zeros((bucket,), np.float32)
            has_ts = timestamps is not None and len(timestamps) == n
            if has_ts:
                pad_ts[:npts] = np.asarray(timestamps, np.float32)[:npts]
            mask = np.arange(bucket) < npts

            step = self._step_for(bucket)
            self.state, out = step(
                self.state, jnp.asarray(pad_pts), jnp.asarray(pad_ts),
                jnp.asarray(mask), jnp.bool_(has_ts),
                jnp.asarray(self.extrinsic.astype(np.float32)),
                jnp.asarray(rel.astype(np.float32)))
            self.frames_registered += 1
            registered = True
            if blocking:
                self._account_overflow(np.asarray(out.overflow))
            else:
                # Deferred: keep the (3,) device array; drain() stacks and
                # syncs them in ONE transfer.  Totals are exact either way.
                self._pending_overflow.append(out.overflow)
        else:
            self.frames_skipped += 1

        # Streaming mode keeps the pose on device; .copy() gives it a
        # buffer independent of the donated state (the next step would
        # otherwise delete it) without any host sync.
        new_pose = self.pose if blocking else self.state.pose.copy()
        twist = None
        if blocking and stamp is not None and self.last_stamp is not None:
            dt = stamp - self.last_stamp
            if dt > 0:
                twist = _ref.se3_log(np.linalg.inv(last_pose) @ new_pose) / dt
        if stamp is not None:
            self.last_stamp = stamp
            self.poses_with_stamps.append((stamp, new_pose))
        return {"pose": new_pose, "twist": twist, "registered": registered}

    def drain(self):
        """Synchronize all in-flight non-blocking frames.

        Blocks until every enqueued frame finished on device, folds the
        deferred overflow counters into ``overflow_stats`` (one stacked
        transfer), and materializes any device poses recorded in
        ``poses_with_stamps``.  Idempotent; a no-op after blocking calls.
        """
        if self._pending_overflow:
            ovf = np.asarray(jnp.stack(self._pending_overflow))
            self._pending_overflow.clear()
            self._account_overflow(ovf.sum(axis=0))
        self.poses_with_stamps = [
            (s, p if isinstance(p, np.ndarray)
             else np.asarray(p, np.float64))
            for s, p in self.poses_with_stamps]

    def _account_overflow(self, ovf):
        if ovf.any():
            self.overflow_stats["downsample_dropped"] += int(ovf[0])
            self.overflow_stats["source_dropped"] += int(ovf[1])
            self.overflow_stats["insert_failed"] += int(ovf[2])
            self._warn_overflow(
                f"capacity overflow (downsample/source/insert voxels "
                f"dropped: {np.asarray(ovf).tolist()}); raise "
                f"Config.max_downsampled/max_source/map_capacity")

    # ------------------------------------------------------------------
    # Message-level interface (the full L2 behavior of the reference
    # server: lazy tf init, timestamp handling, odometry delta lookup).
    # ------------------------------------------------------------------
    def register_message(self, msg, tf_buffer):
        """Process one PointCloud2 against a TransformBuffer.

        Mirrors LidarOdometryServer::RegisterFrame (cpp:186-218): lazy
        init seeds the pose from wheel_odom->base and caches the
        base->lidar extrinsic; per frame, timestamps are processed, the
        wheel-odometry delta between scan stamps is looked up, and the
        scan is registered.  Returns the register_frame result dict (or
        None while initialization is pending).
        """
        from .utils.io.timestamps import TimeStampHandler

        if self._stamps_handler is None:
            self._stamps_handler = TimeStampHandler()
        cfg = self.server_config
        if not self._initialized:
            if not (tf_buffer.frame_exists(cfg.wheel_odom_frame)
                    and tf_buffer.frame_exists(cfg.base_frame)
                    and tf_buffer.frame_exists(msg.header.frame_id)):
                return None  # wait for tf, like cpp:141-145
            stamp = msg.header.stamp.to_sec()
            seed = tf_buffer.lookup_transform(
                cfg.wheel_odom_frame, cfg.base_frame, stamp)
            self.set_pose(seed)
            self.extrinsic = tf_buffer.lookup_transform(
                cfg.base_frame, msg.header.frame_id, stamp)
            self._stamps_handler.last_processed_stamp = stamp
            self._initialized = True

        begin, end, norm_ts = self._stamps_handler.process_timestamps(msg)
        delta = tf_buffer.lookup_delta_transform(
            cfg.base_frame, begin, end, cfg.wheel_odom_frame)
        return self.register_frame(msg.xyz(), norm_ts, delta, stamp=end)

    def make_odometry_message(self, result, stamp: float):
        """nav_msgs/Odometry with the parameterized fixed covariance
        (PublishOdometryMsg parity, LidarOdometryServer.cpp:144-157,220-238).
        """
        from scipy.spatial.transform import Rotation

        from .utils.io.messages import Header, Odometry, Time

        cfg = self.server_config
        pose = result["pose"]
        cov = np.zeros(36)
        cov[0] = cov[7] = cfg.position_covariance
        cov[35] = cfg.orientation_covariance
        twist = result.get("twist")
        msg = Odometry(
            header=Header(Time.from_sec(stamp), cfg.lidar_odom_frame),
            child_frame_id=cfg.base_frame,
            position=pose[:3, 3].copy(),
            orientation=Rotation.from_matrix(pose[:3, :3]).as_quat(),
            pose_covariance=cov,
            twist_linear=(np.zeros(3) if twist is None else twist[:3]),
            twist_angular=(np.zeros(3) if twist is None else twist[3:]),
            twist_covariance=cov.copy())
        return msg

    def make_tf_message(self, result, stamp: float):
        """The odometry tf edge, optionally inverted to satisfy tf's
        single-parent rule (LidarOdometryServer.cpp:105-123,130-142)."""
        from .utils.io.messages import TFMessage, TransformStamped

        cfg = self.server_config
        pose = result["pose"]
        if cfg.invert_odom_tf:
            t = TransformStamped.from_matrix(
                np.linalg.inv(pose), stamp, cfg.base_frame,
                cfg.lidar_odom_frame)
        else:
            t = TransformStamped.from_matrix(
                pose, stamp, cfg.lidar_odom_frame, cfg.base_frame)
        return TFMessage([t])

    # ------------------------------------------------------------------
    def write_tum(self, path):
        from .utils.io.tum import write_tum
        self.drain()
        write_tum(path, self.poses_with_stamps)
