"""Tests: 2D mode end-to-end, online node, checkpointing, profiling, viz."""

import os

import numpy as np
import pytest

from kinematic_icp_tpu import Config, run_odometry
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.online import OnlineOdometryNode
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.checkpoint import load_config, load_state, save_state
from kinematic_icp_tpu.utils.evaluation import ate_rmse
from kinematic_icp_tpu.utils.io.mcap import McapReader
from kinematic_icp_tpu.utils.io.bag import decode_message
from kinematic_icp_tpu.utils.io.messages import LaserScan, PointCloud2, TFMessage
from kinematic_icp_tpu.utils.io.tum import read_tum
from kinematic_icp_tpu.utils.profiling import StageTimer
from kinematic_icp_tpu.utils.visualization import (voxel_grid_segments,
                                                   write_ply,
                                                   write_voxel_grid_ply)

NUM_FRAMES = 12


@pytest.fixture(scope="module")
def bag_with_2d(tmp_path_factory):
    d = tmp_path_factory.mktemp("bags2d")
    path = str(d / "dual.mcap")
    seq = synthetic.make_sequence(NUM_FRAMES)
    synthetic.write_sequence_to_mcap(seq, path, scan_2d_topic="/front_scan")
    return path, seq


class Test2DMode:
    def test_2d_offline_run(self, bag_with_2d, tmp_path):
        path, seq = bag_with_2d
        out = run_odometry.main([
            path, "--use-2d-lidar", "--lidar-topic", "/front_scan",
            "--output-dir", str(tmp_path), "--max-points", "4096",
            "--no-progress"])
        stamps, poses = read_tum(out)
        assert len(poses) == NUM_FRAMES
        # planar scans of the same world: should still track odometry-level
        gt = seq["gt_poses"][:len(poses)]
        ate = ate_rmse(gt, poses, align=False)
        dead = [np.eye(4)]
        for rel in seq["rel_odometry"][1:]:
            dead.append(dead[-1] @ rel)
        ate_dead = ate_rmse(seq["gt_poses"], dead, align=False)
        assert ate < max(0.08, 1.2 * ate_dead), (ate, ate_dead)


class TestOnlineNode:
    def test_stream_processing(self, bag_with_2d):
        path, seq = bag_with_2d
        cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                     map_capacity=1 << 14, max_range=60.0, deskew=True)
        outputs = []
        node = OnlineOdometryNode(
            cfg, use_2d_lidar=False,
            on_odometry=lambda o, t, r: outputs.append((o, t)))
        kinds = {"/tf": "tf", "/tf_static": "tf_static",
                 "/lidar_points": "pointcloud", "/front_scan": "laserscan"}
        with McapReader(path) as r:
            for raw in r.messages():
                kind = kinds.get(raw.channel.topic)
                if kind is None:
                    continue
                node.run([(kind, decode_message(raw))])
        assert node.server.frames_registered > 0
        assert len(outputs) == (node.server.frames_registered
                                + node.server.frames_skipped)
        odom, tf_msg = outputs[-1]
        assert odom.header.frame_id == "odom_lidar"
        assert np.all(np.isfinite(odom.position))
        # invert_odom_tf default: tf edge is base -> odom_lidar
        assert tf_msg.transforms[0].header.frame_id == "base_link"
        assert odom.pose_covariance[0] == 0.1


class TestStreamingServer:
    """register_frame(blocking=False) must be a pure scheduling change."""

    def test_nonblocking_matches_blocking(self):
        from kinematic_icp_tpu.server import LidarOdometryServer
        cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                     map_capacity=1 << 13, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(NUM_FRAMES)
        sb = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
        sn = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
        for i, (p, t) in enumerate(seq["frames"]):
            rb = sb.register_frame(p, t, seq["rel_odometry"][i],
                                   stamp=0.1 * (i + 1))
            rn = sn.register_frame(p, t, seq["rel_odometry"][i],
                                   stamp=0.1 * (i + 1), blocking=False)
            assert rn["registered"] == rb["registered"]
            assert rn["twist"] is None  # deferred in streaming mode
        sn.drain()
        # bitwise-equal trajectories: same jitted step, same inputs
        np.testing.assert_array_equal(
            np.asarray([p for _, p in sb.poses_with_stamps]),
            np.asarray([p for _, p in sn.poses_with_stamps]))
        assert all(isinstance(p, np.ndarray)
                   for _, p in sn.poses_with_stamps)
        assert sn.overflow_stats == sb.overflow_stats
        assert sn.frames_registered == sb.frames_registered
        sn.drain()  # idempotent
        assert sn.overflow_stats == sb.overflow_stats

    def test_mixed_blocking_streaming_stationary(self):
        """Interleaved blocking / streaming / stationary frames must give
        the same stamped trajectory as pure blocking mode."""
        from kinematic_icp_tpu.server import LidarOdometryServer
        cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                     map_capacity=1 << 13, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(NUM_FRAMES)
        rels = list(seq["rel_odometry"])
        rels[3] = np.eye(4)   # stationary mid-stream
        rels[7] = np.eye(4)   # stationary right after a blocking frame
        sb = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
        sn = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"],
                                 stream_chunk=4)
        for i, (p, t) in enumerate(seq["frames"]):
            sb.register_frame(p, t, rels[i], stamp=0.1 * (i + 1))
            # frames 5-6 blocking (forces a mid-stream flush + settles
            # the pose), everything else streamed
            blocking = i in (5, 6)
            sn.register_frame(p, t, rels[i], stamp=0.1 * (i + 1),
                              blocking=blocking)
        sn.drain()
        np.testing.assert_array_equal(
            np.asarray([p for _, p in sb.poses_with_stamps]),
            np.asarray([p for _, p in sn.poses_with_stamps]))
        # frame 0's identity delta + the two injected stationary frames
        assert sn.frames_skipped == sb.frames_skipped == 3

    def test_scan_stream_mode_matches_steps(self):
        """stream_mode='scan' (one dispatch per chunk, padded partial
        chunks) must match the per-frame 'steps' mode to float tolerance
        and produce identical overflow accounting."""
        from kinematic_icp_tpu.server import LidarOdometryServer
        cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                     map_capacity=1 << 13, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(NUM_FRAMES)  # 12 frames, chunk 5:
        # two full chunks + one partial (2 rows + 3 inactive pads)
        servers = {m: LidarOdometryServer(cfg, extrinsic=seq["extrinsic"],
                                          stream_chunk=5, stream_mode=m)
                   for m in ("steps", "scan")}
        for i, (p, t) in enumerate(seq["frames"]):
            for s in servers.values():
                s.register_frame(p, t, seq["rel_odometry"][i],
                                 stamp=0.1 * (i + 1), blocking=False)
        for s in servers.values():
            s.drain()
        a = np.asarray([p for _, p in servers["steps"].poses_with_stamps])
        b = np.asarray([p for _, p in servers["scan"].poses_with_stamps])
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert (servers["scan"].overflow_stats
                == servers["steps"].overflow_stats)
        assert (servers["scan"].frames_registered
                == servers["steps"].frames_registered)

    def test_drain_accounts_overflow(self):
        from kinematic_icp_tpu.server import LidarOdometryServer
        # Tiny capacities force downsample/source drops every frame.
        cfg = Config(max_points=4096, max_downsampled=128, max_source=32,
                     map_capacity=1 << 10, max_range=60.0, deskew=False)
        seq = synthetic.make_sequence(4)
        sb = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
        sn = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
        with pytest.warns(RuntimeWarning):
            for i, (p, t) in enumerate(seq["frames"]):
                sb.register_frame(p, t, seq["rel_odometry"][i])
        for i, (p, t) in enumerate(seq["frames"]):
            sn.register_frame(p, t, seq["rel_odometry"][i], blocking=False)
        assert sn.overflow_stats["source_dropped"] == 0  # not yet drained
        with pytest.warns(RuntimeWarning):
            sn.drain()
        assert sn.overflow_stats == sb.overflow_stats


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = Config(max_points=1024, max_downsampled=1024, max_source=512,
                     map_capacity=1 << 10, max_range=50.0)
        state = pipeline.init_state(cfg)
        rng = np.random.default_rng(0)
        import jax.numpy as jnp
        pts = jnp.asarray(rng.uniform(-10, 10, (cfg.max_points, 3)),
                          jnp.float32)
        mask = jnp.ones(cfg.max_points, bool)
        state, _ = pipeline.register_frame(
            state, pts, jnp.zeros(cfg.max_points), mask, jnp.bool_(False),
            jnp.eye(4), jnp.eye(4), cfg)
        path = str(tmp_path / "ckpt.npz")
        save_state(path, state, cfg, extra={"frame": 1})
        restored, meta = load_state(path)
        assert meta["extra"]["frame"] == 1
        assert load_config(meta) == cfg
        np.testing.assert_array_equal(np.asarray(restored.map.table),
                                      np.asarray(state.map.table))
        np.testing.assert_allclose(np.asarray(restored.pose),
                                   np.asarray(state.pose))
        # restored state continues running
        state2, out = pipeline.register_frame(
            restored, pts, jnp.zeros(cfg.max_points), mask, jnp.bool_(False),
            jnp.eye(4), jnp.eye(4), cfg)
        assert np.all(np.isfinite(np.asarray(out.pose)))


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer(device_sync=False)
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
        assert s["b"]["count"] == 1
        assert "stage" in t.report()


class TestVisualization:
    def test_voxel_segments(self):
        segs = voxel_grid_segments([[0, 0, 0], [1, 0, 0]], 1.0)
        assert segs.shape == (24, 2, 3)
        lengths = np.linalg.norm(segs[:, 1] - segs[:, 0], axis=1)
        np.testing.assert_allclose(lengths, 1.0)

    def test_ply_export(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(10, 3))
        p1 = str(tmp_path / "cloud.ply")
        write_ply(p1, pts, color=(255, 0, 0))
        content = open(p1).read()
        assert "element vertex 10" in content
        p2 = str(tmp_path / "grid.ply")
        write_voxel_grid_ply(p2, [[0, 0, 0]], 0.5)
        assert "element edge 12" in open(p2).read()


class TestServerWarmup:
    def test_warmup_precompiles_without_state_change(self):
        """warmup() must lower+compile ahead of time (first register_frame
        then runs without tracing) and leave server state untouched."""
        import jax

        from kinematic_icp_tpu.server import LidarOdometryServer
        cfg = Config(max_points=2048, max_downsampled=2048, max_source=512,
                     map_capacity=1 << 12, max_range=50.0, deskew=True)
        seq = synthetic.make_sequence(2)
        s = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"],
                                stream_mode="scan", stream_chunk=2)
        pose_before = s.pose.copy()
        s.warmup(1500, streaming=True)
        assert s.frames_registered == 0
        np.testing.assert_array_equal(s.pose, pose_before)
        # the warmed executable is the one register_frame uses
        with jax.log_compiles(False):
            r = s.register_frame(seq["frames"][1][0], seq["frames"][1][1],
                                 seq["rel_odometry"][1], stamp=0.1)
        assert r["registered"] and np.all(np.isfinite(r["pose"]))
