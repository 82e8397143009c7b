"""Native ingestion library: equivalence with the numpy fallbacks."""

import numpy as np
import pytest

from kinematic_icp_tpu.utils.io import native
from kinematic_icp_tpu.utils.io.laserscan import project_laser
from kinematic_icp_tpu.utils.io.messages import (Header, LaserScan,
                                                 PointCloud2, PointFieldType,
                                                 Time)

RNG = np.random.default_rng(11)

needs_native = pytest.mark.skipif(
    native.get_lib() is None, reason="native library not built")


@needs_native
class TestNativeExtraction:
    def test_matches_numpy_xyz(self):
        pts = RNG.normal(size=(500, 3)).astype(np.float32) * 20
        ts = RNG.uniform(0, 0.1, 500)
        msg = PointCloud2.from_xyz(pts, timestamps=ts, timestamp_field="t",
                                   timestamp_type=PointFieldType.FLOAT64)
        fx, fy, fz = msg.field("x"), msg.field("y"), msg.field("z")
        out = native.extract_pointcloud(
            msg.data, 500, msg.point_step, fx.offset, fy.offset, fz.offset,
            fx.datatype, msg.field("t").offset, msg.field("t").datatype)
        assert out is not None
        xyz, t = out
        np.testing.assert_array_equal(xyz, pts)
        np.testing.assert_allclose(t, ts, atol=0)

    def test_nanosecond_rescale(self):
        pts = RNG.normal(size=(10, 3)).astype(np.float32)
        ts_ns = np.linspace(1.7e18, 1.7e18 + 1e8, 10)
        msg = PointCloud2.from_xyz(pts, timestamps=ts_ns, timestamp_field="t",
                                   timestamp_type=PointFieldType.FLOAT64)
        f = msg.field("t")
        _, t = native.extract_pointcloud(
            msg.data, 10, msg.point_step, 0, 4, 8,
            PointFieldType.FLOAT32, f.offset, f.datatype)
        np.testing.assert_allclose(t, ts_ns * 1e-9, rtol=1e-12)

    def test_laserscan_projection_matches(self):
        n = 360
        scan = LaserScan(
            header=Header(Time.from_sec(1.0), "laser"),
            angle_min=-np.pi, angle_max=np.pi,
            angle_increment=2 * np.pi / n, time_increment=1e-4,
            scan_time=0.036, range_min=0.5, range_max=25.0,
            ranges=np.where(RNG.uniform(size=n) < 0.1, np.inf,
                            RNG.uniform(1, 20, n)).astype(np.float32),
            intensities=np.zeros(n, np.float32))
        cloud_native = project_laser(scan)
        # numpy fallback path
        import kinematic_icp_tpu.utils.io.native as nat
        saved = nat._lib, nat._lib_attempted
        try:
            nat._lib, nat._lib_attempted = None, True
            cloud_numpy = project_laser(scan)
        finally:
            nat._lib, nat._lib_attempted = saved
        np.testing.assert_allclose(cloud_native.xyz(), cloud_numpy.xyz(),
                                   atol=1e-5)
        np.testing.assert_allclose(cloud_native.field_array("stamps"),
                                   cloud_numpy.field_array("stamps"),
                                   atol=1e-9)

    def test_pointcloud2_xyz_uses_native(self):
        pts = RNG.normal(size=(100, 3)).astype(np.float32)
        msg = PointCloud2.from_xyz(pts)
        np.testing.assert_array_equal(msg.xyz(), pts)


# ----------------------------------------------------------------------
# Native CPU baseline (native/kicp_baseline.cpp): the compiled reference-
# algorithm implementation used as the honest bench denominator.  It must
# track the Python float64 oracle to machine precision — both implement the
# identical control flow (reference KinematicICP.cpp:48-85 semantics) in
# float64 with insertion-order downsampling.
# ----------------------------------------------------------------------

from kinematic_icp_tpu import Config, baseline_native
from kinematic_icp_tpu.oracle import OracleKinematicICP
from kinematic_icp_tpu.oracle.reference import se3_log
from kinematic_icp_tpu.utils import synthetic

needs_baseline = pytest.mark.skipif(
    not baseline_native.available(), reason="baseline binary not built")


@needs_baseline
class TestNativeBaseline:
    def _oracle_poses(self, cfg, seq, gate=True):
        oracle = OracleKinematicICP(cfg)
        poses = []
        for (p, t), rel in zip(seq["frames"], seq["rel_odometry"]):
            if not gate or np.linalg.norm(se3_log(rel)) > 1e-3:
                oracle.register_frame(p.astype(np.float64),
                                      t.astype(np.float64),
                                      seq["extrinsic"], rel)
            poses.append(oracle.last_pose.copy())
        return np.asarray(poses)

    def test_matches_python_oracle(self):
        cfg = Config(voxel_size=1.0, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(15)
        got, stats = baseline_native.run_baseline(
            cfg, seq["frames"], seq["rel_odometry"], seq["extrinsic"])
        want = self._oracle_poses(cfg, seq)
        assert stats["frames"] == 15
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_matches_oracle_no_deskew_fixed_threshold(self):
        cfg = Config(voxel_size=0.8, max_range=40.0, deskew=False,
                     use_adaptive_threshold=False, fixed_threshold=0.7,
                     use_adaptive_odometry_regularization=False,
                     fixed_regularization=0.1)
        seq = synthetic.make_sequence(10, traj_seed=5)
        got, _ = baseline_native.run_baseline(
            cfg, seq["frames"], seq["rel_odometry"], seq["extrinsic"],
            apply_stationary_gate=False)
        want = self._oracle_poses(cfg, seq, gate=False)
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_single_thread_matches_multi(self):
        cfg = Config(voxel_size=1.0, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(8)
        p1, _ = baseline_native.run_baseline(
            cfg, seq["frames"], seq["rel_odometry"], seq["extrinsic"],
            num_threads=1)
        p2, _ = baseline_native.run_baseline(
            cfg, seq["frames"], seq["rel_odometry"], seq["extrinsic"],
            num_threads=2)
        # Float64 reduction order may differ across thread counts; the
        # trajectory impact must stay negligible.
        np.testing.assert_allclose(p1, p2, atol=1e-6)
