"""Differential test: JAX pipeline vs the float64 reference-faithful oracle.

The oracle transcribes the reference C++ control flow exactly (dict voxel
map, per-iteration re-association, adaptive threshold).  Trajectories of the
two implementations on the same synthetic sequence must agree closely —
residual differences come from float32 vs float64 and voxel-block insertion
order, both bounded.
"""

import numpy as np
import pytest

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.oracle import OracleKinematicICP
from kinematic_icp_tpu.server import LidarOdometryServer
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.evaluation import ate_rmse

CFG = Config(max_points=8192, max_downsampled=8192, max_source=4096,
             map_capacity=1 << 15, voxel_size=1.0, max_range=60.0,
             deskew=True)

NUM_FRAMES = 15


@pytest.fixture(scope="module")
def sequence():
    return synthetic.make_sequence(NUM_FRAMES)


@pytest.fixture(scope="module")
def trajectories(sequence):
    seq = sequence
    oracle = OracleKinematicICP(CFG)
    server = LidarOdometryServer(CFG)
    oracle_poses, jax_poses = [], []
    for k in range(NUM_FRAMES):
        pts, ts = seq["frames"][k]
        rel = seq["rel_odometry"][k]
        # oracle applies the same stationary gate as the server
        from kinematic_icp_tpu.oracle.reference import se3_log
        if np.linalg.norm(se3_log(rel)) > 1e-3:
            oracle.register_frame(pts.astype(np.float64), ts.astype(np.float64),
                                  seq["extrinsic"], rel)
        oracle_poses.append(oracle.last_pose.copy())
        server.register_frame(pts, ts, rel, stamp=0.1 * k)
        jax_poses.append(server.pose)
    return oracle_poses, jax_poses, seq


class TestDifferential:
    def test_trajectories_agree(self, trajectories):
        oracle_poses, jax_poses, _ = trajectories
        ate = ate_rmse(oracle_poses, jax_poses, align=False)
        assert ate < 0.02, f"oracle vs jax ATE {ate:.4f} m"

    def test_both_beat_dead_reckoning(self, trajectories):
        oracle_poses, jax_poses, seq = trajectories
        gt = seq["gt_poses"]
        dead = [np.eye(4)]
        for rel in seq["rel_odometry"][1:]:
            dead.append(dead[-1] @ rel)
        ate_dead = ate_rmse(gt, dead, align=False)
        ate_oracle = ate_rmse(gt, oracle_poses, align=False)
        ate_jax = ate_rmse(gt, jax_poses, align=False)
        assert ate_oracle < ate_dead
        assert ate_jax < ate_dead

    def test_per_frame_divergence_bounded(self, trajectories):
        oracle_poses, jax_poses, _ = trajectories
        for k, (a, b) in enumerate(zip(oracle_poses, jax_poses)):
            d = np.linalg.norm(a[:3, 3] - b[:3, 3])
            assert d < 0.05, f"frame {k}: {d:.4f} m divergence"
