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


class TestChaosFloor:
    """The algorithm's own sensitivity bound on trajectory-delta gates.

    Kinematic-ICP's voxel-grid decisions (downsample first-point-wins, map
    block membership, threshold gating) amplify ANY numeric difference: two
    runs of the exact f64 reference algorithm whose inputs differ by one
    MICROMETRE diverge to several-cm ATE within 100 frames (and the
    divergence does not shrink with the perturbation).  Trajectory deltas
    vs the reference beyond short horizons therefore measure chaotic
    sensitivity, not implementation fidelity — the meaningful long-horizon
    parity evidence is (a) short-window exact agreement (TestDifferential),
    (b) delta within ~the chaos floor, and (c) statistically equal accuracy
    vs ground truth (bench.py multi-seed runs).
    """

    @staticmethod
    def _floor_draws(seq):
        """Reference self-divergence draws: 1 um noise + 2 permutations."""
        from kinematic_icp_tpu import baseline_native
        exact, _ = baseline_native.run_baseline(
            CFG, seq["frames"], seq["rel_odometry"], seq["extrinsic"],
            num_threads=1)
        floors = []
        rng = np.random.default_rng(7)
        pert = [(p + rng.normal(0, 1e-6, p.shape), t)
                for p, t in seq["frames"]]
        noisy, _ = baseline_native.run_baseline(
            CFG, pert, seq["rel_odometry"], seq["extrinsic"], num_threads=1)
        floors.append(ate_rmse(list(exact), list(noisy), align=False))
        for d in range(2):
            rng = np.random.default_rng(777 + d)
            frames = []
            for p, t in seq["frames"]:
                perm = rng.permutation(len(p))
                frames.append((p[perm], t[perm]))
            pp, _ = baseline_native.run_baseline(
                CFG, frames, seq["rel_odometry"], seq["extrinsic"],
                num_threads=1)
            floors.append(ate_rmse(list(exact), list(pp), align=False))
        return exact, floors

    def test_micrometre_perturbation_diverges(self):
        from kinematic_icp_tpu import baseline_native
        if not baseline_native.available():
            pytest.skip("native baseline binary unavailable")
        seq = synthetic.make_sequence(60)
        _, floors = self._floor_draws(seq)
        # guarantee-free input variation must visibly move the trajectory
        # (chaos) yet stay within the same odometry-quality envelope.
        assert 1e-4 < max(floors) < 0.5, floors

    def test_tpu_delta_within_chaos_envelope(self):
        from kinematic_icp_tpu import baseline_native
        if not baseline_native.available():
            pytest.skip("native baseline binary unavailable")
        from kinematic_icp_tpu.offline import run_offline
        seq = synthetic.make_sequence(60)
        exact, floors = self._floor_draws(seq)
        poses, _ = run_offline(seq["frames"], seq["rel_odometry"], CFG,
                               extrinsic=seq["extrinsic"])
        delta = ate_rmse(list(exact), list(poses), align=False)
        assert delta <= max(0.05, 3.5 * max(floors)), (delta, floors)
