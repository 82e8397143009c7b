"""Long-horizon robustness: 500-frame drive with revisits (VERDICT r1 #8).

The wandering trajectory recrosses its own path many times over 500 frames
inside the arena, exercising map eviction/reinsertion, the adaptive
threshold accumulation (CorrespondenceThreshold.cpp:49-64 over real
horizons), and checkpoint/resume mid-sequence.
"""

import numpy as np
import pytest

from kinematic_icp_tpu import Config, baseline_native
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.offline import run_offline
from kinematic_icp_tpu.ops import hashmap, threshold
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.checkpoint import load_state, save_state
from kinematic_icp_tpu.utils.evaluation import ate_rmse, rpe

FRAMES = 500
CFG = Config(max_points=8192, max_downsampled=4096, max_source=2048,
             map_capacity=1 << 15, voxel_size=1.0, max_range=60.0,
             deskew=True)


@pytest.fixture(scope="module")
def drive():
    # ground-return sensor: ~3.5K pts/frame; the f64 reference achieves
    # ATE ~0.24 m here vs 2.1 m dead reckoning (4-ring wall-only scans are
    # too impoverished — the reference itself diverges on those).
    lidar = synthetic.realistic_lidar(num_beams=512, num_rings=8)
    return synthetic.make_sequence(FRAMES, lidar=lidar,
                                   clear_path_margin=3.0)


@pytest.fixture(scope="module")
def run(drive):
    import warnings
    with warnings.catch_warnings():
        # the deliberately tight map_capacity drops a pinned number of
        # insert allocations (asserted below); don't fail on the warning
        warnings.simplefilter("ignore", UserWarning)
        poses, final_state = run_offline(
            drive["frames"], drive["rel_odometry"], CFG,
            extrinsic=drive["extrinsic"])
    return poses, final_state


@pytest.mark.slow
class TestLongHorizon:
    def test_path_revisits(self, drive):
        # the drive must actually loop back over earlier terrain
        xy = np.asarray([[p[0, 3], p[1, 3]] for p in drive["gt_poses"]])
        d = np.linalg.norm(xy[None, :, :] - xy[:, None, :], axis=-1)
        i, j = np.triu_indices(FRAMES, k=100)
        assert (d[i, j] < 2.0).any(), "no loop revisit in 500 frames"

    def test_tracks_ground_truth(self, run, drive):
        poses, _ = run
        ate = ate_rmse(drive["gt_poses"], list(poses), align=False)
        dead = [np.eye(4)]
        for rel in drive["rel_odometry"][1:]:
            dead.append(dead[-1] @ rel)
        dead_ate = ate_rmse(drive["gt_poses"], dead, align=False)
        assert ate < 0.5 * dead_ate, (ate, dead_ate)
        assert ate < 1.0, ate

    def test_per_frame_delta_vs_reference_stays_bounded(self, run, drive):
        # RPE vs the f64 reference is the chaos-free fidelity metric
        # (docs/accuracy.md); it must not grow with horizon.
        if not baseline_native.available():
            pytest.skip("native baseline binary unavailable")
        poses, _ = run
        nat, _ = baseline_native.run_baseline(
            CFG, drive["frames"], drive["rel_odometry"], drive["extrinsic"])
        t_first, _ = rpe(list(nat[:250]), list(poses[:250]))
        t_second, _ = rpe(list(nat[250:]), list(poses[250:]))
        assert t_first < 0.01, t_first
        assert t_second < 0.01, t_second

    def test_threshold_and_map_stay_sane(self, run):
        _, state = run
        tau = float(threshold.compute_threshold(
            state.threshold, map_discretization_error=CFG.map_resolution(),
            use_adaptive=True, fixed_threshold=1.0))
        # tau = 3(sigma_map + sigma_odom): bounded by geometry, not runaway
        assert CFG.map_resolution() * 3 <= tau < 10.0, tau
        occ = int(hashmap.num_voxels(state.map))
        assert 0 < occ < 0.8 * CFG.map_capacity, occ
        assert float(state.threshold.num_samples) > 100

    def test_insert_drop_count_pinned(self, drive):
        """The 500-frame drive at this deliberately tight map_capacity
        drops EXACTLY 26 insert allocations (0 downsample, 0 source) —
        pinned so a capacity/eviction regression shows up as a number
        change, not a silently-absorbed warning (VERDICT r4 Weak #5)."""
        import jax.numpy as jnp
        from kinematic_icp_tpu.offline import (make_sequence_runner,
                                               pad_sequence)
        pts, ts, mask, has_ts, rels = pad_sequence(
            drive["frames"], drive["rel_odometry"], CFG)
        runner = make_sequence_runner(CFG)
        state = pipeline.init_state(CFG)
        _, _, overflow, fallbacks = runner(
            state, jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
            jnp.asarray(has_ts),
            jnp.asarray(drive["extrinsic"], jnp.float32),
            jnp.asarray(rels))
        assert np.asarray(overflow).tolist() == [0, 0, 26]
        assert int(fallbacks) == 0  # not in exact mode

    def test_checkpoint_resume_equals_uninterrupted(self, run, drive,
                                                    tmp_path):
        poses, _ = run
        half = FRAMES // 2
        p1, state_half = run_offline(
            drive["frames"][:half], drive["rel_odometry"][:half], CFG,
            extrinsic=drive["extrinsic"])
        path = str(tmp_path / "ckpt.npz")
        save_state(path, state_half, CFG)
        restored, meta = load_state(path)
        assert meta["config"]["voxel_size"] == CFG.voxel_size
        p2, _ = run_offline(
            drive["frames"][half:], drive["rel_odometry"][half:], CFG,
            extrinsic=drive["extrinsic"], state=restored)
        resumed = np.concatenate([p1, p2], axis=0)
        np.testing.assert_array_equal(resumed, np.asarray(poses))
