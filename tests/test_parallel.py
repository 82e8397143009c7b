"""Multi-chip tests on the 8-device virtual CPU mesh.

Validates that the map-sharded step (a) runs on real (data, map) meshes,
(b) agrees with the single-device pipeline, and (c) the batched runner
tracks trajectories per-sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.parallel import (BatchedOdometryRunner, make_mesh,
                                        init_sharded_state, make_sharded_step)
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.evaluation import ate_rmse

CFG = Config(max_points=4096, max_downsampled=4096, max_source=2048,
             map_capacity=1 << 13, voxel_size=1.0, max_range=60.0,
             deskew=True)

NUM_FRAMES = 8


@pytest.fixture(scope="module")
def sequences():
    return [synthetic.make_sequence(NUM_FRAMES, world_seed=s, traj_seed=s + 10,
                                    noise_seed=s + 20) for s in range(2)]


def run_single_device(seq):
    """Ground truth: the plain single-device pipeline."""
    state = pipeline.init_state(CFG)
    step = pipeline.make_step(CFG, donate=False)
    poses = []
    from kinematic_icp_tpu.oracle.reference import se3_log
    for k in range(NUM_FRAMES):
        pts, ts = seq["frames"][k]
        rel = seq["rel_odometry"][k]
        if np.linalg.norm(se3_log(rel)) > 1e-3:
            n = CFG.max_points
            pad = np.zeros((n, 3), np.float32)
            tsp = np.zeros((n,), np.float32)
            kk = min(len(pts), n)
            pad[:kk] = pts[:kk]
            tsp[:kk] = ts[:kk]
            mask = np.arange(n) < kk
            state, out = step(state, jnp.asarray(pad), jnp.asarray(tsp),
                              jnp.asarray(mask), jnp.bool_(True), jnp.eye(4),
                              jnp.asarray(rel.astype(np.float32)))
        poses.append(np.asarray(state.pose, np.float64))
    return poses


class TestShardedStep:
    @pytest.mark.parametrize("data,map_", [(1, 4), (2, 2), (4, 1), (2, 4)])
    def test_mesh_shapes_run(self, data, map_, sequences):
        mesh = make_mesh(data=data, map=map_,
                         devices=jax.devices()[:data * map_])
        runner = BatchedOdometryRunner(CFG, batch=data, mesh=mesh)
        seq = sequences[0]
        pts, ts = seq["frames"][1]
        poses = runner.step([pts] * data, [seq["rel_odometry"][1]] * data,
                            [ts] * data)
        assert poses.shape == (data, 4, 4)
        assert np.all(np.isfinite(poses))

    def test_sharded_matches_single_device(self, sequences):
        mesh = make_mesh(data=2, map=4)
        runner = BatchedOdometryRunner(CFG, batch=2, mesh=mesh)
        results = runner.run([
            {"frames": s["frames"],
             "rel_odometry": s["rel_odometry"]} for s in sequences])
        for i, seq in enumerate(sequences):
            ref_poses = run_single_device(seq)
            ate = ate_rmse(ref_poses, results[i], align=False)
            assert ate < 5e-3, f"seq {i}: sharded vs single ATE {ate:.5f}"

    def test_batch_independence(self, sequences):
        """A sequence's result must not depend on its batch neighbors."""
        mesh = make_mesh(data=2, map=1, devices=jax.devices()[:2])
        r2 = BatchedOdometryRunner(CFG, batch=2, mesh=mesh)
        out2 = r2.run([
            {"frames": s["frames"],
             "rel_odometry": s["rel_odometry"]} for s in sequences])
        ref = run_single_device(sequences[1])
        ate = ate_rmse(ref, out2[1], align=False)
        assert ate < 5e-3

    def test_stationary_gate_freezes_state(self, sequences):
        mesh = make_mesh(data=1, map=2, devices=jax.devices()[:2])
        runner = BatchedOdometryRunner(CFG, batch=1, mesh=mesh)
        seq = sequences[0]
        pts, ts = seq["frames"][1]
        runner.step([pts], [seq["rel_odometry"][1]], [ts])
        pose_before = np.asarray(runner.state.pose)
        runner.step([pts], [np.eye(4)], [ts])  # stationary
        np.testing.assert_allclose(np.asarray(runner.state.pose), pose_before,
                                   atol=0)


class TestShardedSequenceRunner:
    """The device-side whole-sequence scan over a (data, map) mesh
    (VERDICT r4 Missing #3: configs 4/5 must not pay one host round trip
    per frame)."""

    def _pack(self, sequences):
        from kinematic_icp_tpu.offline import pad_sequence
        packed = [pad_sequence(s["frames"], s["rel_odometry"], CFG)
                  for s in sequences]
        return tuple(jnp.asarray(np.stack([p[i] for p in packed], axis=1))
                     for i in range(5))

    def test_matches_per_frame_step(self, sequences):
        from kinematic_icp_tpu.parallel.sharded import (
            make_sharded_sequence_runner)
        mesh = make_mesh(data=2, map=4)
        pts, ts, mask, has_ts, rels = self._pack(sequences)
        runner = make_sharded_sequence_runner(CFG, mesh, donate=False)
        state = init_sharded_state(CFG, mesh, 2)
        _, poses, overflow = runner(state, pts, ts, mask, has_ts,
                                    jnp.eye(4), rels)
        poses = np.asarray(poses, np.float64)
        assert poses.shape == (NUM_FRAMES, 2, 4, 4)
        assert not np.asarray(overflow).any()
        # same per-frame kernel dispatched from the host loop
        frame_runner = BatchedOdometryRunner(CFG, batch=2, mesh=mesh)
        results = frame_runner.run([
            {"frames": s["frames"],
             "rel_odometry": s["rel_odometry"]} for s in sequences])
        for i in range(2):
            np.testing.assert_allclose(
                poses[:, i], np.asarray(results[i]), atol=1e-5)

    def test_run_device_api(self, sequences):
        """BatchedOdometryRunner.run_device == run() on the same mesh,
        including ragged sequence lengths."""
        mesh = make_mesh(data=2, map=2, devices=jax.devices()[:4])
        ragged = [
            {"frames": sequences[0]["frames"],
             "rel_odometry": sequences[0]["rel_odometry"]},
            {"frames": sequences[1]["frames"][:NUM_FRAMES - 3],
             "rel_odometry": sequences[1]["rel_odometry"][:NUM_FRAMES - 3]},
        ]
        r1 = BatchedOdometryRunner(CFG, batch=2, mesh=mesh)
        host = [list(map(np.asarray, p)) for p in r1.run(
            [dict(s) for s in ragged])]
        r2 = BatchedOdometryRunner(CFG, batch=2, mesh=mesh)
        dev = r2.run_device(ragged)
        assert len(dev[0]) == NUM_FRAMES
        assert len(dev[1]) == NUM_FRAMES - 3
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(dev[i]), np.asarray(host[i][:len(dev[i])]),
                atol=1e-5)

    def test_matches_single_device(self, sequences):
        from kinematic_icp_tpu.parallel.sharded import (
            make_sharded_sequence_runner)
        mesh = make_mesh(data=1, map=4, devices=jax.devices()[:4])
        pts, ts, mask, has_ts, rels = self._pack(sequences[:1])
        runner = make_sharded_sequence_runner(CFG, mesh, donate=False)
        state = init_sharded_state(CFG, mesh, 1)
        _, poses, _ = runner(state, pts, ts, mask, has_ts, jnp.eye(4), rels)
        ref = run_single_device(sequences[0])
        ate = ate_rmse(ref, list(np.asarray(poses, np.float64)[:, 0]),
                       align=False)
        assert ate < 5e-3, f"sharded scan vs single ATE {ate:.5f}"


class TestBatchedSequenceRunner:
    """The single-dispatch vmapped scan (BASELINE config 3)."""

    def test_matches_single_device(self, sequences):
        from kinematic_icp_tpu.offline import (init_batched_state,
                                               make_batched_sequence_runner,
                                               pad_sequence)
        b = len(sequences)
        packed = [pad_sequence(s["frames"], s["rel_odometry"], CFG)
                  for s in sequences]
        # (F, B, ...) stacking
        pts, ts, mask, has_ts, rels = (
            jnp.asarray(np.stack([p[i] for p in packed], axis=1))
            for i in range(5))
        runner = make_batched_sequence_runner(CFG)
        state = init_batched_state(CFG, b)
        _, poses, _, _ = runner(state, pts, ts, mask, has_ts, jnp.eye(4), rels)
        poses = np.asarray(poses, np.float64)       # (F, B, 4, 4)
        for i, seq in enumerate(sequences):
            ref = run_single_device(seq)
            ate = ate_rmse(ref, poses[:, i], align=False)
            assert ate < 5e-3, f"seq {i}: batched vs single ATE {ate:.5f}"
