"""Pipeline-level tests: state init/reset, register_frame semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.ops import hashmap

CFG = Config(max_points=1024, max_downsampled=1024, max_source=512,
             map_capacity=1 << 12, voxel_size=1.0, max_range=50.0,
             deskew=False)

RNG = np.random.default_rng(6)


def make_frame(n=800):
    pts = RNG.uniform(-20, 20, size=(CFG.max_points, 3)).astype(np.float32)
    mask = np.arange(CFG.max_points) < n
    return (jnp.asarray(pts), jnp.zeros(CFG.max_points, jnp.float32),
            jnp.asarray(mask))


def run_step(state, rel=None, frame=None):
    pts, ts, mask = frame if frame is not None else make_frame()
    rel = jnp.eye(4) if rel is None else jnp.asarray(rel, jnp.float32)
    return pipeline.register_frame(
        state, pts, ts, mask, jnp.bool_(False), jnp.eye(4), rel, CFG)


class TestPipeline:
    def test_first_frame_populates_map_keeps_pose(self):
        state = pipeline.init_state(CFG)
        state, out = run_step(state)
        assert not bool(hashmap.is_empty(state.map))
        np.testing.assert_allclose(np.asarray(state.pose), np.eye(4), atol=1e-6)
        # threshold got one sample
        assert float(state.threshold.num_samples) > 0.5

    def test_set_pose_resets(self):
        state = pipeline.init_state(CFG)
        state, _ = run_step(state)
        new_pose = np.eye(4, dtype=np.float32)
        new_pose[0, 3] = 5.0
        state = pipeline.set_pose(state, new_pose, CFG)
        assert bool(hashmap.is_empty(state.map))
        np.testing.assert_allclose(np.asarray(state.pose), new_pose, atol=0)
        assert float(state.threshold.num_samples) < 1e-6

    def test_pose_advances_with_odometry(self):
        state = pipeline.init_state(CFG)
        state, _ = run_step(state)
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = 0.5
        state, out = run_step(state, rel=rel)
        # moved roughly forward (ICP may adjust slightly)
        assert 0.2 < float(state.pose[0, 3]) < 0.8

    def test_outputs_shapes(self):
        state = pipeline.init_state(CFG)
        _, out = run_step(state)
        assert out.frame.shape == (CFG.max_points,)
        assert out.frame.to_array().shape == (CFG.max_points, 3)
        assert out.source.shape == (CFG.max_source,)
        assert out.pose.shape == (4, 4)
        assert int(out.debug.num_correspondences) >= 0

    def test_extrinsic_applied(self):
        # lidar mounted 1m forward: a point at lidar origin lands at base +x.
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 1.0
        pts = np.zeros((CFG.max_points, 3), np.float32)
        pts[0] = [2.0, 0.0, 0.5]
        mask = np.arange(CFG.max_points) < 1
        state = pipeline.init_state(CFG)
        _, out = pipeline.register_frame(
            state, jnp.asarray(pts), jnp.zeros(CFG.max_points),
            jnp.asarray(mask), jnp.bool_(False), jnp.asarray(ext),
            jnp.eye(4), CFG)
        np.testing.assert_allclose(
            np.asarray(out.frame.to_array()[0]), [3.0, 0.0, 0.5], atol=1e-6)

    def test_min_range_filter(self):
        cfg = CFG.replace(min_range=2.0)
        pts = np.zeros((cfg.max_points, 3), np.float32)
        pts[0] = [1.0, 0, 0]   # too close
        pts[1] = [5.0, 0, 0]   # ok
        mask = np.arange(cfg.max_points) < 2
        state = pipeline.init_state(cfg)
        _, out = pipeline.register_frame(
            state, jnp.asarray(pts), jnp.zeros(cfg.max_points),
            jnp.asarray(mask), jnp.bool_(False), jnp.eye(4), jnp.eye(4), cfg)
        got = np.asarray(out.frame_mask[:2])
        np.testing.assert_array_equal(got, [False, True])


class TestDeterminism:
    """Pure-functional steps must be bit-reproducible (SURVEY section 5.2:
    the TBB reference tolerates nondeterministic reduction order; the TPU
    build designs races out entirely, so we can and do demand exactness)."""

    def test_register_frame_bitwise_reproducible(self):
        frame = make_frame()
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = 0.3
        runs = []
        for _ in range(2):
            state = pipeline.init_state(CFG)
            for _ in range(3):
                state, out = run_step(state, rel=rel, frame=frame)
            runs.append(state)
        a, b = runs
        np.testing.assert_array_equal(np.asarray(a.pose), np.asarray(b.pose))
        np.testing.assert_array_equal(np.asarray(a.map.table),
                                      np.asarray(b.map.table))
        np.testing.assert_array_equal(np.asarray(a.threshold.odom_sse),
                                      np.asarray(b.threshold.odom_sse))

    def test_permutation_invariant_normal_equations(self):
        """The 2x2 normal-equation sums must not depend on point order."""
        import jax
        from kinematic_icp_tpu.ops import registration
        from kinematic_icp_tpu.ops.points import P3
        n = 512
        src = RNG.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        tgt = src + RNG.normal(0, 0.05, size=(n, 3)).astype(np.float32)
        mask = RNG.uniform(size=n) < 0.8
        pose = jnp.eye(4)
        perm = RNG.permutation(n)
        with jax.default_matmul_precision("highest"):
            s1 = registration.partial_normal_equations(
                P3.from_array(jnp.asarray(src)), P3.from_array(jnp.asarray(tgt)),
                jnp.asarray(mask), pose)
            s2 = registration.partial_normal_equations(
                P3.from_array(jnp.asarray(src[perm])),
                P3.from_array(jnp.asarray(tgt[perm])),
                jnp.asarray(mask[perm]), pose)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-4)


class TestPadSequenceTruncation:
    def test_truncation_warns_with_totals(self):
        """Silent scan-tail truncation caused metre-level divergence on
        long scans (round-5 seed-spread experiment, docs/accuracy.md) —
        pad_sequence must warn with the dropped-point total."""
        import warnings

        from kinematic_icp_tpu.offline import pad_sequence

        cfg = Config(max_points=1024)
        frames = [(np.zeros((1500, 3), np.float32),
                   np.zeros(1500, np.float32)),
                  (np.zeros((900, 3), np.float32),
                   np.zeros(900, np.float32))]
        with pytest.warns(UserWarning, match=r"dropped 476 .* 1/2"):
            pad_sequence(frames, None, cfg)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pad_sequence(frames[1:], None, cfg)  # no truncation: no warning
