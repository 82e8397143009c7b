"""Tests for the kinematically-constrained Gauss-Newton registration."""

import jax.numpy as jnp
import numpy as np
import pytest

from kinematic_icp_tpu.ops import hashmap, registration, se3
from kinematic_icp_tpu.ops.points import P3

RNG = np.random.default_rng(5)

CAP = 1 << 13
K = 20
VS = 1.0
P = 8

GN_KW = dict(voxel_size=VS, max_probes=P, max_num_iterations=20,
             convergence_criterion=1e-4,
             use_adaptive_odometry_regularization=True,
             fixed_regularization=0.0)


def make_world_points(n=1500):
    """Points on the walls of a rectangular room (planar-robot world)."""
    pts = []
    for _ in range(n):
        wall = RNG.integers(0, 4)
        s = RNG.uniform(-20, 20)
        z = RNG.uniform(0.0, 3.0)
        if wall == 0:
            pts.append([s, -20.0, z])
        elif wall == 1:
            pts.append([s, 20.0, z])
        elif wall == 2:
            pts.append([-20.0, s, z])
        else:
            pts.append([20.0, s, z])
    return np.array(pts, dtype=np.float32)


def build_map(world_pts):
    m = hashmap.empty(CAP, K)
    return hashmap.insert(m, P3.from_array(jnp.asarray(world_pts)),
                          jnp.ones(len(world_pts), bool), VS, P)


def perturb(src, tgt, mask, pose, beta):
    return np.asarray(registration.compute_perturbation(
        P3.from_array(jnp.asarray(src)), P3.from_array(jnp.asarray(tgt)),
        jnp.asarray(mask), pose, jnp.float32(beta)))


def planar_pose(x, y, yaw):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[:3, 3] = [x, y, 0.0]
    return jnp.asarray(T)


class TestPerturbation:
    def test_zero_residual_zero_update(self):
        src = RNG.uniform(-5, 5, size=(100, 3)).astype(np.float32)
        pose = planar_pose(1.0, 2.0, 0.3)
        world = np.asarray(se3.apply(pose, jnp.asarray(src)))
        dx = perturb(src, world, np.ones(100, bool), pose, 0.0)
        np.testing.assert_allclose(dx, 0.0, atol=1e-5)

    def test_no_correspondences_zero(self):
        src = RNG.uniform(-5, 5, size=(10, 3)).astype(np.float32)
        dx = perturb(src, src, np.zeros(10, bool), jnp.eye(4), 0.0)
        np.testing.assert_allclose(dx, 0.0)

    def test_forward_offset_recovered(self):
        # targets = source shifted +0.3 in x: expect dx ~ (0.3, 0)
        src = RNG.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        tgt = src + np.array([0.3, 0, 0], np.float32)
        dx = perturb(src, tgt, np.ones(200, bool), jnp.eye(4), 0.0)
        assert abs(dx[0] - 0.3) < 1e-4
        assert abs(dx[1]) < 1e-4

    def test_yaw_offset_recovered(self):
        yaw = 0.05
        src = RNG.uniform(-5, 5, size=(400, 3)).astype(np.float32)
        Rz = np.asarray(planar_pose(0, 0, yaw))[:3, :3]
        tgt = (src @ Rz.T).astype(np.float32)
        dx = perturb(src, tgt, np.ones(400, bool), jnp.eye(4), 0.0)
        assert abs(dx[1] - yaw) < 5e-3

    def test_regularization_shrinks_displacement(self):
        src = RNG.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        tgt = src + np.array([0.3, 0, 0], np.float32)
        dx_free = perturb(src, tgt, np.ones(200, bool), jnp.eye(4), 0.0)
        dx_reg = perturb(src, tgt, np.ones(200, bool), jnp.eye(4), 10.0)
        assert abs(dx_reg[0]) < abs(dx_free[0])


class TestDataAssociation:
    def test_threshold_gates(self):
        world = make_world_points(500)
        m = build_map(world)
        src = world[:100] + np.array([0.4, 0, 0], np.float32)
        _, mask_tight = registration.data_association(
            m, P3.from_array(jnp.asarray(src)), jnp.ones(100, bool),
            jnp.eye(4), jnp.float32(0.05), VS, P)
        _, mask_loose = registration.data_association(
            m, P3.from_array(jnp.asarray(src)), jnp.ones(100, bool),
            jnp.eye(4), jnp.float32(1.0), VS, P)
        assert int(jnp.sum(mask_tight)) < int(jnp.sum(mask_loose))
        assert int(jnp.sum(mask_loose)) == 100


class TestComputeRobotMotion:
    def test_empty_map_returns_guess(self):
        m = hashmap.empty(CAP, K)
        src = RNG.uniform(-5, 5, size=(100, 3)).astype(np.float32)
        last = planar_pose(1.0, 0.0, 0.1)
        rel = planar_pose(0.5, 0.0, 0.02)
        pose, dbg = registration.compute_robot_motion(
            m, P3.from_array(jnp.asarray(src)), jnp.ones(100, bool), last,
            rel, jnp.float32(1.0), **GN_KW)
        np.testing.assert_allclose(np.asarray(pose), np.asarray(last @ rel),
                                   atol=1e-6)
        assert int(dbg.num_correspondences) == 0

    def test_recovers_true_motion_from_biased_odometry(self):
        """Scan rendered at true pose; wheel odometry biased — ICP must fix it."""
        world = make_world_points(3000)
        m = build_map(world)

        true_pose_np = np.asarray(planar_pose(0.5, 0.2, 0.05), np.float64)
        # local scan = world points (within range) seen from the true pose
        R, t = true_pose_np[:3, :3], true_pose_np[:3, 3]
        local = ((world.astype(np.float64) - t) @ R).astype(np.float32)
        keep = np.linalg.norm(local, axis=1) < 30.0
        local = local[keep][:1024]
        n = len(local)

        last = planar_pose(0, 0, 0)
        # biased odometry guess: off by (0.15m, 0.1m, 0.03rad)
        rel_guess = planar_pose(0.35, 0.1, 0.02)
        pose, dbg = registration.compute_robot_motion(
            m, P3.from_array(jnp.asarray(local)), jnp.ones(n, bool), last,
            rel_guess, jnp.float32(2.0), **GN_KW)
        pose = np.asarray(pose, np.float64)
        err = np.linalg.inv(pose) @ true_pose_np
        trans_err = np.linalg.norm(err[:3, 3])
        # The unicycle model can only correct (rho, theta); lateral bias is
        # only partially correctable in one step, but the error must shrink
        # substantially vs the guess.
        guess_err = np.linalg.inv(np.asarray(last @ rel_guess)) @ true_pose_np
        assert trans_err < 0.6 * np.linalg.norm(guess_err[:3, 3])
        assert int(dbg.iterations) >= 1

    def test_perfect_guess_converges_immediately(self):
        world = make_world_points(2000)
        m = build_map(world)
        true_pose = planar_pose(0.5, 0.0, 0.02)
        tp = np.asarray(true_pose, np.float64)
        local = ((world.astype(np.float64) - tp[:3, 3]) @ tp[:3, :3])
        local = local[np.linalg.norm(local, axis=1) < 30.0][:1024]
        local = local.astype(np.float32)
        pose, dbg = registration.compute_robot_motion(
            m, P3.from_array(jnp.asarray(local)), jnp.ones(len(local), bool),
            jnp.eye(4), true_pose, jnp.float32(2.0), **GN_KW)
        err = np.linalg.inv(np.asarray(pose, np.float64)) @ tp
        assert np.linalg.norm(err[:3, 3]) < 5e-3
        # converged fast
        assert int(dbg.iterations) <= 3


class TestPrunedExact:
    """exact_prune_candidates must be BIT-IDENTICAL to the full-27 loop:
    the certificate (hashmap.gather_candidates return_skip_bound) routes
    any frame a skipped voxel could have influenced to the fallback."""

    def _motion(self, m, src, mask, guess, tau, **over):
        kw = dict(voxel_size=1.0, max_probes=4, max_num_iterations=10,
                  convergence_criterion=0.001,
                  use_adaptive_odometry_regularization=True,
                  fixed_regularization=0.0, num_candidate_voxels=27,
                  exact_gn_reassociation=True, gn_backend="xla")
        kw.update(over)
        return registration.compute_robot_motion(
            m, src, mask, jnp.eye(4), guess, jnp.float32(tau), **kw)

    @pytest.mark.parametrize("v", [8, 14, 22])
    def test_bitwise_equals_native(self, v):
        rng = np.random.default_rng(7)
        world = make_world_points(2000)
        m = build_map(world)
        src = (world[:512] + rng.normal(0, 0.05, (512, 3))).astype(
            np.float32)
        src_p = P3.from_array(jnp.asarray(src))
        mask = jnp.asarray(rng.uniform(size=512) < 0.95)
        guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.08)
        for tau in (0.3, 0.7, 1.5):
            p_nat, d_nat = self._motion(m, src_p, mask, guess, tau)
            p_prn, d_prn = self._motion(m, src_p, mask, guess, tau,
                                        exact_prune_candidates=v)
            np.testing.assert_array_equal(np.asarray(p_nat),
                                          np.asarray(p_prn))
            assert int(d_nat.iterations) == int(d_prn.iterations)
            assert int(d_nat.num_correspondences) == int(
                d_prn.num_correspondences)

    def test_skipped_corner_voxel_forces_fallback(self):
        # Adversarial case: the only map point near the query sits in a
        # CORNER voxel (box lower bound 0.75 from a voxel-center query),
        # which V=14 pruning skips (it keeps center + 6 faces + 7 edges).
        # Without the certificate the pruned search would silently miss
        # the only sub-tau correspondence; the certificate must fire
        # (corner lb 0.75 <= tau^2 = 1) and the fallback recover it.
        m = hashmap.empty(1 << 12, 20, bucket_slots=4)
        m = hashmap.insert(
            m, P3.from_array(jnp.asarray(
                [[-0.01, -0.01, -0.01]], jnp.float32)),
            jnp.ones(1, bool), 1.0, 4)
        src_p = P3.from_array(jnp.asarray([[0.5, 0.5, 0.5]], jnp.float32))
        mask = jnp.ones(1, bool)
        guess = jnp.eye(4, dtype=jnp.float32)
        p_nat, d_nat = self._motion(m, src_p, mask, guess, 1.0)
        assert int(d_nat.num_correspondences) == 1  # native finds it
        p_prn, d_prn = self._motion(m, src_p, mask, guess, 1.0,
                                    exact_prune_candidates=14)
        # The fallback recomputes the identical full-27 loop, but inside a
        # lax.cond branch — XLA's fusion context there can contract FMAs
        # differently, so equality on FALLBACK frames is last-ulp, not
        # bitwise (certificate-passing frames are bitwise; see
        # test_bitwise_equals_native).
        np.testing.assert_allclose(np.asarray(p_nat), np.asarray(p_prn),
                                   atol=1e-6)
        assert bool(d_prn.exact_fallback)
        assert int(d_prn.num_correspondences) == 1
        assert int(d_prn.iterations) == int(d_nat.iterations)

    def test_empty_map_matches_native(self):
        # Empty map: no skipped box can matter (they are all empty too) —
        # whether or not the geometric certificate fires, the result must
        # equal the native loop's (the guess, unchanged).
        m = hashmap.empty(1 << 12, 20, bucket_slots=4)
        src_p = P3.from_array(jnp.asarray(
            np.random.default_rng(0).uniform(-5, 5, (64, 3)).astype(
                np.float32)))
        mask = jnp.ones(64, bool)
        guess = jnp.eye(4, dtype=jnp.float32).at[1, 3].set(0.2)
        p_nat, _ = self._motion(m, src_p, mask, guess, 0.7)
        p_prn, _ = self._motion(m, src_p, mask, guess, 0.7,
                                exact_prune_candidates=14)
        np.testing.assert_array_equal(np.asarray(p_nat), np.asarray(p_prn))


class TestGnBackendDecision:
    """Pin the Pallas engagement envelope at the knob (Config.gn_backend).

    The fused kernel keeps ~6 (rows, N) f32 planes in the 16 MB scoped
    VMEM; ``pallas_gn_fits`` is the static gate.  The STOCK Config
    (neighbor_candidates=10, max_points_per_voxel=20, max_source=8192)
    does NOT fit — gn_backend="auto" silently takes the XLA while_loop
    path at those shapes; the bench configs (max_source=1024) do fit.
    """

    def test_stock_config_never_engages_pallas(self):
        from kinematic_icp_tpu.config import Config
        cfg = Config()
        rows = cfg.neighbor_candidates * cfg.max_points_per_voxel
        assert not registration.pallas_gn_fits(rows, cfg.max_source)

    def test_bench_shapes_fit(self):
        # the 64K-regime bench config: 10 candidate voxels x K=20, N=1024
        assert registration.pallas_gn_fits(10 * 20, 1024)
        # full-27 neighborhood at N=1024 also fits
        assert registration.pallas_gn_fits(27 * 20, 1024)
        # N=4096 at 27x20 rows does not (documented in pallas_gn_fits)
        assert not registration.pallas_gn_fits(27 * 20, 4096)

    def test_auto_resolves_to_xla_off_tpu(self, monkeypatch):
        # On the CPU test backend, auto must not touch the pallas module
        # even for shapes that fit.
        import kinematic_icp_tpu.ops.pallas_gn as pallas_gn

        def boom(*a, **k):
            raise AssertionError("pallas path engaged on CPU")

        monkeypatch.setattr(pallas_gn, "gn_solve", boom)
        world = make_world_points(400)
        m = build_map(world)
        src = world[:256] + np.float32(0.05)
        pose, _ = registration.compute_robot_motion(
            m, P3.from_array(jnp.asarray(src)), jnp.ones(256, bool),
            jnp.eye(4), jnp.eye(4), jnp.float32(2.0),
            gn_backend="auto", **GN_KW)
        assert np.all(np.isfinite(np.asarray(pose)))
