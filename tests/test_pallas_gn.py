"""Fused Pallas GN kernel vs the XLA lowering: exact equivalence.

Runs the kernel in interpreter mode (tests are CPU-only); the TPU-compiled
kernel was validated to produce identical poses/iterations/correspondence
counts on hardware (see git history).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kinematic_icp_tpu.ops import hashmap, pallas_gn, registration
from kinematic_icp_tpu.ops.points import P3

RNG = np.random.default_rng(0)


def setup(n=512, nmap=3000):
    map_pts = RNG.uniform(-20, 20, (nmap, 3)).astype(np.float32)
    m = hashmap.insert(hashmap.empty(1 << 13, 20),
                       P3.from_array(jnp.asarray(map_pts)),
                       jnp.ones(nmap, bool), 1.0, 4)
    src = (map_pts[:n] + RNG.normal(0, 0.05, (n, 3))).astype(np.float32)
    source = P3.from_array(jnp.asarray(src))
    mask = jnp.asarray(RNG.uniform(size=n) < 0.9)
    c, s = np.cos(0.01), np.sin(0.01)
    guess = jnp.asarray([[c, -s, 0, 0.02], [s, c, 0, -0.01],
                         [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32)
    return m, source, mask, guess


KW = dict(voxel_size=1.0, max_probes=4, max_num_iterations=10,
          convergence_criterion=0.001,
          use_adaptive_odometry_regularization=True,
          fixed_regularization=0.0, num_candidate_voxels=10)


class TestPallasGN:
    def test_matches_xla_path(self):
        m, source, mask, guess = setup()
        rel = jnp.eye(4, dtype=jnp.float32)
        pose_xla, dbg_xla = registration.compute_robot_motion(
            m, source, mask, guess, rel, 0.5, gn_backend="xla", **KW)
        world = registration.transform(guess, source)
        cand = hashmap.gather_candidates(m, world, 1.0, 4, 10)
        pose_pal, iters, ncorr, err, _ = pallas_gn.gn_solve(
            cand, source, mask, guess, 0.5,
            voxel_size=1.0, max_num_iterations=10,
            convergence_criterion=0.001, use_adaptive_regularization=True,
            fixed_regularization=0.0, max_range=60.0, interpret=True)
        np.testing.assert_allclose(np.asarray(pose_pal),
                                   np.asarray(pose_xla), atol=1e-7)
        assert int(iters) == int(dbg_xla.iterations)
        assert int(ncorr) == int(dbg_xla.num_correspondences)
        # the in-kernel threshold error equals the host formula on
        # guess^-1 @ pose (CorrespondenceThreshold.cpp:7-12)
        from kinematic_icp_tpu.ops import se3, threshold
        emat = se3.compose44(se3.inverse(guess), pose_pal)
        ref_err = threshold.odometry_error_in_point_space(emat, 60.0)
        np.testing.assert_allclose(float(err), float(ref_err), atol=1e-5)

    def test_fixed_regularization_and_empty_map(self):
        m = hashmap.empty(1 << 13, 20)
        n = 256
        source = P3.from_array(jnp.asarray(
            RNG.uniform(-10, 10, (n, 3)).astype(np.float32)))
        mask = jnp.ones(n, bool)
        guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.5)
        world = registration.transform(guess, source)
        cand = hashmap.gather_candidates(m, world, 1.0, 4, 10)
        pose, iters, ncorr, err, _ = pallas_gn.gn_solve(
            cand, source, mask, guess, 0.5,
            voxel_size=1.0, max_num_iterations=10,
            convergence_criterion=0.001, use_adaptive_regularization=False,
            fixed_regularization=0.1, interpret=True)
        assert float(err) == 0.0  # pose == guess and max_range defaults to 0
        # empty map -> no correspondences -> returns the guess unchanged
        np.testing.assert_allclose(np.asarray(pose), np.asarray(guess),
                                   atol=0)
        assert int(ncorr) == 0
        assert int(iters) == 1  # dx = 0 converges immediately

    def test_auto_backend_resolves_to_xla_on_cpu(self):
        m, source, mask, guess = setup(n=128, nmap=500)
        rel = jnp.eye(4, dtype=jnp.float32)
        p_auto, _ = registration.compute_robot_motion(
            m, source, mask, guess, rel, 0.5, gn_backend="auto", **KW)
        p_xla, _ = registration.compute_robot_motion(
            m, source, mask, guess, rel, 0.5, gn_backend="xla", **KW)
        assert jax.default_backend() == "cpu"
        np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_xla))

    def test_vmem_fit_predicate(self):
        # 64K realistic regime: 10 candidate voxels x 20 points, 1024
        # queries -> fits; the small regime's old max_source=4096 did not
        # (it OOMed the 16 MB scoped VMEM at compile time on hardware).
        assert registration.pallas_gn_fits(200, 1024)
        assert registration.pallas_gn_fits(200, 2048)
        assert not registration.pallas_gn_fits(200, 4096)
        assert not registration.pallas_gn_fits(27 * 20, 2048)
        # the exact-mode kernel shape (full 27-voxel cache) fits at the
        # bench max_source=1024 — the crossing-certified exact path relies
        # on this
        assert registration.pallas_gn_fits(27 * 20, 1024)


class TestCrossingCertifiedExact:
    """The cached-27 kernel + crossing certificate vs the native loop."""

    def _solve(self, m, source, mask, guess, tau=0.7):
        world = registration.transform(guess, source)
        cand = hashmap.gather_candidates(m, world, 1.0, 4, 27)
        return pallas_gn.gn_solve(
            cand, source, mask, guess, tau,
            voxel_size=1.0, max_num_iterations=10,
            convergence_criterion=0.001, use_adaptive_regularization=True,
            fixed_regularization=0.0, max_range=60.0, check_crossing=True,
            interpret=True)

    def _margin_setup(self, n=400):
        # Points kept >= 0.2 from every voxel boundary: GN movements of a
        # few mm can then never change a query's voxel, making the
        # no-crossing premise deterministic (a generic cloud has points
        # arbitrarily close to boundaries, where even um-scale GN updates
        # legitimately cross).
        rng = np.random.default_rng(1234)
        base = rng.integers(-15, 15, (1200, 3)).astype(np.float32)
        frac = rng.uniform(0.21, 0.79, (1200, 3)).astype(np.float32)
        map_pts = base + frac
        map_pts = np.unique(map_pts, axis=0)
        m = hashmap.insert(hashmap.empty(1 << 13, 20),
                           P3.from_array(jnp.asarray(map_pts)),
                           jnp.ones(len(map_pts), bool), 1.0, 4)
        src = map_pts[:n] + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
        src = np.clip(src - np.floor(src), 0.21, 0.79) + np.floor(src)
        return m, P3.from_array(jnp.asarray(src.astype(np.float32))), \
            jnp.ones(n, bool)

    def test_uncrossed_equals_native_loop(self):
        # Tiny guess error + boundary-margin points -> no voxel change:
        # the certificate must hold and the kernel result must equal the
        # XLA exact (re-gather-per-iteration) loop.
        m, source, mask = self._margin_setup()
        guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(1e-4)
        pose_k, iters, ncorr, _, crossed = self._solve(m, source, mask,
                                                       guess)
        assert not bool(crossed)
        pose_x, dbg = registration.compute_robot_motion(
            m, source, mask, jnp.eye(4, dtype=jnp.float32),
            guess, 0.7, gn_backend="xla",
            **{**KW, "num_candidate_voxels": 27,
               "exact_gn_reassociation": True})
        np.testing.assert_allclose(np.asarray(pose_k), np.asarray(pose_x),
                                   atol=1e-6)
        assert int(iters) == int(dbg.iterations)
        assert int(ncorr) == int(dbg.num_correspondences)

    def test_crossing_detected(self):
        # A large guess offset makes GN pull points across voxel
        # boundaries -> the certificate must flag it.
        m, source, mask, _ = setup()
        guess = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.45)
        *_, crossed = self._solve(m, source, mask, guess, tau=2.0)
        assert bool(crossed)

    def test_exact_pallas_mode_matches_xla_exact(self):
        # Full compute_robot_motion with gn_backend="pallas" + exact mode
        # (interpret-mode kernel via monkeypatching is avoided: call the
        # registration entry on CPU with backend "xla" and compare against
        # the kernel + cond plumbing driven directly).
        m, source, mask, guess = setup(n=256, nmap=1500)
        rel = jnp.eye(4, dtype=jnp.float32)
        kw = {**KW, "num_candidate_voxels": 27,
              "exact_gn_reassociation": True}
        pose_x, dbg_x = registration.compute_robot_motion(
            m, source, mask, guess, rel, 0.7, gn_backend="xla", **kw)
        pose_k, iters, ncorr, _, crossed = self._solve(m, source, mask,
                                                       guess)
        if not bool(crossed):
            np.testing.assert_allclose(np.asarray(pose_k),
                                       np.asarray(pose_x), atol=1e-6)
            assert int(iters) == int(dbg_x.iterations)
            assert int(ncorr) == int(dbg_x.num_correspondences)
