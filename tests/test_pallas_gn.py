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
        pose_pal, iters, ncorr, err = pallas_gn.gn_solve(
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
        pose, iters, ncorr, err = pallas_gn.gn_solve(
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
