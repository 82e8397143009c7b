"""Unit tests for SE(3)/SO(3) ops against scipy and round-trip identities."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from kinematic_icp_tpu.ops import se3

RNG = np.random.default_rng(0)


def random_twists(n, scale_t=2.0, scale_r=1.5):
    xi = RNG.normal(size=(n, 6))
    xi[:, :3] *= scale_t
    xi[:, 3:] *= scale_r
    return xi.astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        w = RNG.normal(size=(64, 3)).astype(np.float32) * 2.0
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        R_ref = Rotation.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=2e-6)

    def test_exp_small_angle(self):
        w = np.array([[1e-9, -1e-9, 1e-10], [0, 0, 0]], dtype=np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, np.eye(3)[None].repeat(2, 0), atol=1e-7)

    def test_log_roundtrip(self):
        w = RNG.normal(size=(64, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * \
            RNG.uniform(0.0, 3.1, size=(64, 1)).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(w))
        w_back = np.asarray(se3.so3_log(R))
        np.testing.assert_allclose(w_back, w, atol=2e-5)

    def test_log_near_pi(self):
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        for theta in (np.pi - 1e-4, np.pi - 1e-6):
            w = (axis * theta).astype(np.float32)
            R = jnp.asarray(Rotation.from_rotvec(w).as_matrix(), dtype=jnp.float32)
            w_back = np.asarray(se3.so3_log(R))
            np.testing.assert_allclose(w_back, w, atol=1e-3)

    def test_log_identity(self):
        w = np.asarray(se3.so3_log(jnp.eye(3)))
        np.testing.assert_allclose(w, 0.0, atol=1e-7)


class TestSE3:
    def test_exp_matches_composition(self):
        xi = random_twists(32)
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        # Rotation part must equal so3_exp of omega.
        R_ref = Rotation.from_rotvec(xi[:, 3:]).as_matrix()
        np.testing.assert_allclose(T[:, :3, :3], R_ref, atol=2e-6)
        # Bottom row.
        np.testing.assert_allclose(T[:, 3], [[0, 0, 0, 1]] * 32, atol=0)

    def test_log_roundtrip(self):
        xi = random_twists(64)
        # Keep |omega| < pi for unique log.
        nrm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 3.0 / np.maximum(nrm, 1e-9))
        T = se3.se3_exp(jnp.asarray(xi))
        xi_back = np.asarray(se3.se3_log(T))
        np.testing.assert_allclose(xi_back, xi, atol=3e-4, rtol=1e-4)

    def test_exp_zero(self):
        T = np.asarray(se3.se3_exp(jnp.zeros(6)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-7)

    def test_pure_translation(self):
        xi = np.array([1.0, -2.0, 3.0, 0, 0, 0], dtype=np.float32)
        T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
        np.testing.assert_allclose(T[:3, 3], xi[:3], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_inverse(self):
        xi = random_twists(16)
        T = se3.se3_exp(jnp.asarray(xi))
        eye = np.asarray(T @ se3.inverse(T))
        np.testing.assert_allclose(eye, np.eye(4)[None].repeat(16, 0), atol=1e-5)

    def test_apply(self):
        xi = random_twists(1)[0]
        T = se3.se3_exp(jnp.asarray(xi))
        pts = RNG.normal(size=(10, 3)).astype(np.float32)
        out = np.asarray(se3.apply(T, jnp.asarray(pts)))
        Tn = np.asarray(T)
        ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_quaternion_roundtrip(self):
        xi = random_twists(32)
        T = se3.se3_exp(jnp.asarray(xi))
        q = se3.to_quaternion(T)
        # scipy comparison (scipy uses xyzw order, same as ours)
        q_ref = Rotation.from_matrix(np.asarray(T)[:, :3, :3]).as_quat()
        q_np = np.asarray(q)
        # quaternions are double covers: fix sign
        sign = np.sign(np.sum(q_np * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q_np * sign, q_ref, atol=1e-5)
        # and back
        T_back = np.asarray(se3.from_quaternion(q, T[..., :3, 3]))
        np.testing.assert_allclose(T_back, np.asarray(T), atol=1e-5)

    def test_rotation_angle(self):
        w = np.array([0.3, -0.2, 0.9], dtype=np.float32)
        T = se3.se3_exp(jnp.concatenate([jnp.zeros(3), jnp.asarray(w)]))
        angle = float(se3.rotation_angle(T))
        assert angle == pytest.approx(np.linalg.norm(w), abs=1e-5)


class TestFloat32SmallAngleStability:
    """Regression: f32 cancellation at small-but-not-tiny rotations.

    1 - cos(t) is EXACTLY 0.0 in float32 for t < ~3.4e-4, which made
    se3_log's V-inverse divide by zero and return NaN translation for
    near-straight motion (|w| ~ 1e-4 rad happens every few dozen frames of
    real wheel odometry).  The NaN then voided the whole frame's deskew AND
    flipped the stationary gate to 'skip', silently dropping real motion.
    """

    def test_log_finite_and_exact_across_angles(self):
        rng = np.random.default_rng(0)
        for theta in [0.0, 1e-7, 1e-5, 1.6e-4, 1e-3, 1e-2, 0.1, 0.4, 0.6,
                      1.5, 3.0]:
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            t = rng.normal(size=3) * 0.5
            T64 = np.eye(4)
            T64[:3, :3] = _scipy_rotation(axis * theta)
            T64[:3, 3] = t
            xi = np.asarray(se3.se3_log(jnp.asarray(T64, jnp.float32)),
                            np.float64)
            assert np.isfinite(xi).all(), (theta, xi)
            # round trip through exp recovers the transform to f32 accuracy
            back = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)),
                              np.float64)
            np.testing.assert_allclose(back, T64, atol=5e-6)

    def test_motion_model_small_yaw(self):
        from kinematic_icp_tpu.ops import motion_model
        for theta in [1e-6, 1e-4, 3e-4, 1e-3, 1e-2]:
            d = np.asarray(motion_model.motion_model(
                jnp.asarray([0.5, theta], jnp.float32)), np.float64)
            assert np.isfinite(d).all()
            # reference semantics (Registration.cpp:159-167): the twist's
            # v_y = rho (1-cos)/theta ~ rho theta/2 plus V's theta/2 v_x
            # term gives final lateral displacement ~ rho * theta.
            np.testing.assert_allclose(d[1, 3], 0.5 * theta,
                                       rtol=1e-3, atol=1e-10)

    def test_deskew_finite_near_straight_motion(self):
        from kinematic_icp_tpu.ops import preprocessing
        from kinematic_icp_tpu.ops.points import P3
        rng = np.random.default_rng(1)
        pts = P3.from_array(jnp.asarray(
            rng.uniform(-30, 30, (256, 3)).astype(np.float32)))
        ts = jnp.asarray(np.linspace(0, 1, 256, dtype=np.float32))
        # near-straight motion: 0.5 m forward, 1.6e-4 rad yaw
        rel = np.asarray(se3.se3_exp(jnp.asarray(
            [0.5, 0.0, 0.0, 0.0, 0.0, 1.6e-4], jnp.float64)))
        out = preprocessing.deskew(pts, ts, jnp.asarray(rel, jnp.float32),
                                   jnp.bool_(True))
        arr = np.asarray(out.to_array())
        assert np.isfinite(arr).all()
        # the scan-end points (ts=1) are unmoved; scan-start moved ~0.5 m
        np.testing.assert_allclose(arr[-1], np.asarray(pts.to_array())[-1],
                                   atol=1e-5)
        shift = np.linalg.norm(arr[0] - np.asarray(pts.to_array())[0])
        assert 0.45 < shift < 0.55


def _scipy_rotation(rotvec):
    from scipy.spatial.transform import Rotation
    return Rotation.from_rotvec(rotvec).as_matrix()
