"""Tests for the unicycle motion model vs a float64 numpy reference."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from kinematic_icp_tpu.ops import motion_model


def reference_motion_model(rho, theta):
    """Direct transcription of Registration.cpp:159-167 in numpy float64."""
    eps = np.finfo(np.float64).tiny
    dx = np.zeros(6)
    dx[0] = rho * np.sin(theta) / (theta + eps)
    dx[1] = rho * (1.0 - np.cos(theta)) / (theta + eps)
    dx[5] = theta
    # Sophus exp
    w = dx[3:]
    v = dx[:3]
    th = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-10:
        R = np.eye(3) + W
        V = np.eye(3) + W / 2
    else:
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        C = (1 - A) / th**2
        R = np.eye(3) + A * W + B * (W @ W)
        V = np.eye(3) + B * W + C * (W @ W)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


class TestMotionModel:
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        for _ in range(50):
            rho = rng.uniform(-2, 2)
            theta = rng.uniform(-1.5, 1.5)
            ours = np.asarray(motion_model.motion_model(
                jnp.array([rho, theta], dtype=jnp.float32)))
            ref = reference_motion_model(rho, theta)
            np.testing.assert_allclose(ours, ref, atol=2e-6)

    def test_zero_rotation_is_straight_motion(self):
        # theta -> 0: pure forward displacement along x (the reference's
        # exact-zero degeneracy is deliberately not replicated).
        T = np.asarray(motion_model.motion_model(jnp.array([1.5, 0.0])))
        np.testing.assert_allclose(T[:3, 3], [1.5, 0, 0], atol=1e-6)
        np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)

    def test_tiny_rotation_continuity(self):
        T_small = np.asarray(motion_model.motion_model(jnp.array([1.5, 1e-5])))
        T_zero = np.asarray(motion_model.motion_model(jnp.array([1.5, 0.0])))
        np.testing.assert_allclose(T_small, T_zero, atol=1e-4)

    def test_planar_motion(self):
        # Any (rho, theta) yields motion in the z=0 plane with yaw-only rotation.
        T = np.asarray(motion_model.motion_model(jnp.array([2.0, 0.7])))
        assert abs(T[2, 3]) < 1e-6
        rotvec = Rotation.from_matrix(T[:3, :3]).as_rotvec()
        np.testing.assert_allclose(rotvec[:2], 0.0, atol=1e-6)
        assert abs(rotvec[2] - 0.7) < 1e-5

    def test_batched(self):
        controls = jnp.array([[1.0, 0.5], [0.0, 0.0], [-1.0, -0.3]])
        T = np.asarray(motion_model.motion_model(controls))
        assert T.shape == (3, 4, 4)
        for i, (rho, theta) in enumerate(np.asarray(controls)):
            np.testing.assert_allclose(
                T[i], reference_motion_model(rho, theta), atol=2e-6)
