"""Tests for deskew + range filtering against a float64 numpy reference."""

import jax.numpy as jnp
import numpy as np

from kinematic_icp_tpu.ops import preprocessing, se3
from kinematic_icp_tpu.ops.points import P3


def deskew_arr(pts, ts, motion, enable):
    out = preprocessing.deskew(P3.from_array(jnp.asarray(pts)),
                               jnp.asarray(ts), motion, jnp.bool_(enable))
    return np.asarray(out.to_array())


def range_mask_arr(pts, mask, mn, mx):
    return np.asarray(preprocessing.range_filter_mask(
        P3.from_array(jnp.asarray(pts)), jnp.asarray(mask), mn, mx))

RNG = np.random.default_rng(2)


def numpy_se3_exp(xi):
    from scipy.linalg import expm
    W = np.array([[0, -xi[5], xi[4], xi[0]],
                  [xi[5], 0, -xi[3], xi[1]],
                  [-xi[4], xi[3], 0, xi[2]],
                  [0, 0, 0, 0]])
    return expm(W)


class TestDeskew:
    def test_zero_motion_is_identity(self):
        pts = RNG.normal(size=(100, 3)).astype(np.float32) * 10
        ts = RNG.uniform(0, 1, size=100).astype(np.float32)
        out = deskew_arr(pts, ts, jnp.eye(4), True)
        np.testing.assert_allclose(out, pts, atol=1e-6)

    def test_disabled_passthrough(self):
        pts = RNG.normal(size=(50, 3)).astype(np.float32)
        ts = RNG.uniform(0, 1, size=50).astype(np.float32)
        motion = se3.se3_exp(jnp.array([1.0, 0.5, 0, 0, 0, 0.3], jnp.float32))
        out = deskew_arr(pts, ts, motion, False)
        np.testing.assert_allclose(out, pts, atol=1e-6)

    def test_scan_end_anchor(self):
        # tau == 1 points stay fixed (scan unwarped to the end pose).
        pts = RNG.normal(size=(10, 3)).astype(np.float32) * 5
        ts = np.ones(10, dtype=np.float32)
        motion = se3.se3_exp(jnp.array([0.8, 0.1, 0, 0, 0, 0.2], jnp.float32))
        out = deskew_arr(pts, ts, motion, True)
        np.testing.assert_allclose(out, pts, atol=1e-5)

    def test_scan_start_gets_inverse_motion(self):
        # tau == 0 points are mapped by exp(-omega) = motion^-1.
        pts = RNG.normal(size=(10, 3)).astype(np.float32) * 5
        ts = np.zeros(10, dtype=np.float32)
        xi = np.array([0.8, 0.1, 0, 0, 0, 0.2], dtype=np.float32)
        motion = se3.se3_exp(jnp.asarray(xi))
        out = deskew_arr(pts, ts, motion, True)
        Minv = np.linalg.inv(numpy_se3_exp(xi.astype(np.float64)))
        ref = pts @ Minv[:3, :3].T + Minv[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_interpolation_against_expm(self):
        pts = RNG.normal(size=(32, 3)).astype(np.float32) * 8
        ts = RNG.uniform(0, 1, size=32).astype(np.float32)
        xi = np.array([0.5, -0.2, 0.05, 0.01, -0.02, 0.4], dtype=np.float32)
        motion = se3.se3_exp(jnp.asarray(xi))
        out = deskew_arr(pts, ts, motion, True)
        for i in range(32):
            M = numpy_se3_exp((ts[i] - 1.0) * xi.astype(np.float64))
            ref = M[:3, :3] @ pts[i] + M[:3, 3]
            np.testing.assert_allclose(out[i], ref, atol=1e-4)


class TestRangeFilter:
    def test_basic(self):
        pts = np.array([[0.5, 0, 0], [5, 0, 0], [150, 0, 0], [0, 0, 0]],
                       dtype=np.float32)
        mask = np.ones(4, bool)
        out = range_mask_arr(pts, mask, 1.0, 100.0)
        np.testing.assert_array_equal(out, [False, True, False, False])

    def test_nan_dropped(self):
        pts = np.array([[np.nan, 0, 0], [5, 0, 0]], dtype=np.float32)
        out = range_mask_arr(pts, np.ones(2, bool), 0.0, 100.0)
        np.testing.assert_array_equal(out, [False, True])

    def test_strict_bounds(self):
        pts = np.array([[100.0, 0, 0], [1.0, 0, 0]], dtype=np.float32)
        out = range_mask_arr(pts, np.ones(2, bool), 1.0, 100.0)
        # strict < and > like KISS-ICP
        np.testing.assert_array_equal(out, [False, False])

    def test_respects_input_mask(self):
        pts = np.tile(np.array([[5.0, 0, 0]], np.float32), (3, 1))
        mask = np.array([True, False, True])
        out = range_mask_arr(pts, mask, 0.0, 100.0)
        np.testing.assert_array_equal(out, [True, False, True])
