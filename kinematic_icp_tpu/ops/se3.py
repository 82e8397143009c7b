"""Batched SE(3) / SO(3) Lie-group operations in pure jax.numpy.

TPU-native replacement for the Sophus usage in the reference
(/root/reference/cpp/kinematic_icp/registration/Registration.cpp,
 correspondence_threshold/CorrespondenceThreshold.cpp).  Poses are (..., 4, 4)
homogeneous matrices; twists are (..., 6) in Sophus tangent order
``(v_x, v_y, v_z, w_x, w_y, w_z)`` (translation part first).

All functions are dtype-generic (float32 on TPU; float64 in CPU oracle
tests) and fully batched, with small-angle Taylor branches implemented via
``jnp.where`` on *safe* operands so gradients and values stay finite.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-6


def _taylor_coeffs(theta):
    """Return (A, B, C) with A=sin t/t, B=(1-cos t)/t^2, C=(1-A)/t^2.

    Stable for theta -> 0 via 4th-order Taylor expansions.
    """
    t2 = theta * theta
    small = theta < _SMALL
    # Safe denominator: where small, the Taylor branch is taken instead.
    safe_t = jnp.where(small, jnp.ones_like(theta), theta)
    safe_t2 = safe_t * safe_t
    A = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0, jnp.sin(safe_t) / safe_t)
    B = jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0,
                  (1.0 - jnp.cos(safe_t)) / safe_t2)
    C = jnp.where(small, 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
                  (1.0 - A) / safe_t2)
    return A, B, C


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
    ], axis=-2)


def vee(W):
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, _ = _taylor_coeffs(theta)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R):
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Uniformly stable (including near theta = pi) via the quaternion route:
    q = (qv, qw), rotvec = 2 * atan2(|qv|, qw) * qv/|qv|.
    """
    q = _rotation_to_quaternion(R)
    qv, qw = q[..., :3], q[..., 3]
    # Force qw >= 0 so theta in [0, pi].
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign[..., None]
    qw = qw * sign
    n = jnp.linalg.norm(qv, axis=-1)
    small = n < _SMALL
    safe_n = jnp.where(small, jnp.ones_like(n), n)
    theta_by_n = jnp.where(
        small,
        # 2*atan2(n, qw)/n ~ 2/qw - 2 n^2 / (3 qw^3)  for n -> 0
        2.0 / jnp.maximum(qw, _SMALL) - 2.0 * n * n / (3.0 * jnp.maximum(qw, _SMALL) ** 3),
        2.0 * jnp.arctan2(safe_n, qw) / safe_n,
    )
    return theta_by_n[..., None] * qv


def se3_exp(xi):
    """(..., 6) twist (v, w) -> (..., 4, 4) homogeneous transform.

    Matches Sophus::SE3d::exp: R = exp(w^), t = V v with the left Jacobian V.
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, C = _taylor_coeffs(theta)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = (V @ v[..., None])[..., 0]
    return from_rt(R, t)


def se3_log(T):
    """(..., 4, 4) -> (..., 6) twist (v, w). Inverse of se3_exp."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta = jnp.linalg.norm(w, axis=-1)
    A, B, _ = _taylor_coeffs(theta)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    t2 = theta * theta
    small = theta < _SMALL
    safe_t2 = jnp.where(small, jnp.ones_like(t2), t2)
    coeff = jnp.where(small, 1.0 / 12.0 + t2 / 720.0,
                      (1.0 - A / (2.0 * B)) / safe_t2)
    Vinv = eye - 0.5 * W + coeff[..., None, None] * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def from_rt(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32, batch_shape=()):
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch_shape + (4, 4))


def inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A, B):
    return A @ B


def apply(T, points):
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotation_angle(T):
    """|theta| of the rotation part; mirrors so3().logAndTheta().theta magnitude."""
    trace = T[..., 0, 0] + T[..., 1, 1] + T[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def to_quaternion(T):
    """(..., 4, 4) -> (..., 4) quaternion (qx, qy, qz, qw), TUM order."""
    return _rotation_to_quaternion(T[..., :3, :3])


def _rotation_to_quaternion(R):
    """(..., 3, 3) -> (..., 4) (qx, qy, qz, qw). Shepperd's method, branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate solutions, each stable in a different region.
    def cand_w():
        s = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([cand_w(), cand_x(), cand_y(), cand_z()], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_quaternion(q, t=None):
    """(qx, qy, qz, qw) [+ translation] -> (..., 4, 4)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    if t is None:
        t = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype)
    return from_rt(R, t)
