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

    float32-stable everywhere.  The naive forms are catastrophic in f32 well
    beyond any tiny-theta guard: ``1 - cos(t)`` is EXACTLY 0 for t < ~3.4e-4
    (making B = 0, which turned downstream divisions into NaN and silently
    voided whole frames at near-straight odometry), and ``1 - A`` loses most
    of its bits below t ~ 1e-2.  So B uses the cancellation-free identity
    ``1 - cos t = 2 sin^2(t/2)`` and C a Taylor branch with a generous 0.5
    switch point (truncation error there ~1e-7 relative — below f32 eps).
    """
    t2 = theta * theta
    small = theta < _SMALL
    # Safe denominator: where small, the Taylor branch is taken instead.
    safe_t = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 1.0 - t2 / 6.0 + t2 * t2 / 120.0,
                  jnp.sin(safe_t) / safe_t)
    sh = jnp.sin(0.5 * safe_t) / safe_t                # sin(t/2)/t, exact
    B = jnp.where(small, 0.5 - t2 / 24.0 + t2 * t2 / 720.0, 2.0 * sh * sh)
    C = jnp.where(theta < 0.5,
                  1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
                  (1.0 - A) / jnp.where(theta < 0.5, 1.0, t2))
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


def _rodrigues(wx, wy, wz, A, B):
    """Explicit R = I + A W + B W^2 as 9 scalar planes (fully fusable on TPU).

    Using W^2 = w w^T - theta^2 I, so R_ij = (1 - B theta^2) d_ij
    + B w_i w_j + A W_ij.  Written out componentwise so XLA fuses the whole
    thing into one kernel — a 3x3 ``@`` here would dispatch the MXU and cost
    ~100x more than the arithmetic.
    """
    t2 = wx * wx + wy * wy + wz * wz
    diag = 1.0 - B * t2
    r00 = diag + B * wx * wx
    r11 = diag + B * wy * wy
    r22 = diag + B * wz * wz
    r01 = B * wx * wy - A * wz
    r10 = B * wx * wy + A * wz
    r02 = B * wx * wz + A * wy
    r20 = B * wx * wz - A * wy
    r12 = B * wy * wz - A * wx
    r21 = B * wy * wz + A * wx
    return r00, r01, r02, r10, r11, r12, r20, r21, r22


def _mat3(r00, r01, r02, r10, r11, r12, r20, r21, r22):
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


def so3_exp(w):
    """Rodrigues: (..., 3) rotation vector -> (..., 3, 3) rotation matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    theta = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    A, B, _ = _taylor_coeffs(theta)
    return _mat3(*_rodrigues(wx, wy, wz, A, B))


def _quat_components(R):
    """(..., 3, 3) -> scalar planes (qx, qy, qz, qw), unnormalized sign-fixed.

    Shepperd's method with jnp.where selection (no argmax/take_along_axis —
    those are gathers that break TPU fusion for what is pure arithmetic).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    wq = (0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw)
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    xq = ((m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx)
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    yq = ((m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy)
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    zq = ((m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz)

    # Pick the candidate with the largest pivot, tie-broken in w,x,y,z order.
    use_w = (tr >= m00) & (tr >= m11) & (tr >= m22)
    use_x = ~use_w & (m00 >= m11) & (m00 >= m22)
    use_y = ~use_w & ~use_x & (m11 >= m22)

    def sel(i):
        return jnp.where(use_w, wq[i],
                         jnp.where(use_x, xq[i],
                                   jnp.where(use_y, yq[i], zq[i])))

    qw, qx, qy, qz = sel(0), sel(1), sel(2), sel(3)
    norm = jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    return qx / norm, qy / norm, qz / norm, qw / norm


def _rotvec_components(R):
    """(..., 3, 3) -> scalar planes (wx, wy, wz) of the rotation vector."""
    qx, qy, qz, qw = _quat_components(R)
    # Force qw >= 0 so theta in [0, pi].
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qx, qy, qz, qw = qx * sign, qy * sign, qz * sign, qw * sign
    n = jnp.sqrt(qx * qx + qy * qy + qz * qz)
    small = n < _SMALL
    safe_n = jnp.where(small, jnp.ones_like(n), n)
    safe_w = jnp.maximum(qw, _SMALL)
    theta_by_n = jnp.where(
        small,
        # 2*atan2(n, qw)/n ~ 2/qw - 2 n^2 / (3 qw^3)  for n -> 0
        2.0 / safe_w - 2.0 * n * n / (3.0 * safe_w ** 3),
        2.0 * jnp.arctan2(safe_n, qw) / safe_n,
    )
    return theta_by_n * qx, theta_by_n * qy, theta_by_n * qz


def so3_log(R):
    """(..., 3, 3) rotation matrix -> (..., 3) rotation vector.

    Uniformly stable (including near theta = pi) via the quaternion route:
    q = (qv, qw), rotvec = 2 * atan2(|qv|, qw) * qv/|qv|.
    """
    wx, wy, wz = _rotvec_components(R)
    return jnp.stack([wx, wy, wz], axis=-1)


def se3_exp(xi):
    """(..., 6) twist (v, w) -> (..., 4, 4) homogeneous transform.

    Matches Sophus::SE3d::exp: R = exp(w^), t = V v with the left Jacobian V.
    Fully elementwise (no 3x3 matmuls) so the whole op is one TPU fusion.
    """
    vx, vy, vz = xi[..., 0], xi[..., 1], xi[..., 2]
    wx, wy, wz = xi[..., 3], xi[..., 4], xi[..., 5]
    theta = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    A, B, C = _taylor_coeffs(theta)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = _rodrigues(wx, wy, wz, A, B)
    # V = I + B W + C W^2 — same structure as Rodrigues with (B, C).
    v00, v01, v02, v10, v11, v12, v20, v21, v22 = _rodrigues(wx, wy, wz, B, C)
    tx = v00 * vx + v01 * vy + v02 * vz
    ty = v10 * vx + v11 * vy + v12 * vz
    tz = v20 * vx + v21 * vy + v22 * vz
    one = jnp.ones_like(tx)
    zero = jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([r00, r01, r02, tx], axis=-1),
        jnp.stack([r10, r11, r12, ty], axis=-1),
        jnp.stack([r20, r21, r22, tz], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ], axis=-2)


def se3_log(T):
    """(..., 4, 4) -> (..., 6) twist (v, w). Inverse of se3_exp.

    Fully elementwise: V^{-1} = I - W/2 + coeff W^2 expanded componentwise
    (W^2 = w w^T - theta^2 I), one TPU fusion end to end.
    """
    tx, ty, tz = T[..., 0, 3], T[..., 1, 3], T[..., 2, 3]
    wx, wy, wz = _rotvec_components(T[..., :3, :3])
    t2 = wx * wx + wy * wy + wz * wz
    theta = jnp.sqrt(t2)
    A, B, _ = _taylor_coeffs(theta)
    # coeff = (1 - A/(2B)) / t^2 loses all significance in f32 below
    # theta ~ 0.1 (A, 2B -> 1); the Taylor series 1/12 + t^2/720 + t^4/30240
    # is accurate to < 2e-7 relative at theta = 0.5, so switch generously.
    small = theta < 0.5
    safe_t2 = jnp.where(small, jnp.ones_like(t2), t2)
    coeff = jnp.where(small,
                      1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0,
                      (1.0 - A / (2.0 * B)) / safe_t2)
    # Vinv = (1 - coeff theta^2) I - W/2 + coeff w w^T
    diag = 1.0 - coeff * t2
    i00 = diag + coeff * wx * wx
    i11 = diag + coeff * wy * wy
    i22 = diag + coeff * wz * wz
    i01 = coeff * wx * wy + 0.5 * wz
    i10 = coeff * wx * wy - 0.5 * wz
    i02 = coeff * wx * wz - 0.5 * wy
    i20 = coeff * wx * wz + 0.5 * wy
    i12 = coeff * wy * wz + 0.5 * wx
    i21 = coeff * wy * wz - 0.5 * wx
    vx = i00 * tx + i01 * ty + i02 * tz
    vy = i10 * tx + i11 * ty + i12 * tz
    vz = i20 * tx + i21 * ty + i22 * tz
    return jnp.stack([vx, vy, vz, wx, wy, wz], axis=-1)


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
    """Explicit [R^T, -R^T t] (elementwise — no matmul dispatch)."""
    tx, ty, tz = T[..., 0, 3], T[..., 1, 3], T[..., 2, 3]
    r00, r01, r02 = T[..., 0, 0], T[..., 0, 1], T[..., 0, 2]
    r10, r11, r12 = T[..., 1, 0], T[..., 1, 1], T[..., 1, 2]
    r20, r21, r22 = T[..., 2, 0], T[..., 2, 1], T[..., 2, 2]
    nx = -(r00 * tx + r10 * ty + r20 * tz)
    ny = -(r01 * tx + r11 * ty + r21 * tz)
    nz = -(r02 * tx + r12 * ty + r22 * tz)
    one = jnp.ones_like(tx)
    zero = jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([r00, r10, r20, nx], axis=-1),
        jnp.stack([r01, r11, r21, ny], axis=-1),
        jnp.stack([r02, r12, r22, nz], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ], axis=-2)


def compose44(A, B):
    """Explicit homogeneous 4x4 compose (elementwise; rigid transforms only).

    ``A @ B`` on (4, 4) dispatches the MXU with ~100x the cost of the 36
    multiplies actually needed; pose-graph hot loops should use this.
    """
    a00, a01, a02, atx = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2], A[..., 0, 3]
    a10, a11, a12, aty = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2], A[..., 1, 3]
    a20, a21, a22, atz = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2], A[..., 2, 3]
    b00, b01, b02, btx = B[..., 0, 0], B[..., 0, 1], B[..., 0, 2], B[..., 0, 3]
    b10, b11, b12, bty = B[..., 1, 0], B[..., 1, 1], B[..., 1, 2], B[..., 1, 3]
    b20, b21, b22, btz = B[..., 2, 0], B[..., 2, 1], B[..., 2, 2], B[..., 2, 3]
    one = jnp.ones_like(atx)
    zero = jnp.zeros_like(atx)
    return jnp.stack([
        jnp.stack([a00 * b00 + a01 * b10 + a02 * b20,
                   a00 * b01 + a01 * b11 + a02 * b21,
                   a00 * b02 + a01 * b12 + a02 * b22,
                   a00 * btx + a01 * bty + a02 * btz + atx], axis=-1),
        jnp.stack([a10 * b00 + a11 * b10 + a12 * b20,
                   a10 * b01 + a11 * b11 + a12 * b21,
                   a10 * b02 + a11 * b12 + a12 * b22,
                   a10 * btx + a11 * bty + a12 * btz + aty], axis=-1),
        jnp.stack([a20 * b00 + a21 * b10 + a22 * b20,
                   a20 * b01 + a21 * b11 + a22 * b21,
                   a20 * b02 + a21 * b12 + a22 * b22,
                   a20 * btx + a21 * bty + a22 * btz + atz], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ], axis=-2)


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
    qx, qy, qz, qw = _quat_components(R)
    return jnp.stack([qx, qy, qz, qw], axis=-1)


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
