"""Scan preprocessing: motion deskew + range filtering (planar/SoA form).

TPU-native equivalent of ``kiss_icp::Preprocessor`` (KISS-ICP v1.2.0, used at
/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.cpp:56-57).  The
reference deskews with per-point constant-velocity pose interpolation along
``omega = log(relative_motion)``: with normalized per-point times
``tau in [0, 1]`` each point is mapped by ``exp((tau - 1) * omega)`` (unwarp
to the scan-end pose), then range-filters ``min_range < |p| < max_range`` on
the deskewed coordinates.

Because every per-point twist is a *scalar multiple* of one fixed twist
``(v, w)``, the per-point exponential reduces to a fixed-axis Rodrigues
rotation plus a V-matrix translation — three fixed vectors broadcast against
per-point sin/cos — instead of a batch of 4x4 exponentials.  TBB's per-point
parallel_for becomes one fused planar VPU computation.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .points import P3

_SMALL = 1e-6


def _cross(ax, ay, az, b: P3) -> P3:
    """(fixed vector a) x (planar points b)."""
    return P3(ay * b.z - az * b.y, az * b.x - ax * b.z, ax * b.y - ay * b.x)


def deskew(p: P3, timestamps, relative_motion, enable) -> P3:
    """Constant-velocity motion compensation, anchored at scan end.

    Args:
      p: P3 of (N,) raw point planes in the lidar frame.
      timestamps: (N,) per-point times normalized to [0, 1].
      relative_motion: (4, 4) frame-to-frame motion *in the lidar frame*
        (the pipeline conjugates the base-frame odometry by the extrinsic,
        reference KinematicICP.cpp:53-55).
      enable: scalar bool — deskewing active (config flag AND timestamps
        present; reference disables when the timestamp field is missing).

    Returns the deskewed P3.

    Math: per-point transform exp(s_i * xi) with s_i = tau_i - 1 and
    xi = (v, w) = log(relative_motion).  Writing theta = |w|, axis k = w/theta
    and the signed per-point angle a_i = s_i * theta:

      R(a_i) p = p cos a_i + (k x p) sin a_i + k (k . p)(1 - cos a_i)
      t_i      = s_i * [ v + ((1-cos a_i)/a_i) (k x v)
                           + ((a_i - sin a_i)/a_i) (k x (k x v)) ]

    which needs only per-point sin/cos against fixed vectors.
    """
    return deskew_from_twist(p, timestamps, se3.se3_log(relative_motion),
                             enable)


def deskew_from_twist(p: P3, timestamps, xi, enable) -> P3:
    """``deskew`` given the precomputed twist ``xi = log(relative_motion)``.

    The twist is pose-independent per frame, so batch runners hoist its
    computation (extrinsic conjugation + matrix log, ~15 tiny fusions) out
    of the scan body and precompute it vectorized over all frames.
    """
    v = xi[:3]
    w = xi[3:]
    theta = jnp.linalg.norm(w)
    rot_small = theta < _SMALL
    safe_theta = jnp.where(rot_small, 1.0, theta)
    kx_, ky_, kz_ = (w[0] / safe_theta, w[1] / safe_theta, w[2] / safe_theta)

    s = jnp.where(enable, timestamps - 1.0, jnp.zeros_like(timestamps))
    a = s * theta                                       # signed angle planes
    sin_a = jnp.sin(a)
    cos_a = jnp.cos(a)
    one_m_cos = 1.0 - cos_a

    # --- rotation: fixed-axis Rodrigues ------------------------------
    kxp = _cross(kx_, ky_, kz_, p)
    k_dot_p = kx_ * p.x + ky_ * p.y + kz_ * p.z
    rx = p.x * cos_a + kxp.x * sin_a + kx_ * k_dot_p * one_m_cos
    ry = p.y * cos_a + kxp.y * sin_a + ky_ * k_dot_p * one_m_cos
    rz = p.z * cos_a + kxp.z * sin_a + kz_ * k_dot_p * one_m_cos
    # Pure-translation twist: rotation is identity.
    rx = jnp.where(rot_small, p.x, rx)
    ry = jnp.where(rot_small, p.y, ry)
    rz = jnp.where(rot_small, p.z, rz)

    # --- translation: V(a k) (s v) ------------------------------------
    # coefficients (1-cos a)/a and (a - sin a)/a.  Both naive forms are
    # f32-catastrophic far beyond a tiny-angle guard (1-cos a == 0 exactly
    # for |a| < ~3.4e-4; a - sin a keeps ~no bits below |a| ~ 0.1), so
    # (1-cos a)/a uses the exact identity 2 sin^2(a/2)/a and (a - sin a)/a
    # a Taylor branch with a generous 0.1 switch point.
    a2 = a * a
    small_a = jnp.abs(a) < _SMALL
    safe_a = jnp.where(small_a, 1.0, a)
    sin_ha = jnp.sin(0.5 * a)
    c1 = jnp.where(small_a, a * 0.5, 2.0 * sin_ha * sin_ha / safe_a)
    c2 = jnp.where(jnp.abs(a) < 0.1,
                   (a2 / 6.0) * (1.0 - a2 / 20.0),
                   (a - sin_a) / safe_a)
    kxv = jnp.array([ky_ * v[2] - kz_ * v[1],
                     kz_ * v[0] - kx_ * v[2],
                     kx_ * v[1] - ky_ * v[0]])
    kxkxv = jnp.array([ky_ * kxv[2] - kz_ * kxv[1],
                       kz_ * kxv[0] - kx_ * kxv[2],
                       kx_ * kxv[1] - ky_ * kxv[0]])
    tx = s * v[0] + s * (c1 * kxv[0] + c2 * kxkxv[0])
    ty = s * v[1] + s * (c1 * kxv[1] + c2 * kxkxv[1])
    tz = s * v[2] + s * (c1 * kxv[2] + c2 * kxkxv[2])
    # Pure translation: t = s v exactly.
    tx = jnp.where(rot_small, s * v[0], tx)
    ty = jnp.where(rot_small, s * v[1], ty)
    tz = jnp.where(rot_small, s * v[2], tz)

    return P3(rx + tx, ry + ty, rz + tz)


def range_filter_mask(p: P3, mask, min_range: float, max_range: float):
    """Keep ``min_range < |p| < max_range`` (strict, like KISS-ICP).

    NaN coordinates fail both comparisons and are dropped, matching C++
    semantics where NaN norms fail the predicate.
    """
    r2 = p.x * p.x + p.y * p.y + p.z * p.z
    keep = (r2 < max_range * max_range) & (r2 > min_range * min_range)
    return mask & keep


def preprocess(p: P3, timestamps, mask, relative_motion_in_lidar, *,
               min_range: float, max_range: float, deskew_enabled,
               has_timestamps, twist=None):
    """Full Preprocessor::Preprocess equivalent.

    Returns (deskewed P3, mask) with the range filter applied to the
    deskewed coordinates (KISS-ICP v1.2.0 order: deskew first, then filter).
    ``twist``: optional precomputed ``se3_log(relative_motion_in_lidar)``
    (see ``deskew_from_twist``); when given the matrix log is skipped.
    """
    enable = jnp.logical_and(deskew_enabled, has_timestamps)
    if twist is not None:
        out = deskew_from_twist(p, timestamps, twist, enable)
    else:
        out = deskew(p, timestamps, relative_motion_in_lidar, enable)
    new_mask = range_filter_mask(out, mask, min_range, max_range)
    return out, new_mask
