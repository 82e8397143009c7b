"""Unicycle (2-DoF) kinematic motion model.

Maps the integrated controls ``(rho, theta)`` — forward displacement and yaw
change — to an SE(3) perturbation, matching the reference's ``motion_model``
lambda (/root/reference/cpp/kinematic_icp/registration/Registration.cpp:159-167):

    dx = (rho * sin(theta)/theta, rho * (1 - cos(theta))/theta, 0, 0, 0, theta)
    delta = SE3::exp(dx)

The reference divides by ``theta + DBL_MIN`` which is the un-smoothed sinc; we
use the mathematically equivalent stable sinc expansions (the difference is
only at exactly theta == 0 where the reference degenerates to 0 displacement —
a measure-zero artifact we deliberately do not replicate).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3

_SMALL = 1e-6


def control_to_twist(controls):
    """(..., 2) (rho, theta) -> (..., 6) se(3) tangent (v, w)."""
    rho = controls[..., 0]
    theta = controls[..., 1]
    t2 = theta * theta
    small = jnp.abs(theta) < _SMALL
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    # (1 - cos t)/t via the cancellation-free 2 sin^2(t/2)/t: the naive form
    # is exactly 0 in f32 for |t| < ~3.4e-4 (and noise-dominated well past
    # that), which would bias the lateral displacement on near-straight
    # motion.
    sh = jnp.sin(0.5 * safe_theta)
    verc = jnp.where(small, theta / 2.0 - t2 * theta / 24.0,
                     2.0 * sh * sh / safe_theta)
    zeros = jnp.zeros_like(rho)
    return jnp.stack([rho * sinc, rho * verc, zeros, zeros, zeros, theta], axis=-1)


def motion_model(controls):
    """(..., 2) (rho, theta) -> (..., 4, 4) SE(3) delta transform."""
    return se3.se3_exp(control_to_twist(controls))
