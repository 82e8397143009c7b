"""Planar (structure-of-arrays) point sets.

TPU arrays are tiled (sublane x 128-lane); a point cloud stored as (N, 3)
puts 3 in the lane dimension and wastes ~42x of every vector op's bandwidth.
All device-side point data therefore lives as three flat planes
(x, y, z) — dense 1D layouts that gather/scatter at HBM roofline.  The
(N, 3) form exists only at the host boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class P3(NamedTuple):
    """A planar point set: three same-shape arrays (usually 1D)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @staticmethod
    def from_array(points):
        """(..., 3) -> P3 of (...,) planes (host-boundary conversion)."""
        points = jnp.asarray(points)
        return P3(points[..., 0], points[..., 1], points[..., 2])

    def to_array(self):
        """P3 -> (..., 3) (host-boundary conversion)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    @property
    def shape(self):
        return self.x.shape

    @property
    def dtype(self):
        return self.x.dtype

    def astype(self, dtype):
        return P3(self.x.astype(dtype), self.y.astype(dtype),
                  self.z.astype(dtype))

    def __getitem__(self, idx):
        # NamedTuple defines tuple indexing; integer 0/1/2 keeps that
        # meaning, everything else indexes the planes.
        if isinstance(idx, int):
            return tuple.__getitem__(self, idx)
        return P3(self.x[idx], self.y[idx], self.z[idx])


def transform(pose, p: P3) -> P3:
    """Apply a (4, 4) rigid transform to planar points."""
    R = pose[:3, :3]
    t = pose[:3, 3]
    return P3(
        R[0, 0] * p.x + R[0, 1] * p.y + R[0, 2] * p.z + t[0],
        R[1, 0] * p.x + R[1, 1] * p.y + R[1, 2] * p.z + t[1],
        R[2, 0] * p.x + R[2, 1] * p.y + R[2, 2] * p.z + t[2],
    )


def norm2(p: P3):
    return p.x * p.x + p.y * p.y + p.z * p.z


def norm(p: P3):
    return jnp.sqrt(norm2(p))


def sub(a: P3, b: P3) -> P3:
    return P3(a.x - b.x, a.y - b.y, a.z - b.z)


def dot(a: P3, b: P3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def where(cond, a: P3, b: P3) -> P3:
    return P3(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y),
              jnp.where(cond, a.z, b.z))


def zeros_like(p: P3) -> P3:
    return P3(jnp.zeros_like(p.x), jnp.zeros_like(p.y), jnp.zeros_like(p.z))
