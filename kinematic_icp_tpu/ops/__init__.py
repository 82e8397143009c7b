"""Device compute kernels: geometry, preprocessing, map, registration."""

from . import hashmap, motion_model, preprocessing, registration, se3, threshold, voxel

__all__ = [
    "hashmap", "motion_model", "preprocessing", "registration", "se3",
    "threshold", "voxel",
]
