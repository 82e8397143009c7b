"""ctypes bindings for the native ingestion library (libkicp_io.so).

The device compute path is XLA-compiled native code; these are the native
host-side hot loops of the ingestion layer (PointCloud2 field extraction,
LaserScan projection, bucket padding — the reference's RosUtils/
TimeStampHandler C++ equivalents).  Auto-builds with the in-tree Makefile on
first use when a compiler is available; every caller has a numpy fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("kinematic_icp_tpu.native")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), os.pardir, "native")
_NATIVE_DIR = os.path.normpath(_NATIVE_DIR)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libkicp_io.so")

_lib = None
_lib_attempted = False

_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _try_build() -> bool:
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # no compiler / sandboxed build failure
        log.debug("native build failed: %s", e)
        return False


def get_lib():
    """The loaded library, or None (numpy fallbacks engage)."""
    global _lib, _lib_attempted
    if _lib is not None or _lib_attempted:
        return _lib
    _lib_attempted = True
    if os.environ.get("KINEMATIC_ICP_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        log.warning("could not load %s: %s", _LIB_PATH, e)
        return None
    lib.kicp_extract_pointcloud.restype = ctypes.c_int64
    lib.kicp_extract_pointcloud.argtypes = [
        _u8p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        _f32p, _f32p, _f32p, _f64p]
    lib.kicp_project_laserscan.restype = ctypes.c_int64
    lib.kicp_project_laserscan.argtypes = [
        _f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        _f32p, _f32p, _f32p]
    _lib = lib
    return _lib


def _ptr(arr, typ):
    return arr.ctypes.data_as(typ)


def extract_pointcloud(data: bytes, n_points: int, point_step: int,
                       x_offset: int, y_offset: int, z_offset: int,
                       xyz_dtype: int, t_offset: int = -1, t_dtype: int = 0):
    """Native field extraction; returns (xyz (N,3) f32, t (N,) f64 or None).

    Returns None if the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(data, dtype=np.uint8)
    x = np.empty(n_points, np.float32)
    y = np.empty(n_points, np.float32)
    z = np.empty(n_points, np.float32)
    t = np.empty(n_points, np.float64) if t_offset >= 0 else np.empty(0)
    lib.kicp_extract_pointcloud(
        _ptr(raw, _u8p), n_points, point_step, x_offset, y_offset, z_offset,
        xyz_dtype, t_offset, t_dtype,
        _ptr(x, _f32p), _ptr(y, _f32p), _ptr(z, _f32p), _ptr(t, _f64p))
    xyz = np.stack([x, y, z], axis=-1)
    return xyz, (t if t_offset >= 0 else None)


def project_laserscan(ranges, angle_min: float, angle_increment: float,
                      time_increment: float, range_min: float,
                      range_max: float):
    """Native LaserScan projection; returns (x, y, t) planes or None."""
    lib = get_lib()
    if lib is None:
        return None
    r = np.ascontiguousarray(ranges, np.float32)
    n = len(r)
    x = np.empty(n, np.float32)
    y = np.empty(n, np.float32)
    t = np.empty(n, np.float32)
    m = lib.kicp_project_laserscan(
        _ptr(r, _f32p), n, angle_min, angle_increment, time_increment,
        range_min, range_max, _ptr(x, _f32p), _ptr(y, _f32p), _ptr(t, _f32p))
    return x[:m], y[:m], t[:m]
