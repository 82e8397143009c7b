"""Tests for the single-transfer frame upload codec (utils/packing.py)."""

import numpy as np
import pytest

import jax

from kinematic_icp_tpu.utils import packing


def _roundtrip(points, ts, rel, bucket, codec):
    buf, n = packing.pack_frame(points, ts, rel, bucket, codec)
    assert buf.dtype == np.uint16
    assert buf.shape == (packing.packed_words(bucket, codec),)
    out = jax.jit(
        lambda b: packing.unpack_frame(b, bucket, codec))(buf)
    return [np.asarray(x) for x in out], n


class TestF32Codec:
    def test_bitwise_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-60, 60, (1000, 3)).astype(np.float32)
        ts = rng.uniform(0, 1, 1000).astype(np.float32)
        rel = np.eye(4) + rng.normal(0, 0.01, (4, 4))
        (up, uts, mask, has_ts, urel), n = _roundtrip(pts, ts, rel, 1024,
                                                      "f32")
        assert n == 1000
        np.testing.assert_array_equal(up[:1000], pts)       # bit-exact
        np.testing.assert_array_equal(uts[:1000], ts)
        np.testing.assert_array_equal(up[1000:], 0.0)       # zero padding
        np.testing.assert_array_equal(uts[1000:], 0.0)
        np.testing.assert_array_equal(mask, np.arange(1024) < 1000)
        assert bool(has_ts)
        np.testing.assert_array_equal(urel, rel.astype(np.float32))

    def test_no_timestamps_and_truncation(self):
        pts = np.ones((300, 3), np.float32)
        (up, uts, mask, has_ts, _), n = _roundtrip(pts, None, np.eye(4),
                                                   256, "f32")
        assert n == 256  # truncated to bucket
        assert not bool(has_ts)
        assert mask.sum() == 256
        np.testing.assert_array_equal(uts, 0.0)

    def test_empty_frame(self):
        (up, uts, mask, has_ts, _), n = _roundtrip(
            np.zeros((0, 3), np.float32), None, np.eye(4), 64, "f32")
        assert n == 0 and mask.sum() == 0 and not bool(has_ts)

    def test_special_float_bits_survive(self):
        # bitcast path must not canonicalize payloads
        pts = np.array([[np.float32(1e-40), -0.0, 3.14]], np.float32).repeat(
            4, axis=0)
        (up, _, _, _, _), _ = _roundtrip(pts, None, np.eye(4), 4, "f32")
        np.testing.assert_array_equal(
            up.view(np.uint32), pts.view(np.uint32))


class TestU16Codec:
    def test_quantization_error_bound(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-60, 60, (4000, 3)).astype(np.float32)
        ts = rng.uniform(0, 1, 4000).astype(np.float32)
        (up, uts, mask, has_ts, _), n = _roundtrip(pts, ts, np.eye(4),
                                                   4096, "u16")
        assert n == 4000 and bool(has_ts)
        span = pts.max(axis=0) - pts.min(axis=0)
        # half a quantization step plus a few ulps of f32 decode arithmetic
        bound = span / 65535.0 * 0.5 + np.abs(pts).max() * 4 * 2.0 ** -23
        err = np.abs(up[:4000] - pts)
        assert (err <= bound[None, :]).all(), err.max(axis=0)
        assert np.abs(uts[:4000] - ts).max() <= 0.5001 / 65535.0

    def test_halves_the_bytes(self):
        hdr = 2 * packing.HEADER_WORDS
        assert packing.packed_bytes(65536, "u16") == hdr + 8 * 65536
        assert packing.packed_bytes(65536, "f32") == hdr + 16 * 65536

    def test_degenerate_extent(self):
        pts = np.full((10, 3), 7.25, np.float32)  # zero span
        (up, _, mask, _, _), n = _roundtrip(pts, None, np.eye(4), 16, "u16")
        assert n == 10
        np.testing.assert_allclose(up[:10], 7.25, atol=1e-5)


class TestServerUploadModes:
    """The u16 server trajectory must track the f32 one to sub-voxel ATE."""

    def test_quantized_server_close_to_lossless(self):
        from kinematic_icp_tpu import Config
        from kinematic_icp_tpu.server import LidarOdometryServer
        from kinematic_icp_tpu.utils import synthetic
        from kinematic_icp_tpu.utils.evaluation import ate_rmse

        cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                     map_capacity=1 << 13, max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(12)
        servers = {u: LidarOdometryServer(cfg, extrinsic=seq["extrinsic"],
                                          upload=u)
                   for u in ("f32", "u16")}
        for i, (p, t) in enumerate(seq["frames"]):
            for s in servers.values():
                s.register_frame(p, t, seq["rel_odometry"][i],
                                 stamp=0.1 * (i + 1))
        tra = {u: [p for _, p in s.poses_with_stamps]
               for u, s in servers.items()}
        ate = ate_rmse(tra["f32"], tra["u16"], align=False)
        # ~1 mm input quantization on a 1 m voxel grid: trajectories stay
        # within the reference's own input-sensitivity class (chaos floor
        # is several cm over 100 frames; 12 frames stay well under that).
        assert ate < 0.02, ate
