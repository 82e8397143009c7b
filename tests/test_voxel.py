"""Tests for voxelization / downsampling vs a dict-based numpy oracle."""

import jax.numpy as jnp
import numpy as np

from kinematic_icp_tpu.ops import voxel
from kinematic_icp_tpu.ops.points import P3


def downsample_arr(pts, mask, vs, out_size):
    out, out_mask, _ = voxel.voxel_downsample(
        P3.from_array(jnp.asarray(pts)), jnp.asarray(mask), vs, out_size)
    return np.asarray(out.to_array()), np.asarray(out_mask)

RNG = np.random.default_rng(3)


def oracle_downsample(points, voxel_size):
    """First-point-per-voxel via insertion-ordered dict (robin_map analog)."""
    grid = {}
    for p in points:
        key = tuple(np.floor(p / voxel_size).astype(np.int64))
        if key not in grid:
            grid[key] = p
    return np.array(list(grid.values())) if grid else np.zeros((0, 3))


def as_set(points, decimals=4):
    return {tuple(np.round(np.asarray(p, np.float64), decimals)) for p in points}


class TestVoxelCoords:
    def test_floor_semantics(self):
        pts = jnp.array([[0.5, -0.5, 1.0], [-0.01, 0.0, 2.49]])
        out = np.asarray(voxel.voxel_coords(pts, 1.0))
        np.testing.assert_array_equal(out, [[0, -1, 1], [-1, 0, 2]])

    def test_hash_matches_kiss_icp_constants(self):
        coords = jnp.array([[1, 2, 3]], dtype=jnp.int32)
        h = int(np.asarray(voxel.spatial_hash(coords))[0])
        expected = ((1 * 73856093) ^ (2 * 19349669) ^ (3 * 83492791)) % (1 << 32)
        assert h == expected

    def test_hash_negative_coords(self):
        coords = jnp.array([[-5, -1, 7]], dtype=jnp.int32)
        h = int(np.asarray(voxel.spatial_hash(coords))[0])
        x, y, z = np.uint32(-5 % (1 << 32)), np.uint32(-1 % (1 << 32)), np.uint32(7)
        expected = int((x * np.uint32(73856093)) ^ (y * np.uint32(19349669))
                       ^ (z * np.uint32(83492791)))
        assert h == expected


class TestVoxelDownsample:
    def test_matches_oracle_set(self):
        pts = RNG.uniform(-20, 20, size=(500, 3)).astype(np.float32)
        mask = np.ones(500, bool)
        out, out_mask = downsample_arr(pts, mask, 1.0, 512)
        ours = out[out_mask]
        ref = oracle_downsample(pts.astype(np.float64), 1.0)
        assert len(ours) == len(ref)
        assert as_set(ours) == as_set(ref)

    def test_first_point_wins(self):
        pts = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9], [0.2, 0.2, 0.2]],
                       dtype=np.float32)
        out, out_mask = downsample_arr(pts, np.ones(3, bool), 1.0, 8)
        kept = out[out_mask]
        assert len(kept) == 1
        np.testing.assert_allclose(kept[0], [0.1, 0.1, 0.1])

    def test_masked_points_ignored(self):
        pts = np.array([[0.1, 0.1, 0.1], [5.1, 5.1, 5.1]], dtype=np.float32)
        mask = np.array([False, True])
        out, out_mask = downsample_arr(pts, mask, 1.0, 8)
        kept = out[out_mask]
        assert len(kept) == 1
        np.testing.assert_allclose(kept[0], [5.1, 5.1, 5.1])

    def test_empty_input(self):
        pts = np.zeros((16, 3), np.float32)
        out, out_mask = downsample_arr(pts, np.zeros(16, bool), 1.0, 8)
        assert not np.any(out_mask)

    def test_overflow_drops_excess_and_counts(self):
        pts = (np.arange(32, dtype=np.float32)[:, None]
               * np.array([[1.0, 0, 0]], np.float32)) * 2.0
        out, out_mask, dropped = voxel.voxel_downsample(
            P3.from_array(jnp.asarray(pts)), jnp.ones(32, bool), 1.0, 8)
        assert np.asarray(out_mask).sum() == 8
        assert int(dropped) == 32 - 8  # every point its own voxel

    def test_no_overflow_reports_zero(self):
        pts = RNG.uniform(-4, 4, size=(64, 3)).astype(np.float32)
        _, _, dropped = voxel.voxel_downsample(
            P3.from_array(jnp.asarray(pts)), jnp.ones(64, bool), 1.0, 512)
        assert int(dropped) == 0

    def test_negative_coords(self):
        pts = np.array([[-0.5, -0.5, -0.5], [-0.6, -0.6, -0.6],
                        [0.5, 0.5, 0.5]], dtype=np.float32)
        out, out_mask = downsample_arr(pts, np.ones(3, bool), 1.0, 8)
        kept = out[out_mask]
        assert len(kept) == 2

    def test_packed_word_path_matches_oracle(self):
        # Wide-enough input to engage the quantized-payload sort path
        # (voxel.PACKED_WORD_MIN_N); first-point-wins must hold exactly and
        # the representative must be the oracle's point to within the
        # documented half-bin quantization (voxel_size / 2048 per axis).
        n = voxel.PACKED_WORD_MIN_N
        vs = 0.5
        pts = RNG.uniform(-30, 30, size=(n, 3)).astype(np.float32)
        # inject duplicates-in-voxel with a known first occurrence
        pts[1000] = [10.26, 10.26, 10.26]
        pts[20000] = [10.24, 10.24, 10.24]  # same 0.5-voxel, later index
        mask = np.ones(n, bool)
        out, out_mask, dropped = voxel.voxel_downsample(
            P3.from_array(jnp.asarray(pts)), jnp.asarray(mask), vs,
            n, max_extent=120.0)
        ours = np.asarray(out.to_array())[np.asarray(out_mask)]
        ref = oracle_downsample(pts.astype(np.float64), vs)
        assert int(dropped) == 0
        assert len(ours) == len(ref)
        # voxel sets identical
        vox = lambda a: {tuple(v) for v in np.floor(a / vs).astype(np.int64)}
        assert vox(ours) == vox(ref)
        # representatives match the oracle's first point to the half-bin
        by_vox = {tuple(np.floor(p / vs).astype(np.int64)): p for p in ref}
        tol = vs / 2048 + 1e-5
        for q in ours:
            r = by_vox[tuple(np.floor(q.astype(np.float64) / vs)
                             .astype(np.int64))]
            assert np.all(np.abs(q - r) <= tol), (q, r)

    def test_min_tiebreak_permutation_invariant(self):
        n = voxel.PACKED_WORD_MIN_N
        vs = 0.5
        pts = RNG.uniform(-30, 30, size=(n, 3)).astype(np.float32)
        mask = jnp.ones(n, bool)

        def run(p):
            out, m, _ = voxel.voxel_downsample(
                P3.from_array(jnp.asarray(p)), mask, vs, n,
                max_extent=120.0, tiebreak="min")
            return np.asarray(out.to_array())[np.asarray(m)]

        a = run(pts)
        perm = np.random.default_rng(1).permutation(n)
        b = run(pts[perm])
        # same representatives regardless of input order (sorted compare)
        assert as_set(a) == as_set(b)
        # same voxel set as the oracle
        ref = oracle_downsample(pts.astype(np.float64), vs)
        vox = lambda x: {tuple(v) for v in np.floor(x / vs).astype(np.int64)}
        assert vox(a) == vox(ref)

    def test_double_downsample_counts(self):
        pts = RNG.uniform(-30, 30, size=(2000, 3)).astype(np.float32)
        mask = np.ones(2000, bool)
        src, src_m, ds, ds_m, _ = voxel.double_downsample(
            P3.from_array(jnp.asarray(pts)), jnp.asarray(mask), 1.0,
            max_downsampled=2048, max_source=2048)
        src = src.to_array()
        ds_ref = oracle_downsample(pts.astype(np.float64), 0.5)
        src_ref = oracle_downsample(ds_ref, 1.5)
        assert int(np.asarray(ds_m).sum()) == len(ds_ref)
        # source derives from our (voxel-ordered) frame_downsample, whose
        # first-point-per-voxel differs from oracle insertion order at 1.5vs;
        # counts can differ by a hair, sets of occupied voxels must match.
        src_vox = {tuple(v) for v in np.floor(
            np.asarray(src)[np.asarray(src_m)] / 1.5).astype(np.int64)}
        ref_vox = {tuple(v) for v in np.floor(src_ref / 1.5).astype(np.int64)}
        assert src_vox == ref_vox
