"""Tests for the device voxel hash map vs brute-force / dict oracles."""

import jax.numpy as jnp
import numpy as np

from kinematic_icp_tpu.ops import hashmap
from kinematic_icp_tpu.ops.points import P3


def nn_arr(m, queries, mask, vs, P):
    nn, d = hashmap.nearest_neighbor(
        m, P3.from_array(jnp.asarray(queries, jnp.float32)),
        jnp.asarray(mask), vs, P)
    return np.asarray(nn.to_array()), np.asarray(d)

RNG = np.random.default_rng(4)

CAP = 1 << 12
K = 5
VS = 1.0
P = 8


def make_map():
    return hashmap.empty(CAP, K, bucket_slots=P)


def insert(m, pts, mask=None):
    pts = np.asarray(pts, np.float32)
    if mask is None:
        mask = np.ones(len(pts), bool)
    return hashmap.insert(m, P3.from_array(jnp.asarray(pts)),
                          jnp.asarray(mask), VS, P)


def oracle_map(point_batches, k=K, vs=VS):
    """Dict-based voxel map with first-come-kept blocks."""
    grid = {}
    for batch in point_batches:
        for p in batch:
            key = tuple(np.floor(np.asarray(p, np.float64) / vs).astype(np.int64))
            block = grid.setdefault(key, [])
            if len(block) < k:
                block.append(np.asarray(p, np.float64))
    return grid


def oracle_nn(grid, q, vs=VS):
    """27-neighborhood closest neighbor."""
    kq = np.floor(np.asarray(q, np.float64) / vs).astype(np.int64)
    best, best_d = None, np.inf
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                for p in grid.get((kq[0] + dx, kq[1] + dy, kq[2] + dz), []):
                    d = np.linalg.norm(p - q)
                    if d < best_d:
                        best, best_d = p, d
    return best, best_d


class TestInsert:
    def test_basic_insert_and_count(self):
        m = insert(make_map(), [[0.5, 0.5, 0.5], [1.5, 0.5, 0.5]])
        assert int(hashmap.num_voxels(m)) == 2
        assert int(jnp.sum(hashmap.slot_counts(m))) == 2

    def test_block_capacity_first_come_kept(self):
        pts = np.tile([[0.5, 0.5, 0.5]], (K + 3, 1)) + \
            RNG.uniform(0, 0.4, size=(K + 3, 3))
        m = insert(make_map(), pts)
        assert int(hashmap.num_voxels(m)) == 1
        assert int(jnp.sum(hashmap.slot_counts(m))) == K
        # the first K points (input order) must be the stored ones
        # (packed 10-bit offsets => ~1 mm quantization)
        cloud, cmask = hashmap.pointcloud(m, VS)
        stored = np.asarray(cloud.to_array())[np.asarray(cmask)]
        ref = np.sort(pts[:K], axis=0)
        np.testing.assert_allclose(np.sort(stored, axis=0), ref, atol=2e-3)

    def test_incremental_append(self):
        m = insert(make_map(), [[0.1, 0.1, 0.1]])
        m = insert(m, [[0.2, 0.2, 0.2], [0.3, 0.3, 0.3]])
        assert int(hashmap.num_voxels(m)) == 1
        assert int(jnp.sum(hashmap.slot_counts(m))) == 3

    def test_masked_points_skipped(self):
        m = insert(make_map(), [[0.1, 0.1, 0.1], [5.5, 5.5, 5.5]],
                   mask=np.array([True, False]))
        assert int(hashmap.num_voxels(m)) == 1

    def test_many_random_matches_oracle(self):
        pts = RNG.uniform(-15, 15, size=(800, 3))
        m = insert(make_map(), pts)
        ref = oracle_map([pts])
        assert int(hashmap.num_voxels(m)) == len(ref)
        assert int(jnp.sum(hashmap.slot_counts(m))) == sum(len(b) for b in ref.values())

    def test_is_empty(self):
        m = make_map()
        assert bool(hashmap.is_empty(m))
        m = insert(m, [[0.5, 0.5, 0.5]])
        assert not bool(hashmap.is_empty(m))
        assert bool(hashmap.is_empty(hashmap.clear(m)))


class TestNearestNeighbor:
    def test_exact_match(self):
        m = insert(make_map(), [[0.5, 0.5, 0.5]])
        nn, d = nn_arr(m, [[0.5, 0.5, 0.5]], [True], VS, P)
        assert float(d[0]) < 2e-3

    def test_neighboring_voxel(self):
        m = insert(make_map(), [[1.1, 0.5, 0.5]])
        nn, d = nn_arr(m, [[0.9, 0.5, 0.5]], [True], VS, P)
        assert abs(float(d[0]) - 0.2) < 2e-3
        np.testing.assert_allclose(nn[0], [1.1, 0.5, 0.5], atol=2e-3)

    def test_outside_neighborhood_returns_inf(self):
        m = insert(make_map(), [[10.5, 10.5, 10.5]])
        _, d = nn_arr(m, [[0.5, 0.5, 0.5]], [True], VS, P)
        assert np.isinf(float(d[0]))

    def test_masked_query_inf(self):
        m = insert(make_map(), [[0.5, 0.5, 0.5]])
        _, d = nn_arr(m, [[0.5, 0.5, 0.5]], [False], VS, P)
        assert np.isinf(float(d[0]))

    def test_random_vs_oracle(self):
        pts = RNG.uniform(-10, 10, size=(600, 3))
        m = insert(make_map(), pts)
        grid = oracle_map([pts])
        queries = RNG.uniform(-10, 10, size=(100, 3)).astype(np.float32)
        nn, d = nn_arr(m, queries, np.ones(100, bool), VS, P)
        for i, q in enumerate(queries):
            ref_p, ref_d = oracle_nn(grid, q)
            if np.isinf(ref_d):
                assert np.isinf(d[i])
            else:
                assert abs(d[i] - ref_d) < 2e-3, (i, d[i], ref_d)


class TestNativeNN:
    """Direct tests for the layout-stable full-27-neighborhood path
    (``nearest_neighbor_native``) vs the candidate-cached path."""

    def _paths(self, m, queries, mask):
        q = P3.from_array(jnp.asarray(queries, jnp.float32))
        mk = jnp.asarray(mask)
        nn_nat, d_nat = hashmap.nearest_neighbor_native(m, q, mk, VS)
        cand = hashmap.gather_candidates(m, q, VS, P, 27)
        nn_c, d_c = hashmap.nn_from_candidates(cand, q, mk, VS)
        return (np.asarray(nn_nat.to_array()), np.asarray(d_nat),
                np.asarray(nn_c.to_array()), np.asarray(d_c))

    def test_equals_candidate_path_random(self):
        # Same packed-key selection rule -> the two paths must agree
        # BITWISE (coordinates and distances), not just within tolerance.
        pts = RNG.uniform(-12, 12, size=(900, 3))
        m = insert(make_map(), pts)
        queries = RNG.uniform(-13, 13, size=(257, 3)).astype(np.float32)
        mask = np.ones(257, bool)
        mask[5] = False
        nn_nat, d_nat, nn_c, d_c = self._paths(m, queries, mask)
        np.testing.assert_array_equal(nn_nat, nn_c)
        np.testing.assert_array_equal(d_nat, d_c)

    def test_equals_candidate_path_tiebreaks(self):
        # Exact distance ties: (a) same voxel, two lanes; (b) two voxels.
        # Offsets chosen on quantization-bin centers so reconstructed
        # distances are bit-equal; the packed key must break ties to the
        # lowest (offset id, entry lane) on BOTH paths.
        # Stored coords reconstruct to bin centers (o + 0.5)/1024, so an
        # exact f32 distance tie needs offsets o1 + o2 = 1023 around a
        # dyadic query: 0.2495 -> bin 255, 0.7505 -> bin 768.
        m = make_map()
        # (a) same voxel, two lanes, bit-equal distances from query 0.5
        m = insert(m, [[0.7505, 0.5, 0.5], [0.2495, 0.5, 0.5]])
        # (b) two voxels (9 and 11), bit-equal distances from query 10.5
        m = insert(m, [[11.2505, 0.5, 0.5], [9.7495, 0.5, 0.5]])
        queries = np.array([[0.5, 0.5, 0.5], [10.5, 0.5, 0.5]], np.float32)
        nn_nat, d_nat, nn_c, d_c = self._paths(m, queries, np.ones(2, bool))
        np.testing.assert_array_equal(nn_nat, nn_c)
        np.testing.assert_array_equal(d_nat, d_c)
        # (a): true tie -> lowest entry lane = first-inserted (0.7505)
        assert abs(nn_nat[0, 0] - 0.7505) < 2e-3
        # (b): true tie -> lowest offset id = (-1, 0, 0) voxel = 9.7495,
        # even though the voxel-11 point was inserted first
        assert abs(nn_nat[1, 0] - 9.7495) < 2e-3

    def test_empty_map_inf(self):
        nn_nat, d_nat, nn_c, d_c = self._paths(
            make_map(), np.zeros((4, 3), np.float32), np.ones(4, bool))
        assert np.all(np.isinf(d_nat))
        np.testing.assert_array_equal(d_nat, d_c)

    def test_dispatch_native_for_full_neighborhood(self, monkeypatch):
        # nearest_neighbor must route num_candidate_voxels >= 27 to the
        # native path and smaller values to the candidate-cached path.
        calls = []
        real = hashmap.nearest_neighbor_native
        monkeypatch.setattr(
            hashmap, "nearest_neighbor_native",
            lambda *a, **k: calls.append("native") or real(*a, **k))
        m = insert(make_map(), [[0.5, 0.5, 0.5]])
        q = P3.from_array(jnp.zeros((1, 3), jnp.float32))
        hashmap.nearest_neighbor(m, q, jnp.ones(1, bool), VS, P, 27)
        assert calls == ["native"]
        hashmap.nearest_neighbor(m, q, jnp.ones(1, bool), VS, P, 10)
        assert calls == ["native"]  # pruned path did NOT call native


class TestEvictAndUpdate:
    def test_evict_far(self):
        m = insert(make_map(), [[0.5, 0.5, 0.5], [50.5, 0.5, 0.5]])
        m = hashmap.evict_far(m, jnp.zeros(3), 10.0, VS)
        assert int(hashmap.num_voxels(m)) == 1
        _, d = nn_arr(m, [[0.5, 0.5, 0.5]], [True], VS, P)
        assert float(d[0]) < 2e-3

    def test_evict_uses_first_point(self):
        # Block's first point decides eviction (v1.2.0 semantics).
        m = insert(make_map(), [[9.9, 0.0, 0.5], [9.2, 0.0, 0.5]])
        # both in voxel (9, 0, 0); first point at 9.9 (norm > 9.5)
        m = hashmap.evict_far(m, jnp.zeros(3), 9.5, VS)
        assert int(hashmap.num_voxels(m)) == 0

    def test_slot_reuse_after_eviction(self):
        m = insert(make_map(), [[50.5, 0.5, 0.5]])
        m = hashmap.evict_far(m, jnp.zeros(3), 10.0, VS)
        m = insert(m, [[50.5, 0.5, 0.5]])
        assert int(hashmap.num_voxels(m)) == 1
        nn, d = nn_arr(m, [[50.5, 0.5, 0.5]], [True], VS, P)
        assert float(d[0]) < 2e-3

    def test_update_transform_insert_evict(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [100.0, 0, 0]
        local_pts = np.array([[1.0, 0.5, 0.5], [-0.5, 0.5, 0.5]], np.float32)
        m = hashmap.update(make_map(), P3.from_array(jnp.asarray(local_pts)),
                           jnp.ones(2, bool), jnp.asarray(pose), VS, 50.0, P)
        assert int(hashmap.num_voxels(m)) == 2
        # stored in world frame
        nn, d = nn_arr(m, [[101.0, 0.5, 0.5]], [True], VS, P)
        assert float(d[0]) < 2e-3

    def test_pointcloud_roundtrip(self):
        pts = RNG.uniform(-5, 5, size=(100, 3))
        m = insert(make_map(), pts)
        cloud, mask = hashmap.pointcloud(m, VS)
        stored = np.asarray(cloud.to_array())[np.asarray(mask)]
        grid = oracle_map([pts])
        ref = np.concatenate([np.array(b) for b in grid.values()])
        assert len(stored) == len(ref)
        # quantized storage: match by sorted order within 2 mm
        np.testing.assert_allclose(
            np.sort(stored, axis=0), np.sort(ref, axis=0), atol=2e-3)


class TestProbeRobustness:
    def test_window_survives_holes(self):
        # Insert colliding-ish keys, evict one in the middle of a cluster,
        # then verify the others are still findable (full-window scan).
        pts = np.array([[i + 0.5, 0.5, 0.5] for i in range(64)], np.float32)
        m = insert(make_map(), pts)
        # evict everything farther than 32 from origin
        m = hashmap.evict_far(m, jnp.zeros(3), 32.0, VS)
        remaining = int(hashmap.num_voxels(m))
        assert 0 < remaining < 64
        _, d = nn_arr(m, pts[:16], np.ones(16, bool), VS, P)
        assert np.all(d < 2e-3)

    def test_high_load_factor_inserts(self):
        # ~50% load: all inserts must still land (with drops counted fairly).
        n = CAP // 2
        pts = (RNG.permutation(n * 4)[:n, None] * np.array([[1.0, 0, 0]])
               + 0.5).astype(np.float32)
        m = insert(make_map(), pts)
        kept = int(hashmap.num_voxels(m))
        # bounded probing may drop a few at this load, but the vast
        # majority must be stored
        assert kept > 0.97 * n


class TestOverflowAccounting:
    @staticmethod
    def _colliding_voxels(num, num_buckets):
        """Find ``num`` distinct voxel coords hashing to one bucket."""
        found = {}
        for x in range(-60, 60):
            for y in range(-60, 60):
                h = int(np.asarray(hashmap.bucket_of(
                    jnp.asarray([x], jnp.int32), jnp.asarray([y], jnp.int32),
                    jnp.asarray([0], jnp.int32), num_buckets))[0])
                found.setdefault(h, []).append((x, y, 0))
                if len(found[h]) >= num:
                    return found[h][:num]
        raise AssertionError("no collision set found")

    def test_bucket_overflow_counted_and_bounded(self):
        # Construct P+1 distinct voxels that all hash to ONE bucket: the
        # P+1-th allocation must be refused and counted, never corrupt
        # another bucket.
        m = make_map()
        vox = self._colliding_voxels(P + 1, m.num_buckets)
        pts = np.asarray([[x + 0.5, y + 0.5, z + 0.5] for x, y, z in vox],
                         np.float32)
        m2, failed = hashmap.insert(
            m, P3.from_array(jnp.asarray(pts)), jnp.ones(len(pts), bool),
            VS, P, return_failed=True)
        assert int(failed) == 1
        assert int(hashmap.num_voxels(m2)) == P
        # the stored voxels answer exact-match queries
        _, d = nn_arr(m2, pts, np.ones(len(pts), bool), VS, P)
        assert (d < 2e-3).sum() == P

    def test_no_overflow_zero_failed(self):
        pts = RNG.uniform(-10, 10, (128, 3)).astype(np.float32)
        _, failed = hashmap.insert(
            make_map(), P3.from_array(jnp.asarray(pts)),
            jnp.ones(128, bool), VS, P, return_failed=True)
        assert int(failed) == 0

    def test_fresh_capacity_fallback_exact(self):
        # More fresh voxels than fresh_capacity must take the full-width
        # fallback path and still allocate every voxel exactly.
        pts = (np.arange(32, dtype=np.float32)[:, None]
               * np.array([[2.0, 0, 0]], np.float32) + 0.5)
        m, failed = hashmap.insert(
            make_map(), P3.from_array(jnp.asarray(pts)),
            jnp.ones(32, bool), VS, P, fresh_capacity=4, return_failed=True)
        assert int(failed) == 0
        assert int(hashmap.num_voxels(m)) == 32
        _, d = nn_arr(m, pts, np.ones(32, bool), VS, P)
        assert np.all(d < 2e-3)

    def test_compact_path_matches_full_path(self):
        pts = RNG.uniform(-10, 10, (256, 3)).astype(np.float32)
        p3 = P3.from_array(jnp.asarray(pts))
        mask = jnp.ones(256, bool)
        m_compact = hashmap.insert(make_map(), p3, mask, VS, P,
                                   fresh_capacity=256)
        m_full = hashmap.insert(make_map(), p3, mask, VS, P,
                                fresh_capacity=1)  # forces full fallback
        np.testing.assert_array_equal(np.asarray(m_compact.table),
                                      np.asarray(m_full.table))
