"""Device-resident sparse voxel hash map (the local map), row-table form.

TPU-native equivalent of ``kiss_icp::VoxelHashMap`` (KISS-ICP v1.2.0, used at
/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.{hpp,cpp} and
registration/Registration.cpp:74).  The CPU version is a
``tsl::robin_map<Voxel, VoxelBlock>``; here it becomes a fixed-capacity
open-addressing table in HBM.

Measured TPU memory-system facts that drive this layout (see git history for
the experiments): XLA *element* gathers cost ~8 ns per element — hopeless for
~1M-element candidate fetches — while *row* gathers (one full minor-dim row
per index) cost ~1-2 ns per ROW.  So one voxel = ONE table row:

    table: (C, R) uint32,  R = K + 4 lanes
      lanes [0..K-1] : packed points — 10/10/10-bit in-voxel offsets
                       (~1 mm at 1 m voxels); 0xFFFFFFFF = unused entry
      lane  [K]      : key fingerprint (murmur-finalized; 0 = empty slot)
      lanes [K+1..]  : exact voxel key (kx, ky, kz as two's-complement)

Block fill levels are derived from the packed sentinel (blocks fill
contiguously), so the map needs no separate counts array.

The table is BUCKETIZED: ``G`` (= Config.max_probes) voxel slots share one
physical row of ``G*R`` lanes (96 lanes at the G=4, K=20 defaults — nearly a
full 128-lane tile), so a query's whole probe neighborhood is ONE row gather:

    table:  (B, G*R) uint32 — bucket b, slot g occupies lanes [g*R, (g+1)*R)

``bucket = murmur(hash) & (B-1)``; a voxel lives in any free slot of its
bucket (found by elementwise fingerprint compare across the G sub-rows after
the gather).  Bucket overflow (more than G voxels hashing to one bucket)
refuses the insert for that frame — counted (``return_failed``) and retried
naturally on later frames.  Sizing (measured on the 64K bench sequence,
~8K-voxel occupancy peak): with K=20 the physical row rounds to 128-lane
tiles, so G=5 (Config.max_probes) costs the same gather bytes as G=4 while
adding 25% slots and associativity — G=5 x 16384 buckets measured ZERO
drops ("nothing dropped" reference parity); G=4 x 8192 is ~8% faster
end-to-end with a few counted drops per thousand allocations.  In-place
eviction needs no tombstones; inserts assign free slots
rank-deterministically (see ``insert``).

Semantics matched to the reference:
  * first-come-kept voxel blocks (insertion refused when block full),
  * ``GetClosestNeighbor`` scans the 27 voxels around the query's voxel
    (optionally pruned to the nearest ``num_candidate_voxels`` by exact
    point-to-voxel-box lower bounds),
  * ``Update(points, pose)`` = transform, insert, evict blocks whose *first*
    stored point is farther than ``max_distance`` from the pose translation.
"""

from __future__ import annotations

import dataclasses

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .points import P3, transform
from .voxel import (PACKED_KEY_SENTINEL, SENTINEL, pack_rebased_keys,
                    packable_span)

#: packed-point sentinel marking an unused block entry
PACKED_SENTINEL = 0xFFFFFFFF
#: offset quantization steps per voxel edge (10 bits)
_QUANT = 1024
#: extra lanes per row: fingerprint + 3 exact key components
_META_LANES = 4

# second spatial hash (fingerprint); distinct constants from the slot hash
_F1, _F2, _F3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D

# 27 neighbor offsets (including the center voxel) as planes, static numpy.
_OFFX = np.array([dx for dx in (-1, 0, 1) for _ in range(9)], np.int32)
_OFFY = np.tile(np.array([dy for dy in (-1, 0, 1) for _ in range(3)],
                         np.int32), 3)
_OFFZ = np.tile(np.array([-1, 0, 1], np.int32), 9)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MapState:
    """The map is ONE array: all per-voxel state (packed points, fingerprint,
    exact key) lives in the bucket table; block fill levels are derived from
    the packed-point sentinel, so inserts never maintain a separate counts
    array (which used to cost a full extra element scatter per frame)."""

    table: jnp.ndarray  # (B, G * (K + 4)) uint32
    bucket_slots: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_buckets(self):
        return self.table.shape[-2]

    @property
    def capacity(self):
        """Total voxel slots (buckets x slots-per-bucket)."""
        return self.num_buckets * self.bucket_slots

    @property
    def block_size(self):
        return self.table.shape[-1] // self.bucket_slots - _META_LANES


class CandidateSet(NamedTuple):
    """Candidate map points per query, kept PACKED between GN iterations.

    ``words`` (V, N, K) uint32 are the stored 10/10/10-bit in-voxel offsets
    (``PACKED_SENTINEL`` = no candidate, which also encodes "voxel not in
    map": unfound probe rows stay sentinel-filled).  ``rel`` (V, N) int32 in
    [0, 27) says which of the 27 neighbor offsets the row probes, relative
    to ``base_*`` — the query's voxel coords at gather time.  Storing the
    5-bit offset id instead of three absolute voxel-coord planes lets the
    NN winner reconstruct its world point elementwise (no gathers) and cuts
    the cached bytes per voxel from 13 to 4.

    Layout rule: the query axis N is LAST.  TPU tiles pad the minor axis to
    128 lanes, so a (V, N, K) cache at K=20 would physically occupy 6.4x
    its logical bytes and run every selection pass at 16% lane utilization;
    with N minor (thousands of queries) the cache is dense and reductions
    over (V, K) ride the cheap sublane direction.  Candidates stay packed
    (4 B/point) so each GN re-selection pass streams ~4x less HBM than
    unpacked f32 planes; unpacking fuses into the distance computation.
    """
    words: jnp.ndarray   # (V, K, N) uint32
    rel: jnp.ndarray     # (V, N) int32 in [0, 27)
    base_x: jnp.ndarray  # (N,) int32
    base_y: jnp.ndarray
    base_z: jnp.ndarray


def fingerprint(bx, by, bz):
    """Second hash with the high bit forced, so 0 never collides with empty.

    Additive combine + murmur3 finalizer: the KISS-style XOR-of-multiplies
    has a structural (y, z) -> (-y, -z) collision symmetry that is harmless
    for slot hashing (exact keys disambiguate) but fatal for a fingerprint.
    """
    h = (bx.astype(jnp.uint32) * jnp.uint32(_F1)
         + by.astype(jnp.uint32) * jnp.uint32(_F2)
         + bz.astype(jnp.uint32) * jnp.uint32(_F3))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h | jnp.uint32(0x80000000)


def bucket_of(bx, by, bz, num_buckets: int):
    """Bucket row index of a voxel (num_buckets must be a power of two).

    NOT the KISS xor-of-multiplies spatial hash: xor combining cancels
    bitwise on structured voxel patterns (planar scenes produce full
    32-bit collisions — ~10 bucket-overflow drops per 64K-regime frame at
    ANY table size, and a finalizer cannot separate already-equal values).
    Additive multiply-combine + murmur finalizer measured zero drops on
    the same sequences.  Constants differ from ``fingerprint`` so bucket
    index and fingerprint stay independent.
    """
    h = (bx.astype(jnp.uint32) * jnp.uint32(0x85297A4D)
         + by.astype(jnp.uint32) * jnp.uint32(0x68E31DA4)
         + bz.astype(jnp.uint32) * jnp.uint32(0xB5297A4D))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B3)
    h = h ^ (h >> 15)
    return (h & jnp.uint32(num_buckets - 1)).astype(jnp.int32)


def _empty_row_np(k: int, bucket_slots: int) -> np.ndarray:
    r = k + _META_LANES
    row = np.zeros(bucket_slots * r, np.uint32)
    for g in range(bucket_slots):
        row[g * r:g * r + k] = PACKED_SENTINEL
    return row


def empty(capacity: int, max_points_per_voxel: int, dtype=jnp.float32,
          bucket_slots: int = 4) -> MapState:
    del dtype  # packed storage; kept for API compatibility
    assert capacity % bucket_slots == 0
    b = capacity // bucket_slots
    assert b & (b - 1) == 0, "bucket count must be a power of two"
    row = _empty_row_np(max_points_per_voxel, bucket_slots)
    return MapState(
        table=jnp.broadcast_to(jnp.asarray(row), (b, row.shape[0])).copy(),
        bucket_slots=bucket_slots,
    )


def clear(m: MapState) -> MapState:
    return empty(m.capacity, m.block_size, bucket_slots=m.bucket_slots)


def is_empty(m: MapState):
    return num_voxels(m) == 0


def _fp_lanes(m: MapState):
    """(..., B, G) fingerprint lane per slot."""
    k, r = m.block_size, m.block_size + _META_LANES
    return jnp.stack([m.table[..., g * r + k] for g in range(m.bucket_slots)],
                     axis=-1)


def num_voxels(m: MapState):
    return jnp.sum((_fp_lanes(m) != 0).astype(jnp.int32))


def slot_counts(m: MapState):
    """(..., B, G) stored-point count per voxel slot, derived from the packed
    sentinel (blocks fill contiguously).  Debug/test surface — the insert
    path never reads or writes a counts array."""
    k, g = m.block_size, m.bucket_slots
    r = k + _META_LANES
    per = []
    for gi in range(g):
        sub = m.table[..., gi * r:(gi + 1) * r]
        stored = jnp.sum((sub[..., :k] != jnp.uint32(PACKED_SENTINEL))
                         .astype(jnp.int32), axis=-1)
        per.append(jnp.where(sub[..., k] != 0, stored, 0))
    return jnp.stack(per, axis=-1)


def pack_offsets(p: P3, bx, by, bz, voxel_size: float):
    """World points -> packed 10/10/10-bit in-voxel offsets."""
    inv = _QUANT / voxel_size
    ox = jnp.clip((p.x - bx * voxel_size) * inv, 0, _QUANT - 1).astype(jnp.uint32)
    oy = jnp.clip((p.y - by * voxel_size) * inv, 0, _QUANT - 1).astype(jnp.uint32)
    oz = jnp.clip((p.z - bz * voxel_size) * inv, 0, _QUANT - 1).astype(jnp.uint32)
    return ox | (oy << 10) | (oz << 20)


def unpack_offsets(words, bx, by, bz, voxel_size: float, dtype=jnp.float32):
    """Packed words + voxel coords -> world coordinates (centre of the
    quantization cell, so round-trip error is at most voxel_size/2048)."""
    step = voxel_size / _QUANT
    ox = (words & jnp.uint32(_QUANT - 1)).astype(dtype)
    oy = ((words >> 10) & jnp.uint32(_QUANT - 1)).astype(dtype)
    oz = ((words >> 20) & jnp.uint32(_QUANT - 1)).astype(dtype)
    half = 0.5
    return P3(bx.astype(dtype) * voxel_size + (ox + half) * step,
              by.astype(dtype) * voxel_size + (oy + half) * step,
              bz.astype(dtype) * voxel_size + (oz + half) * step)


def pointcloud(m: MapState, voxel_size: float):
    """All stored world points + validity mask (LocalMap()/Pointcloud()
    parity).  Returns (P3 of (C*K,), mask (C*K,)); debug/viz path."""
    k, g = m.block_size, m.bucket_slots
    r = k + _META_LANES
    words, occ, bx, by, bz = [], [], [], [], []
    for gi in range(g):
        sub = m.table[:, gi * r:(gi + 1) * r]
        words.append(sub[:, :k].reshape(-1))
        occ.append(jnp.repeat(sub[:, k] != 0, k))
        bx.append(jnp.repeat(sub[:, k + 1].astype(jnp.int32), k))
        by.append(jnp.repeat(sub[:, k + 2].astype(jnp.int32), k))
        bz.append(jnp.repeat(sub[:, k + 3].astype(jnp.int32), k))
    words = jnp.concatenate(words)
    mask = (words != jnp.uint32(PACKED_SENTINEL)) & jnp.concatenate(occ)
    pts = unpack_offsets(words, jnp.concatenate(bx), jnp.concatenate(by),
                         jnp.concatenate(bz), voxel_size)
    return pts, mask


def _box_lower_bound_d2(q: P3, bx, by, bz, voxel_size: float):
    """Exact squared distance from each query to each voxel's AABB.

    q planes (N,), voxel coord planes (27, N) -> (27, N).  Pure elementwise:
    the pruning step costs no gathers.
    """
    lox = bx.astype(q.x.dtype) * voxel_size
    loy = by.astype(q.x.dtype) * voxel_size
    loz = bz.astype(q.x.dtype) * voxel_size
    dx = jnp.maximum(jnp.maximum(lox - q.x[None], q.x[None] - (lox + voxel_size)), 0.0)
    dy = jnp.maximum(jnp.maximum(loy - q.y[None], q.y[None] - (loy + voxel_size)), 0.0)
    dz = jnp.maximum(jnp.maximum(loz - q.z[None], q.z[None] - (loz + voxel_size)), 0.0)
    return dx * dx + dy * dy + dz * dz


def _rel_to_offsets(rel):
    """5-bit neighbor-offset id in [0, 27) -> (ox, oy, oz) in {-1, 0, 1}."""
    return rel // 9 - 1, (rel // 3) % 3 - 1, rel % 3 - 1


def gather_candidates(m: MapState, q: P3, voxel_size: float, max_probes: int,
                      num_candidate_voxels: int = 27,
                      return_skip_bound: bool = False):
    """One gather pass: candidate map points around each query.

    Args:
      q: P3 of (N,) world-frame query planes.
      num_candidate_voxels: V <= 27 — per query, only the V voxels with the
        smallest point-to-box lower bound are fetched (V=27 is exact; the
        box bound makes smaller V a principled approximation: a voxel can
        only be skipped in favor of voxels that are geometrically closer).
      return_skip_bound: also return ``skip_lb_d2`` (N,) f32 — per query,
        the smallest point-to-box SQUARED lower bound among the 27-V voxels
        NOT fetched (+inf when V=27).  This is the exactness certificate
        for pruned search: if every query's eventual best squared distance
        d*^2 (or tau^2, whichever is smaller — a neighbor past tau is
        rejected either way) is < skip_lb_d2, no skipped voxel could have
        supplied a better or tie-breaking candidate, so the pruned result
        is bit-identical to the full 27-voxel search.  The bound is
        conservative: the sort key masks the 5 low mantissa bits DOWNWARD,
        so the recovered bound only under-estimates, never over-estimates.

    Returns a CandidateSet of packed words (plus skip_lb_d2 when
    requested); the fat bucket rows are consumed by a single select chain
    (slot fingerprint + exact-key match) so only the (V, N, K) packed words
    persist, not the (V, N, G*R) gather output.
    """
    k, g = m.block_size, m.bucket_slots
    r = k + _META_LANES
    v = num_candidate_voxels
    inv = 1.0 / voxel_size
    base_x = jnp.floor(q.x * inv).astype(jnp.int32)
    base_y = jnp.floor(q.y * inv).astype(jnp.int32)
    base_z = jnp.floor(q.z * inv).astype(jnp.int32)

    skip_lb_d2 = None
    if v < 27:
        # Select the V nearest voxels by box lower bound.  The offset index
        # rides in the low 5 bits of the bitcast distance key, so this is a
        # single-operand u32 sort over the 27-row axis — element gathers
        # (argsort + take_along_axis) measured ~30x slower here.
        bx = base_x[None, :] + _OFFX[:, None]
        by = base_y[None, :] + _OFFY[:, None]
        bz = base_z[None, :] + _OFFZ[:, None]
        lb = _box_lower_bound_d2(q, bx, by, bz, voxel_size)       # (27, N)
        key = (jax.lax.bitcast_convert_type(lb, jnp.uint32)
               & jnp.uint32(0xFFFFFFE0))
        key = key | jnp.arange(27, dtype=jnp.uint32)[:, None]
        key = jax.lax.sort(key, dimension=0)                      # (27, N)
        if return_skip_bound:
            # Row v = the nearest SKIPPED box (keys sort ascending); strip
            # the offset-id bits to recover its (under-estimated) bound.
            skip_lb_d2 = jax.lax.bitcast_convert_type(
                key[v] & jnp.uint32(0xFFFFFFE0), jnp.float32)
        key = key[:v]                                             # (V, N)
        rel = (key & jnp.uint32(31)).astype(jnp.int32)            # offset id
    else:
        if return_skip_bound:
            skip_lb_d2 = jnp.full(q.x.shape, jnp.inf, jnp.float32)
        rel = jnp.broadcast_to(jnp.arange(27, dtype=jnp.int32)[:, None],
                               (27, q.x.shape[0]))
    ox, oy, oz = _rel_to_offsets(rel)
    bx = base_x[None, :] + ox
    by = base_y[None, :] + oy
    bz = base_z[None, :] + oz

    bucket = bucket_of(bx, by, bz, m.num_buckets)
    fpq = fingerprint(bx, by, bz)
    ukx = bx.astype(jnp.uint32)
    uky = by.astype(jnp.uint32)
    ukz = bz.astype(jnp.uint32)
    v_n = bx.shape
    # The row gather runs on FLAT (V*N,) indices so its result is 2-D —
    # a 2-D (rows, G*R) tensor has no free layout axes, so XLA cannot
    # materialize layout-transposed duplicates of the (large) candidate
    # tensor.  The 3-D (V, N, G*R) formulation was fine single-device but
    # under vmap at batch 16 XLA's layout assignment emitted TWO full
    # copies of the (B, V, N, G*R) gather output (~1 GB/scan-step of pure
    # layout traffic) plus a detiled gather — the entire batch-16 DP
    # regression (BASELINE config 3; see docs/performance.md).
    fat = m.table[bucket.reshape(-1)]                            # (V*N, G*R)
    fpq_f = fpq.reshape(-1)
    ukx_f = ukx.reshape(-1)
    uky_f = uky.reshape(-1)
    ukz_f = ukz.reshape(-1)
    # A voxel occupies at most one slot of its bucket, so the slot select is
    # a masked SUM over sub-rows (not a sequential where-chain, which XLA
    # splits into several full-size fusions).  The selected words transpose
    # to the (V, K, N) cache layout (see CandidateSet).
    words = jnp.zeros((fat.shape[0], k), jnp.uint32)
    anyhit = jnp.zeros((fat.shape[0],), bool)
    for gi in range(g):
        sub = fat[:, gi * r:(gi + 1) * r]
        hit = ((sub[:, k] == fpq_f) & (sub[:, k + 1] == ukx_f)
               & (sub[:, k + 2] == uky_f) & (sub[:, k + 3] == ukz_f))
        words = words + jnp.where(hit[:, None], sub[:, :k],
                                  jnp.uint32(0))
        anyhit = anyhit | hit
    words = jnp.where(anyhit[:, None], words, jnp.uint32(PACKED_SENTINEL))
    words = words.reshape(v_n + (k,))
    cand = CandidateSet(words=jnp.swapaxes(words, 1, 2), rel=rel,
                        base_x=base_x, base_y=base_y, base_z=base_z)
    if return_skip_bound:
        return cand, skip_lb_d2
    return cand


def _candidate_points(cand: CandidateSet, voxel_size: float, dtype):
    """Unpack candidate words -> ((V, K, N) coordinate planes, valid)."""
    ox, oy, oz = _rel_to_offsets(cand.rel[:, None, :])             # (V, 1, N)
    pts = unpack_offsets(cand.words,
                         cand.base_x[None, None, :] + ox,
                         cand.base_y[None, None, :] + oy,
                         cand.base_z[None, None, :] + oz,
                         voxel_size, dtype)
    valid = cand.words != jnp.uint32(PACKED_SENTINEL)
    return pts, valid


def reduce_candidates(cand: CandidateSet, q: P3, keep: int,
                      voxel_size: float) -> CandidateSet:
    """Shrink each voxel's candidate list to its ``keep`` nearest points.

    Distances are evaluated at the query positions ``q`` (the initial-guess
    pose).  Exact for the first association; later GN iterations may pick a
    different point only among each voxel's top-``keep``.  Measured on
    synthetic sequences this trades ATE for little speed — kept as an
    experimental knob (Config.gn_candidates_per_voxel).
    """
    v, k, n = cand.words.shape
    if keep >= k:
        return cand
    pts, valid = _candidate_points(cand, voxel_size, q.x.dtype)
    dx = pts.x - q.x[None, None, :]
    dy = pts.y - q.y[None, None, :]
    dz = pts.z - q.z[None, None, :]
    cur = jnp.where(valid, dx * dx + dy * dy + dz * dz, jnp.inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (v, k, n), 1)
    outs = []
    for _ in range(keep):
        best = jnp.min(cur, axis=1, keepdims=True)
        first = jnp.min(jnp.where(cur == best, lane, k), axis=1, keepdims=True)
        pick = lane == first
        word = jnp.sum(jnp.where(pick, cand.words, jnp.uint32(0)), axis=1)
        outs.append(jnp.where(jnp.isfinite(best[:, 0, :]), word,
                              jnp.uint32(PACKED_SENTINEL)))
        cur = jnp.where(pick, jnp.inf, cur)
    return cand._replace(words=jnp.stack(outs, axis=1))


def nn_from_candidates(cand: CandidateSet, q: P3, query_mask,
                       voxel_size: float):
    """Closest candidate per query — pure elementwise + axis reductions.

    No argmin/take_along_axis (element gathers, ~10 ns/element on TPU).
    The winner is found with a min-reduction over a packed key: the bitcast
    distance's low 10 mantissa bits are replaced by (offset id, entry lane)
    (IEEE non-negative floats order as u32), so the min carries everything
    needed to RECONSTRUCT the winner elementwise — a second masked-sum pass
    extracts the winning packed word, the offset id decodes the winning
    voxel, and the exact distance is recomputed from the reconstructed
    point (no quantized-distance output).  Ties (equal to <=2^-13 relative)
    break to the lowest (offset id, lane).

    Returns (P3 neighbors (N,), dist (N,)); inf distance when no candidate.
    """
    v, k, n = cand.words.shape
    assert k <= 32, "packed argmin key holds a 5-bit entry lane"
    lo = jnp.uint32(0x3FF)                                        # 10 bits
    pts, valid = _candidate_points(cand, voxel_size, q.x.dtype)
    dx = pts.x - q.x[None, None, :]
    dy = pts.y - q.y[None, None, :]
    dz = pts.z - q.z[None, None, :]
    d2 = dx * dx + dy * dy + dz * dz

    lane = jax.lax.broadcasted_iota(jnp.uint32, (v, k, n), 1)
    tag = (cand.rel.astype(jnp.uint32)[:, None, :] << 5) | lane
    key = (jax.lax.bitcast_convert_type(d2, jnp.uint32) & ~lo) | tag
    key = jnp.where(valid & query_mask[None, None, :], key,
                    jnp.uint32(0xFFFFFFFF))
    best = jnp.min(key, axis=(0, 1))                              # (N,)

    # (rel, lane) is unique per query, so exactly one candidate matches.
    pick = key == best[None, None, :]
    word = jnp.sum(jnp.where(pick, cand.words, jnp.uint32(0)), axis=(0, 1))
    wx, wy, wz = _rel_to_offsets(((best >> 5) & jnp.uint32(31)).astype(jnp.int32))
    nearest = unpack_offsets(word, cand.base_x + wx, cand.base_y + wy,
                             cand.base_z + wz, voxel_size, q.x.dtype)
    ex = nearest.x - q.x
    ey = nearest.y - q.y
    ez = nearest.z - q.z
    has = best != jnp.uint32(0xFFFFFFFF)
    dist = jnp.where(query_mask & has,
                     jnp.sqrt(ex * ex + ey * ey + ez * ez), jnp.inf)
    return nearest, dist


def nearest_neighbor_native(m: MapState, q: P3, query_mask,
                            voxel_size: float):
    """Full-27-neighborhood GetClosestNeighbor in GATHER-NATIVE layout.

    Same selection semantics (packed distance key with (offset id, entry
    lane) tie-break) as ``gather_candidates`` + ``nn_from_candidates``, but
    every tensor keeps the row gather's own (V, N, lanes) layout.  The
    cached-candidate pipeline transposes the selected words to a (V, K, N)
    cache because the GN loop re-reads them many times; when the
    association is consumed ONCE (the exact re-gather-per-iteration mode,
    Registration.cpp:179-187), that relayout is pure loss — XLA propagates
    the N-minor preference backward through the select chain and inserts a
    full layout-changing copy of the (27, N, G*R) gather output (10.6 MB at
    the 64K-regime config, measured ~35 us per association, paid EVERY GN
    iteration).  Keeping the reduction axes on (offset, lane) instead makes
    the whole chain layout-stable: gather -> select -> distance/key ->
    min-reduce, no transposed intermediates at all.

    Returns (P3 neighbors (N,), dist (N,)); inf distance when no candidate.
    """
    k, g = m.block_size, m.bucket_slots
    r = k + _META_LANES
    n = q.x.shape[0]
    inv = 1.0 / voxel_size
    base_x = jnp.floor(q.x * inv).astype(jnp.int32)
    base_y = jnp.floor(q.y * inv).astype(jnp.int32)
    base_z = jnp.floor(q.z * inv).astype(jnp.int32)
    bx = base_x[None, :] + _OFFX[:, None]                         # (27, N)
    by = base_y[None, :] + _OFFY[:, None]
    bz = base_z[None, :] + _OFFZ[:, None]

    bucket = bucket_of(bx, by, bz, m.num_buckets)
    fpq = fingerprint(bx, by, bz)
    ukx = bx.astype(jnp.uint32)
    uky = by.astype(jnp.uint32)
    ukz = bz.astype(jnp.uint32)
    fat = m.table[bucket]                                         # (27, N, G*R)

    words = jnp.zeros((27, n, k), jnp.uint32)
    anyhit = jnp.zeros((27, n), bool)
    for gi in range(g):
        sub = fat[..., gi * r:(gi + 1) * r]
        hit = ((sub[..., k] == fpq) & (sub[..., k + 1] == ukx)
               & (sub[..., k + 2] == uky) & (sub[..., k + 3] == ukz))
        words = words + jnp.where(hit[..., None], sub[..., :k],
                                  jnp.uint32(0))
        anyhit = anyhit | hit
    words = jnp.where(anyhit[..., None], words, jnp.uint32(PACKED_SENTINEL))

    pts = unpack_offsets(words, bx[..., None], by[..., None], bz[..., None],
                         voxel_size, q.x.dtype)                   # (27, N, K)
    dx = pts.x - q.x[None, :, None]
    dy = pts.y - q.y[None, :, None]
    dz = pts.z - q.z[None, :, None]
    d2 = dx * dx + dy * dy + dz * dz

    valid = words != jnp.uint32(PACKED_SENTINEL)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (27, n, k), 2)
    rel = jax.lax.broadcasted_iota(jnp.uint32, (27, n, k), 0)
    lo = jnp.uint32(0x3FF)
    key = (jax.lax.bitcast_convert_type(d2, jnp.uint32) & ~lo) | (rel << 5) | lane
    key = jnp.where(valid & query_mask[None, :, None], key,
                    jnp.uint32(0xFFFFFFFF))
    # Two single-axis reductions (minor lane axis first, then the offset
    # axis): a joint axis=(0, 2) reduce makes XLA's layout assignment
    # prefer N-minor inputs and re-inserts the full-gather transposed copy
    # this path exists to avoid.
    best = jnp.min(jnp.min(key, axis=2), axis=0)                  # (N,)

    pick = key == best[None, :, None]
    word = jnp.sum(jnp.sum(jnp.where(pick, words, jnp.uint32(0)), axis=2),
                   axis=0)
    wx, wy, wz = _rel_to_offsets(((best >> 5) & jnp.uint32(31)).astype(jnp.int32))
    nearest = unpack_offsets(word, base_x + wx, base_y + wy, base_z + wz,
                             voxel_size, q.x.dtype)
    ex = nearest.x - q.x
    ey = nearest.y - q.y
    ez = nearest.z - q.z
    has = best != jnp.uint32(0xFFFFFFFF)
    dist = jnp.where(query_mask & has,
                     jnp.sqrt(ex * ex + ey * ey + ez * ez), jnp.inf)
    return nearest, dist


def nearest_neighbor(m: MapState, q: P3, query_mask, voxel_size: float,
                     max_probes: int, num_candidate_voxels: int = 27):
    """Batched GetClosestNeighbor over the (possibly pruned) neighborhood."""
    if num_candidate_voxels >= 27:
        # The unpruned neighborhood needs no box-bound sort and no cached
        # candidate transpose — the layout-stable path is ~2x cheaper per
        # association (see nearest_neighbor_native).
        return nearest_neighbor_native(m, q, query_mask, voxel_size)
    cand = gather_candidates(m, q, voxel_size, max_probes, num_candidate_voxels)
    return nn_from_candidates(cand, q, query_mask, voxel_size)


def insert(m: MapState, p: P3, mask, voxel_size: float, max_probes: int,
           fresh_capacity: int | None = None,
           max_extent: float | None = None,
           return_failed: bool = False) -> MapState:
    """AddPoints: insert world-frame points, first-come-kept per voxel block.

    With ``return_failed`` the return is ``(MapState, failed)`` where
    ``failed`` (scalar int32) counts NEW voxels this frame that could not be
    allocated because every slot of their bucket is occupied by other voxels
    (bucket overflow).  The reference's robin_map never refuses an
    allocation, so a nonzero count is a capacity-pressure signal the caller
    should surface (the points retry naturally on later frames).

    Points are grouped by (bucket, voxel) with one stable lexicographic
    sort; stability keeps input order inside each voxel group, matching the
    reference's first-come-kept ``VoxelBlock::AddPoint`` order, and the
    leading bucket key makes all groups contending for one bucket adjacent.

    Every point in a group probes the SAME bucket, so each point recomputes
    its group head's slot/fill-level locally from its own probe — no
    propagation of head values is needed.  The only cross-point state is two
    segmented counters (cumsum/cummax, ~3 us total at n=8K — measured ~10x
    cheaper than the log-depth ``associative_scan`` lowering):

      * rank of the group among the *new* (unfound) voxels of its bucket
        run — new voxel #j of a bucket takes the j-th currently-empty slot,
        a collision-free assignment that replaces sort-based arbitration
        rounds entirely (more new voxels than empty slots => the excess
        fail this frame and retry naturally on the next, exactly like the
        old arbitration's round limit);
      * position of the point inside its group — its append lane.

    Commit granularity: one scattered u32 per stored point, plus 4 meta
    lanes per freshly allocated voxel.  Both commits are chunked
    ``lax.while_loop``s over COMPACTED rows (one cheap sort each): stored
    words scatter in 1024-wide chunks, fresh-voxel meta in
    ``fresh_capacity``-wide chunks.  A while_loop carry aliases the table
    in place (``lax.cond`` copied it into and out of its branches), and the
    trip counts adapt to the data — zero/one trips in steady state,
    ``ceil(count/chunk)`` on bootstrap or teleport frames — so the exact
    semantics hold for any count with no full-width fallback branch.
    """
    g = m.bucket_slots
    kmax = m.block_size
    n = p.x.shape[0]
    if fresh_capacity is None:
        # Steady state allocates tens of new voxels per frame (measured
        # 12-30 at 8K-point frames on synthetic drives); n//32 = 256 at the
        # 8K default keeps the per-trip meta scatter 32x narrower than full
        # width while still committing a typical frame in ONE while_loop
        # trip.  Larger allocations just take more trips (see docstring).
        fresh_capacity = max(128, n // 32)
    fresh_capacity = min(fresh_capacity, n)
    inv = 1.0 / voxel_size
    cx = jnp.floor(p.x * inv).astype(jnp.int32)
    cy = jnp.floor(p.y * inv).astype(jnp.int32)
    cz = jnp.floor(p.z * inv).astype(jnp.int32)

    if packable_span(voxel_size, max_extent):
        # One packed u32 voxel key (rebased 10-bit coords; see voxel.py):
        # sorts (bucket, voxel) with 2 keys instead of 4.
        big = jnp.int32(1 << 30)
        mnx = jnp.min(jnp.where(mask, cx, big))
        mny = jnp.min(jnp.where(mask, cy, big))
        mnz = jnp.min(jnp.where(mask, cz, big))
        vkey = pack_rebased_keys(cx, cy, cz, mask)
        bucket_key = bucket_of(cx, cy, cz, m.num_buckets)
        bucket_key, vkey, sx, sy, sz = jax.lax.sort(
            (bucket_key, vkey, p.x, p.y, p.z), num_keys=2, is_stable=True)
        svalid = vkey != jnp.uint32(PACKED_KEY_SENTINEL)
        cx = ((vkey >> 20) & jnp.uint32(1023)).astype(jnp.int32) + mnx
        cy = ((vkey >> 10) & jnp.uint32(1023)).astype(jnp.int32) + mny
        cz = (vkey & jnp.uint32(1023)).astype(jnp.int32) + mnz
        cx = jnp.where(svalid, cx, SENTINEL)
        cy = jnp.where(svalid, cy, SENTINEL)
        cz = jnp.where(svalid, cz, SENTINEL)
        head = (vkey != jnp.roll(vkey, 1)).at[0].set(True) & svalid
    else:
        cx = jnp.where(mask, cx, SENTINEL)
        cy = jnp.where(mask, cy, SENTINEL)
        cz = jnp.where(mask, cz, SENTINEL)
        bucket_key = bucket_of(cx, cy, cz, m.num_buckets)
        bucket_key, cx, cy, cz, sx, sy, sz = jax.lax.sort(
            (bucket_key, cx, cy, cz, p.x, p.y, p.z), num_keys=4,
            is_stable=True)
        svalid = cx != SENTINEL
        head = ((cx != jnp.roll(cx, 1)) | (cy != jnp.roll(cy, 1))
                | (cz != jnp.roll(cz, 1)))
        head = head.at[0].set(True) & svalid
    run_start = (bucket_key != jnp.roll(bucket_key, 1)).at[0].set(True)

    # --- probe: every point fetches its own bucket row --------------------
    # (invalid rows probe a harmless bucket and never match: SENTINEL guard)
    # Specialized per-slot reductions: the insert path needs only scalars
    # per point (match slot, fill level, per-slot emptiness) — never the
    # row content — so the fat gather is consumed by one reduction chain
    # instead of materializing a selected (n, R) row.
    r = kmax + _META_LANES
    fpq = fingerprint(cx, cy, cz)
    valid_q = cx != SENTINEL
    ukx = cx.astype(jnp.uint32)
    uky = cy.astype(jnp.uint32)
    ukz = cz.astype(jnp.uint32)
    fat = m.table[bucket_key]                                     # (n, G*R)
    # Per-slot probe reductions as ONE tiny MXU matmul.  Extracting the 16
    # meta lanes into (n,) vectors (the naive formulation) is a cross-lane
    # shuffle XLA lowers to a ~60 us strided-slice loop; instead every lane
    # contributes to a per-lane predicate code and a (G*R, 2G) selector
    # contracts the lane dimension on the MXU:
    #   word lanes  -> 1 if stored entry        (column block 0: fill)
    #   meta lanes  -> 1 if equal to the query  (column block 1: match)
    #   fp lane     -> +256 if slot empty       (rides column block 1)
    # All values are small exact integers, so bf16 operands with f32
    # accumulation are exact.
    lane = jnp.arange(g * r, dtype=jnp.int32)                     # (G*R,)
    lane_mod = lane % r
    qtgt = jnp.where(
        lane_mod[None, :] == kmax, fpq[:, None],
        jnp.where(lane_mod[None, :] == kmax + 1, ukx[:, None],
                  jnp.where(lane_mod[None, :] == kmax + 2, uky[:, None],
                            ukz[:, None])))                       # (n, G*R)
    is_word = lane_mod < kmax
    is_meta = ~is_word
    is_fp = lane_mod == kmax
    code = jnp.where(
        is_word[None, :],
        (fat != jnp.uint32(PACKED_SENTINEL)).astype(jnp.bfloat16),
        (fat == qtgt).astype(jnp.bfloat16)
        + jnp.where(is_fp[None, :] & (fat == 0), jnp.bfloat16(256),
                    jnp.bfloat16(0)))                             # (n, G*R)
    slot_of_lane = lane // r                                      # (G*R,)
    gsel = jnp.arange(g, dtype=jnp.int32)
    sel = jnp.concatenate([
        (slot_of_lane[:, None] == gsel[None, :]) & is_word[:, None],
        (slot_of_lane[:, None] == gsel[None, :]) & is_meta[:, None],
    ], axis=1).astype(jnp.bfloat16)                               # (G*R, 2G)
    s = jnp.dot(code, sel, preferred_element_type=jnp.float32)    # (n, 2G)
    fills = s[:, :g].astype(jnp.int32)
    meta_s = s[:, g:].astype(jnp.int32)
    hit_g = (meta_s == _META_LANES) & valid_q[:, None]            # (n, G)
    found = jnp.any(hit_g, axis=1)
    found_slot = jnp.sum(jnp.where(hit_g, gsel[None, :], 0), axis=1)
    base = jnp.sum(jnp.where(hit_g, fills, 0), axis=1)
    win_empty = [meta_s[:, gi] >= 256 for gi in range(g)]

    # --- segmented counters ------------------------------------------------
    iota = jnp.arange(n, dtype=jnp.int32)
    pend_head = (head & ~found).astype(jnp.int32)
    pend_cum = jnp.cumsum(pend_head)                               # inclusive
    run_base = jax.lax.cummax(
        jnp.where(run_start, pend_cum - pend_head, -1))
    # 0-based rank of this point's (new) voxel among the new voxels of its
    # bucket run; every member of a group sees its head's value because only
    # heads feed the counter.
    pend_rank = pend_cum - run_base - 1
    head_pos = jax.lax.cummax(jnp.where(head, iota, -1))
    lane = iota - head_pos                                         # in-group

    # --- slot assignment: new voxel #j takes the j-th empty slot ----------
    tgt = jnp.full((n,), g, jnp.int32)
    cnt = jnp.zeros((n,), jnp.int32)
    for pp in range(g):
        take = win_empty[pp] & (cnt == pend_rank) & (tgt == g)
        tgt = jnp.where(take, pp, tgt)
        cnt = cnt + win_empty[pp]
    sub = jnp.where(found, found_slot, tgt)
    has_slot = svalid & (found | (tgt < g))

    # --- append words: one scattered u32 per stored point -----------------
    # (element scatters cost ~5 ns/element regardless of shape; whole-row
    # scatters and gather/select table rebuilds measured 3-10x slower)
    # The table is FLATTENED around the scatter/cond region: a 1-D array has
    # a single possible layout, whereas the 2-D form let XLA assign the
    # lax.cond result a column-major layout and insert two full-table
    # (6.3 MB) transposes per frame.  The reshapes below are free bitcasts.
    row_lanes = g * r
    size = m.num_buckets * row_lanes
    dest_k = base + lane
    ok = has_slot & (dest_k < kmax)
    words = pack_offsets(P3(sx, sy, sz), cx, cy, cz, voxel_size)   # (n,)
    safe_sub = jnp.minimum(sub, g - 1)
    flat_idx = (bucket_key * row_lanes + safe_sub * r
                + jnp.minimum(dest_k, kmax - 1))
    table = m.table.reshape(-1)
    if n >= 4096:
        # Element scatters cost ~5 ns per UPDATE row whether or not it is
        # dropped, and in steady state most points land in already-full
        # blocks (ok=False).  Compact the stored rows with one cheap sort,
        # then scatter word-chunks from a while_loop: one trip in steady
        # state, ceil(stored / chunk) trips on bootstrap frames — exact for
        # any count (chunk overlap from the clamp re-writes identical
        # values).
        wcap = min(n, 1024)
        okpos = jnp.where(ok, iota, jnp.int32(n))
        _, c_idx, c_words = jax.lax.sort(
            (okpos, flat_idx, words), num_keys=1, is_stable=False)
        num_ok = jnp.sum(ok.astype(jnp.int32))
        wrounds = (num_ok + wcap - 1) // wcap

        def words_body(state):
            j, tbl = state
            off = jnp.minimum(j * wcap, n - wcap)
            ii = jax.lax.dynamic_slice(c_idx, (off,), (wcap,))
            ww = jax.lax.dynamic_slice(c_words, (off,), (wcap,))
            wr = (jnp.arange(wcap, dtype=jnp.int32) + off) < num_ok
            tbl = tbl.at[jnp.where(wr, ii, size)].set(ww, mode="drop")
            return j + 1, tbl

        _, table = jax.lax.while_loop(
            lambda s: s[0] < wrounds, words_body, (jnp.int32(0), table))
    else:
        table = table.at[jnp.where(ok, flat_idx, size)].set(words,
                                                            mode="drop")

    # --- meta lanes (fingerprint + exact key) for fresh voxels ------------
    fresh = head & ~found & (tgt < g)
    num_fresh = jnp.sum(fresh.astype(jnp.int32))
    four = jnp.arange(4, dtype=jnp.int32)[None, :]

    def scatter_meta(tbl, rows_idx, lane_base, fp, ux, uy, uz, write):
        meta = jnp.stack((fp, ux, uy, uz), axis=-1)
        base_idx = jnp.where(write, rows_idx * row_lanes + lane_base, size)
        return tbl.at[base_idx[:, None] + four].set(meta, mode="drop")

    if fresh_capacity >= n:
        table = scatter_meta(table, bucket_key, safe_sub * r + kmax, fpq,
                             ukx, uky, ukz, fresh)
    else:
        # Compact fresh rows to the front (one small sort), then scatter
        # their meta in fresh_capacity-wide chunks from a lax.while_loop:
        # steady state is ONE trip (tens of fresh voxels), a stationary
        # frame is ZERO trips, and bootstrap/teleport frames take
        # ceil(num_fresh / fresh_capacity) trips — exact for any count.
        # A while_loop (unlike lax.cond, which copied the 6 MB table into
        # and out of its branches, ~80 us/frame) aliases its carry in
        # place, so each trip costs only the chunk's element scatter.
        ckey = jnp.where(fresh, safe_sub, jnp.int32(g))
        ckey, ccx, ccy, ccz = jax.lax.sort(
            (ckey, cx, cy, cz), num_keys=1, is_stable=False)
        rounds = (num_fresh + fresh_capacity - 1) // fresh_capacity

        def chunk_body(state):
            j, tbl = state
            # dynamic_slice clamps its start to n - size; clamp explicitly
            # so the write mask matches the rows actually sliced (the final
            # partial chunk then re-writes a few earlier rows with
            # identical values — idempotent).
            off = jnp.minimum(j * fresh_capacity, n - fresh_capacity)
            kk = jax.lax.dynamic_slice(ckey, (off,), (fresh_capacity,))
            kx = jax.lax.dynamic_slice(ccx, (off,), (fresh_capacity,))
            ky = jax.lax.dynamic_slice(ccy, (off,), (fresh_capacity,))
            kz = jax.lax.dynamic_slice(ccz, (off,), (fresh_capacity,))
            cw = (jnp.arange(fresh_capacity, dtype=jnp.int32) + off
                  ) < num_fresh
            tbl = scatter_meta(
                tbl, bucket_of(kx, ky, kz, m.num_buckets),
                jnp.minimum(kk, g - 1) * r + kmax, fingerprint(kx, ky, kz),
                kx.astype(jnp.uint32), ky.astype(jnp.uint32),
                kz.astype(jnp.uint32), cw)
            return j + 1, tbl

        _, table = jax.lax.while_loop(
            lambda s: s[0] < rounds, chunk_body, (jnp.int32(0), table))
    out = MapState(table=table.reshape(m.num_buckets, row_lanes),
                   bucket_slots=g)
    if return_failed:
        failed = jnp.sum((head & ~found & (tgt >= g)).astype(jnp.int32))
        return out, failed
    return out


def evict_far(m: MapState, origin, max_distance: float, voxel_size: float,
              enable=None) -> MapState:
    """RemovePointsFarFromLocation: drop blocks whose first point is far.

    Matches v1.2.0: the test uses only ``points.front()`` of each block and a
    strict ``> max_distance^2`` comparison.  Killed blocks reset their packed
    entries to the sentinel so slot reuse never exposes stale points.

    ``enable`` (scalar bool, optional) gates the whole eviction: folding the
    caller's stationary gate into the kill mask costs nothing here, whereas
    a select over the new-vs-old table after the fact re-streams the full
    table an extra time per frame.
    """
    k, g = m.block_size, m.bucket_slots
    r = k + _META_LANES
    kills = []
    for gi in range(g):
        sub = m.table[:, gi * r:(gi + 1) * r]
        fpt = unpack_offsets(sub[:, 0], sub[:, k + 1].astype(jnp.int32),
                             sub[:, k + 2].astype(jnp.int32),
                             sub[:, k + 3].astype(jnp.int32), voxel_size)
        dx, dy, dz = fpt.x - origin[0], fpt.y - origin[1], fpt.z - origin[2]
        d2 = dx * dx + dy * dy + dz * dz
        kills.append((sub[:, k] != 0) & (d2 > max_distance * max_distance))
    kill = jnp.stack(kills, axis=-1)                              # (B, G)
    if enable is not None:
        kill = kill & enable

    lane_in_slot = jnp.arange(g * r, dtype=jnp.int32) % r
    reset_row = jnp.where(lane_in_slot < k, jnp.uint32(PACKED_SENTINEL),
                          jnp.uint32(0))
    kill_lanes = jnp.repeat(kill, r, axis=-1)                     # (B, G*R)
    table = jnp.where(kill_lanes, reset_row[None, :], m.table)
    return MapState(table=table, bucket_slots=g)


def update(m: MapState, p: P3, mask, pose, voxel_size: float,
           max_distance: float, max_probes: int, enable=None,
           max_extent: float | None = None, return_failed: bool = False):
    """VoxelHashMap::Update: transform by pose, insert, evict far blocks.

    ``enable`` (scalar bool, optional): when False the map is returned
    byte-identical (the caller's stationary gate, folded into the insert
    mask and the eviction kill mask so no full-table select is needed).
    ``return_failed`` adds the insert's bucket-overflow voxel count.
    """
    world = transform(pose, p)
    if enable is not None:
        mask = mask & enable
    m, failed = insert(m, world, mask, voxel_size, max_probes,
                       max_extent=max_extent, return_failed=True)
    m = evict_far(m, pose[:3, 3], max_distance, voxel_size, enable=enable)
    if return_failed:
        return m, failed
    return m
