"""Device-resident sparse voxel hash map (the local map), gather-minimal form.

TPU-native equivalent of ``kiss_icp::VoxelHashMap`` (KISS-ICP v1.2.0, used at
/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.{hpp,cpp} and
registration/Registration.cpp:74).  The CPU version is a
``tsl::robin_map<Voxel, VoxelBlock>``; here it becomes a fixed-capacity
open-addressing table in HBM.

Design driver: XLA TPU gathers cost ~8 ns per gathered ELEMENT (serial
gather engine), so the query path packs everything it touches into single
32-bit words:

  * ``fp``:     (C,) uint32 — key fingerprint (second hash, high bit set);
                0 marks a free slot.  One fingerprint gather replaces three
                exact-key gathers during probing (false-match odds ~2^-26,
                and a false match merely adds a distant candidate).
  * ``packed``: (C*K,) uint32 — block points as 10/10/10-bit offsets inside
                their voxel (~1 mm granularity at 1 m voxels); the sentinel
                0xFFFFFFFF marks unused entries, so NO per-block count
                gather is needed during queries.
  * ``kx,ky,kz``: (C,) int32 exact voxel keys — insert-side find-or-allocate
                stays exact (no fingerprint-collision voxel merging), and
                world positions reconstruct as key*voxel_size + offset.
  * ``counts``: (C,) int32 — insert bookkeeping only.

Collision policy: bounded linear probing with a *full-window scan* — lookups
always examine all ``max_probes`` slots of the window, so in-place eviction
(which punches holes in probe chains) needs no tombstones.  Inserts claim the
first free slot in the window via a scatter-min arbitration.  All expanded
tensors keep the point dimension N in the minor (lane) axis.

Semantics matched to the reference:
  * first-come-kept voxel blocks (insertion refused when block full),
  * ``GetClosestNeighbor`` scans the 27 voxels around the query's voxel
    (optionally pruned to the nearest ``num_candidate_voxels`` by exact
    point-to-voxel-box lower bounds — a TPU-side candidate reduction),
  * ``Update(points, pose)`` = transform, insert, evict blocks whose *first*
    stored point is farther than ``max_distance`` from the pose translation.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .points import P3, transform
from .voxel import SENTINEL, spatial_hash_planar

#: key sentinel marking an empty slot (exact-key planes)
EMPTY = jnp.iinfo(jnp.int32).min
#: packed-point sentinel marking an unused block entry
PACKED_SENTINEL = 0xFFFFFFFF
#: offset quantization steps per voxel edge (10 bits)
_QUANT = 1024

# second spatial hash (fingerprint); distinct constants from the slot hash
_F1, _F2, _F3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D

# 27 neighbor offsets (including the center voxel) as planes, static numpy.
_OFFX = np.array([dx for dx in (-1, 0, 1) for _ in range(9)], np.int32)
_OFFY = np.tile(np.array([dy for dy in (-1, 0, 1) for _ in range(3)],
                         np.int32), 3)
_OFFZ = np.tile(np.array([-1, 0, 1], np.int32), 9)


class MapState(NamedTuple):
    kx: jnp.ndarray      # (C,) int32 exact keys
    ky: jnp.ndarray      # (C,) int32
    kz: jnp.ndarray      # (C,) int32
    fp: jnp.ndarray      # (C,) uint32 fingerprints (0 = empty)
    packed: jnp.ndarray  # (C*K,) uint32 packed point offsets
    counts: jnp.ndarray  # (C,) int32

    @property
    def capacity(self):
        return self.counts.shape[-1]

    @property
    def block_size(self):
        return self.packed.shape[-1] // self.counts.shape[-1]


class CandidateSet(NamedTuple):
    """World-frame candidate points per query, from one gather pass.

    Shapes: (K * V, N) with V = number of candidate voxels per query.
    Reused across GN iterations (the candidate neighborhoods move by
    millimetres between iterations — see registration.py).
    """
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    valid: jnp.ndarray


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


def empty(capacity: int, max_points_per_voxel: int, dtype=jnp.float32) -> MapState:
    del dtype  # packed storage; dtype kept for API compatibility
    return MapState(
        kx=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        ky=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        kz=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        fp=jnp.zeros((capacity,), dtype=jnp.uint32),
        packed=jnp.full((capacity * max_points_per_voxel,), PACKED_SENTINEL,
                        dtype=jnp.uint32),
        counts=jnp.zeros((capacity,), dtype=jnp.int32),
    )


def clear(m: MapState) -> MapState:
    return empty(m.capacity, m.block_size)


def is_empty(m: MapState):
    return ~jnp.any(m.counts > 0)


def num_voxels(m: MapState):
    return jnp.sum((m.fp != 0).astype(jnp.int32))


def pack_offsets(p: P3, bx, by, bz, voxel_size: float):
    """World points -> packed 10/10/10-bit in-voxel offsets."""
    inv = _QUANT / voxel_size
    ox = jnp.clip(((p.x - bx * voxel_size) * inv), 0, _QUANT - 1).astype(jnp.uint32)
    oy = jnp.clip(((p.y - by * voxel_size) * inv), 0, _QUANT - 1).astype(jnp.uint32)
    oz = jnp.clip(((p.z - bz * voxel_size) * inv), 0, _QUANT - 1).astype(jnp.uint32)
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
    parity).  Returns (P3 of (C*K,), mask (C*K,))."""
    c, k = m.capacity, m.block_size
    bx = jnp.repeat(m.kx, k)
    by = jnp.repeat(m.ky, k)
    bz = jnp.repeat(m.kz, k)
    mask = (m.packed != jnp.uint32(PACKED_SENTINEL)) & (bx != EMPTY)
    pts = unpack_offsets(m.packed, bx, by, bz, voxel_size)
    return pts, mask


def _probe_fp(m: MapState, bx, by, bz, max_probes: int):
    """Fingerprint probing: (..., N) coords -> (slot, found) via 1-word gathers."""
    h = spatial_hash_planar(bx, by, bz)
    fpq = fingerprint(bx, by, bz)
    probes = jnp.arange(max_probes, dtype=jnp.uint32).reshape(
        (max_probes,) + (1,) * h.ndim)
    slots = ((h[None] + probes)
             & jnp.uint32(m.capacity - 1)).astype(jnp.int32)      # (P, ..., N)
    match = (m.fp[slots] == fpq[None]) & (bx[None] != SENTINEL)
    found = jnp.any(match, axis=0)
    first = jnp.argmax(match, axis=0)
    slot = jnp.take_along_axis(slots, first[None], axis=0)[0]
    return slot, found


def find_slots(m: MapState, bx, by, bz, max_probes: int):
    """Exact-key lookup (3-word gathers) — used by insert and tests."""
    h = spatial_hash_planar(bx, by, bz)
    probes = jnp.arange(max_probes, dtype=jnp.uint32).reshape(
        (max_probes,) + (1,) * h.ndim)
    slots = ((h[None] + probes)
             & jnp.uint32(m.capacity - 1)).astype(jnp.int32)
    match = ((m.kx[slots] == bx[None]) & (m.ky[slots] == by[None])
             & (m.kz[slots] == bz[None]) & (bx[None] != SENTINEL))
    found = jnp.any(match, axis=0)
    first = jnp.argmax(match, axis=0)
    slot = jnp.take_along_axis(slots, first[None], axis=0)[0]
    return slot, found


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


def gather_candidates(m: MapState, q: P3, voxel_size: float, max_probes: int,
                      num_candidate_voxels: int = 27) -> CandidateSet:
    """One gather pass: candidate map points around each query.

    Args:
      q: P3 of (N,) world-frame query planes.
      num_candidate_voxels: V <= 27 — per query, only the V voxels with the
        smallest point-to-box lower bound are fetched (V=27 is exact; the
        box bound makes smaller V a principled approximation: a voxel can
        only be skipped in favor of voxels that are geometrically closer).

    Returns a CandidateSet of (K*V, N) world points + validity.
    """
    k = m.block_size
    n = q.x.shape[0]
    v = num_candidate_voxels
    inv = 1.0 / voxel_size
    bx = jnp.floor(q.x * inv).astype(jnp.int32)[None, :] + _OFFX[:, None]
    by = jnp.floor(q.y * inv).astype(jnp.int32)[None, :] + _OFFY[:, None]
    bz = jnp.floor(q.z * inv).astype(jnp.int32)[None, :] + _OFFZ[:, None]

    if v < 27:
        # Select the V nearest voxels by box lower bound (elementwise only).
        lb = _box_lower_bound_d2(q, bx, by, bz, voxel_size)       # (27, N)
        sel = jnp.argsort(lb, axis=0)[:v]                          # (V, N)
        bx = jnp.take_along_axis(bx, sel, axis=0)
        by = jnp.take_along_axis(by, sel, axis=0)
        bz = jnp.take_along_axis(bz, sel, axis=0)

    slot, found = _probe_fp(m, bx, by, bz, max_probes)            # (V, N)

    ks = jnp.arange(k, dtype=jnp.int32)[:, None, None]
    flat = slot[None] * k + ks                                    # (K, V, N)
    words = m.packed[flat]
    valid = (words != jnp.uint32(PACKED_SENTINEL)) & found[None]
    pts = unpack_offsets(words, bx[None], by[None], bz[None], voxel_size,
                         q.x.dtype)
    return CandidateSet(
        x=pts.x.reshape(k * v, n), y=pts.y.reshape(k * v, n),
        z=pts.z.reshape(k * v, n), valid=valid.reshape(k * v, n))


def nn_from_candidates(cand: CandidateSet, q: P3, query_mask):
    """Closest candidate per query (elementwise + one tiny gather).

    Returns (P3 neighbors (N,), dist (N,)); inf distance when no candidate.
    """
    dx = cand.x - q.x[None]
    dy = cand.y - q.y[None]
    dz = cand.z - q.z[None]
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(cand.valid, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=0)                                  # (N,)
    best_d2 = jnp.take_along_axis(d2, idx[None], axis=0)[0]
    nearest = P3(
        jnp.take_along_axis(cand.x, idx[None], axis=0)[0],
        jnp.take_along_axis(cand.y, idx[None], axis=0)[0],
        jnp.take_along_axis(cand.z, idx[None], axis=0)[0])
    dist = jnp.where(query_mask, jnp.sqrt(best_d2), jnp.inf)
    return nearest, dist


def nearest_neighbor(m: MapState, q: P3, query_mask, voxel_size: float,
                     max_probes: int, num_candidate_voxels: int = 27):
    """Batched GetClosestNeighbor over the (possibly pruned) neighborhood."""
    cand = gather_candidates(m, q, voxel_size, max_probes, num_candidate_voxels)
    return nn_from_candidates(cand, q, query_mask)


def insert(m: MapState, p: P3, mask, voxel_size: float, max_probes: int) -> MapState:
    """AddPoints: insert world-frame points, first-come-kept per voxel block.

    Points are grouped by voxel (stable lexicographic sort), each group's
    head does exact find-or-allocate, then members append to the block until
    max_points_per_voxel; the remainder is refused — matching the
    reference's ``VoxelBlock::AddPoint`` capacity gate.
    """
    capacity, kmax = m.capacity, m.block_size
    n = p.x.shape[0]
    inv = 1.0 / voxel_size
    cx = jnp.where(mask, jnp.floor(p.x * inv).astype(jnp.int32), SENTINEL)
    cy = jnp.where(mask, jnp.floor(p.y * inv).astype(jnp.int32), SENTINEL)
    cz = jnp.where(mask, jnp.floor(p.z * inv).astype(jnp.int32), SENTINEL)

    # Group by voxel: stable lexicographic sort keeps input order per group.
    cx, cy, cz, sx, sy, sz = jax.lax.sort(
        (cx, cy, cz, p.x, p.y, p.z), num_keys=3, is_stable=True)
    svalid = cx != SENTINEL

    head = ((cx != jnp.roll(cx, 1)) | (cy != jnp.roll(cy, 1))
            | (cz != jnp.roll(cz, 1)))
    head = head.at[0].set(True) & svalid

    iota = jnp.arange(n, dtype=jnp.int32)
    head_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, iota, jnp.int32(-1)))
    rank = iota - head_idx  # position within the group, 0 for the head

    # --- find-or-allocate for group heads (all on (N,) planes) ----------
    h = spatial_hash_planar(cx, cy, cz)
    found = jnp.zeros((n,), bool)
    found_slot = jnp.full((n,), -1, dtype=jnp.int32)
    for pr in range(max_probes):
        cand = ((h + jnp.uint32(pr)) & jnp.uint32(capacity - 1)).astype(jnp.int32)
        hit = ((m.kx[cand] == cx) & (m.ky[cand] == cy) & (m.kz[cand] == cz))
        found_slot = jnp.where(~found & hit, cand, found_slot)
        found = found | hit
    found = found & head

    kx_t, ky_t, kz_t, fp_t = m.kx, m.ky, m.kz, m.fp
    fpq = fingerprint(cx, cy, cz)
    alloc_slot = jnp.full((n,), -1, dtype=jnp.int32)
    pending = head & ~found
    for pr in range(max_probes):
        cand = ((h + jnp.uint32(pr)) & jnp.uint32(capacity - 1)).astype(jnp.int32)
        empty_here = fp_t[cand] == 0
        want = pending & empty_here
        # Arbitrate concurrent claims on the same slot: lowest index wins.
        scatter_idx = jnp.where(want, cand, capacity)
        claim = jnp.full((capacity,), n, dtype=jnp.int32)
        claim = claim.at[scatter_idx].min(iota, mode="drop")
        winner = want & (claim[cand] == iota)
        wslot = jnp.where(winner, cand, capacity)
        kx_t = kx_t.at[wslot].set(cx, mode="drop")
        ky_t = ky_t.at[wslot].set(cy, mode="drop")
        kz_t = kz_t.at[wslot].set(cz, mode="drop")
        fp_t = fp_t.at[wslot].set(fpq, mode="drop")
        alloc_slot = jnp.where(winner, cand, alloc_slot)
        pending = pending & ~winner

    head_slot = jnp.where(found, found_slot, alloc_slot)          # -1 if failed
    slot_pp = jnp.where(head_idx >= 0, head_slot[jnp.maximum(head_idx, 0)], -1)

    # --- append to blocks up to capacity --------------------------------
    base_count = jnp.where(slot_pp >= 0, m.counts[jnp.maximum(slot_pp, 0)], kmax)
    dest_k = base_count + rank
    ok = svalid & (slot_pp >= 0) & (dest_k < kmax)

    words = pack_offsets(P3(sx, sy, sz), cx, cy, cz, voxel_size)
    flat_dest = jnp.where(ok, slot_pp * kmax + dest_k, capacity * kmax)
    packed_t = m.packed.at[flat_dest].set(words, mode="drop")
    counts_t = m.counts.at[jnp.where(ok, slot_pp, capacity)].add(1, mode="drop")
    return MapState(kx=kx_t, ky=ky_t, kz=kz_t, fp=fp_t, packed=packed_t,
                    counts=counts_t)


def evict_far(m: MapState, origin, max_distance: float, voxel_size: float) -> MapState:
    """RemovePointsFarFromLocation: drop blocks whose first point is far.

    Matches v1.2.0: the test uses only ``points.front()`` of each block and a
    strict ``> max_distance^2`` comparison.  Killed blocks reset their packed
    entries to the sentinel so slot reuse never exposes stale points.
    """
    c, k = m.capacity, m.block_size
    first_words = m.packed[jnp.arange(c, dtype=jnp.int32) * k]
    fpt = unpack_offsets(first_words, m.kx, m.ky, m.kz, voxel_size)
    dx, dy, dz = fpt.x - origin[0], fpt.y - origin[1], fpt.z - origin[2]
    d2 = dx * dx + dy * dy + dz * dz
    occupied = m.fp != 0
    kill = occupied & (d2 > max_distance * max_distance)
    kill_pts = jnp.repeat(kill, k)
    return MapState(
        kx=jnp.where(kill, EMPTY, m.kx),
        ky=jnp.where(kill, EMPTY, m.ky),
        kz=jnp.where(kill, EMPTY, m.kz),
        fp=jnp.where(kill, 0, m.fp),
        packed=jnp.where(kill_pts, jnp.uint32(PACKED_SENTINEL), m.packed),
        counts=jnp.where(kill, 0, m.counts),
    )


def update(m: MapState, p: P3, mask, pose, voxel_size: float,
           max_distance: float, max_probes: int) -> MapState:
    """VoxelHashMap::Update: transform by pose, insert, evict far blocks."""
    world = transform(pose, p)
    m = insert(m, world, mask, voxel_size, max_probes)
    return evict_far(m, pose[:3, 3], max_distance, voxel_size)
