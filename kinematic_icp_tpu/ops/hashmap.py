"""Device-resident sparse voxel hash map (the local map), SoA layout.

TPU-native equivalent of ``kiss_icp::VoxelHashMap`` (KISS-ICP v1.2.0, used at
/root/reference/cpp/kinematic_icp/pipeline/KinematicICP.{hpp,cpp} and
registration/Registration.cpp:74).  The CPU version is a
``tsl::robin_map<Voxel, VoxelBlock>``; here it becomes a fixed-capacity
open-addressing table in HBM stored as flat planes (structure-of-arrays —
dense 1D layouts so every gather/scatter runs at HBM roofline; see
ops/points.py for why (N, 3) is 40x slower on TPU):

  * ``kx, ky, kz``: (C,) int32 voxel coords; ``kx == EMPTY`` marks a free
                    slot.
  * ``px, py, pz``: (C*K,) float planes of the voxel blocks
                    (K = max_points_per_voxel, block b owns [b*K, (b+1)*K)).
  * ``counts``:     (C,) int32 occupancy per block.

Collision policy: bounded linear probing with a *full-window scan* — lookups
always examine all ``max_probes`` slots of the window, so in-place eviction
(which punches holes in probe chains) needs no tombstones.  Inserts claim the
first free slot in the window via a scatter-min arbitration, which makes the
whole insert a fixed number of gathers/scatters — no data-dependent shapes.

Semantics matched to the reference:
  * first-come-kept voxel blocks (insertion refused when block full),
  * ``GetClosestNeighbor`` scans the 27 voxels around the query's voxel,
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

#: key sentinel marking an empty slot
EMPTY = jnp.iinfo(jnp.int32).min

# 27 neighbor offsets (including the center voxel) as planes, static numpy.
_OFFX = np.array([dx for dx in (-1, 0, 1) for _ in range(9)], np.int32)
_OFFY = np.tile(np.array([dy for dy in (-1, 0, 1) for _ in range(3)],
                         np.int32), 3)
_OFFZ = np.tile(np.array([-1, 0, 1], np.int32), 9)


class MapState(NamedTuple):
    kx: jnp.ndarray      # (C,) int32
    ky: jnp.ndarray      # (C,) int32
    kz: jnp.ndarray      # (C,) int32
    px: jnp.ndarray      # (C*K,) float
    py: jnp.ndarray      # (C*K,) float
    pz: jnp.ndarray      # (C*K,) float
    counts: jnp.ndarray  # (C,) int32

    @property
    def capacity(self):
        return self.counts.shape[-1]

    @property
    def block_size(self):
        return self.px.shape[-1] // self.counts.shape[-1]


def empty(capacity: int, max_points_per_voxel: int, dtype=jnp.float32) -> MapState:
    return MapState(
        kx=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        ky=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        kz=jnp.full((capacity,), EMPTY, dtype=jnp.int32),
        px=jnp.zeros((capacity * max_points_per_voxel,), dtype=dtype),
        py=jnp.zeros((capacity * max_points_per_voxel,), dtype=dtype),
        pz=jnp.zeros((capacity * max_points_per_voxel,), dtype=dtype),
        counts=jnp.zeros((capacity,), dtype=jnp.int32),
    )


def clear(m: MapState) -> MapState:
    return empty(m.capacity, m.block_size, m.px.dtype)


def is_empty(m: MapState):
    return ~jnp.any(m.counts > 0)


def num_voxels(m: MapState):
    return jnp.sum((m.kx != EMPTY).astype(jnp.int32))


def pointcloud(m: MapState):
    """All stored points + validity mask — LocalMap()/Pointcloud() parity.

    Returns (P3 of (C*K,), mask (C*K,)).
    """
    c, k = m.capacity, m.block_size
    mask = (jnp.arange(c * k, dtype=jnp.int32) % k) < jnp.repeat(m.counts, k)
    return P3(m.px, m.py, m.pz), mask


def find_slots(m: MapState, bx, by, bz, max_probes: int):
    """Locate voxels in the table.

    Args:
      bx, by, bz: (..., N) int32 voxel coord planes (SENTINEL -> found=False).
        IMPORTANT: the point dimension must be the LAST (lane) axis; probe
        expansion happens on a new LEADING axis so no tensor ever carries a
        small minor dimension (TPU pads the minor dim to 128 lanes).

    Returns (slot (..., N), found (..., N)); slot arbitrary when not found.
    """
    h = spatial_hash_planar(bx, by, bz)                           # (..., N)
    probes = jnp.arange(max_probes, dtype=jnp.uint32).reshape(
        (max_probes,) + (1,) * h.ndim)
    slots = ((h[None] + probes)
             & jnp.uint32(m.capacity - 1)).astype(jnp.int32)      # (P, ..., N)
    match = ((m.kx[slots] == bx[None]) & (m.ky[slots] == by[None])
             & (m.kz[slots] == bz[None]) & (bx[None] != SENTINEL))
    found = jnp.any(match, axis=0)
    first = jnp.argmax(match, axis=0)
    slot = jnp.take_along_axis(slots, first[None], axis=0)[0]
    return slot, found


def nearest_neighbor(m: MapState, q: P3, query_mask, voxel_size: float,
                     max_probes: int):
    """Batched GetClosestNeighbor over the 27-voxel neighborhood.

    Args:
      q: P3 of (N,) world-frame query planes.
      query_mask: (N,) validity; invalid queries return +inf distance.

    Returns (P3 neighbors (N,), dist (N,)) — the closest stored point and
    its Euclidean distance (inf when the neighborhood holds no points).

    Layout: every expanded tensor keeps N as the minor (lane) axis —
    (27, N) neighbors, (P, 27, N) probes, (K, 27, N) block points — so the
    whole probe + distance computation runs dense on the VPU.
    """
    k = m.block_size
    inv = 1.0 / voxel_size
    bx = jnp.floor(q.x * inv).astype(jnp.int32)[None, :] + _OFFX[:, None]
    by = jnp.floor(q.y * inv).astype(jnp.int32)[None, :] + _OFFY[:, None]
    bz = jnp.floor(q.z * inv).astype(jnp.int32)[None, :] + _OFFZ[:, None]

    slot, found = find_slots(m, bx, by, bz, max_probes)           # (27, N)

    ks = jnp.arange(k, dtype=jnp.int32)[:, None, None]
    flat = slot[None] * k + ks                                    # (K, 27, N)
    gx, gy, gz = m.px[flat], m.py[flat], m.pz[flat]
    dx = gx - q.x[None, None, :]
    dy = gy - q.y[None, None, :]
    dz = gz - q.z[None, None, :]
    d2 = dx * dx + dy * dy + dz * dz

    counts = m.counts[slot]                                       # (27, N)
    valid = (ks < counts[None]) & found[None]                     # (K, 27, N)
    d2 = jnp.where(valid, d2, jnp.inf)

    n = q.x.shape[0]
    d2f = d2.reshape(k * 27, n)
    idx = jnp.argmin(d2f, axis=0)                                 # (N,)
    best_d2 = jnp.take_along_axis(d2f, idx[None], axis=0)[0]
    sel = jnp.take_along_axis(flat.reshape(k * 27, n), idx[None], axis=0)[0]
    nearest = P3(m.px[sel], m.py[sel], m.pz[sel])
    # The per-query mask only needs to poison the final distance (a masked
    # query's neighbor is never consumed downstream).  Folding it into the
    # 3D `valid` tensor instead costs ~100ms: broadcasting an (N,) bool
    # across sublane dims generates pathological TPU code.
    dist = jnp.where(query_mask, jnp.sqrt(best_d2), jnp.inf)
    return nearest, dist


def insert(m: MapState, p: P3, mask, voxel_size: float, max_probes: int) -> MapState:
    """AddPoints: insert world-frame points, first-come-kept per voxel block.

    Points are grouped by voxel (stable lexicographic sort), each group's
    head does find-or-allocate, then members append to the block until
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
    # Index of the group head for every point (forward fill over sorted order).
    head_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, iota, jnp.int32(-1)))
    rank = iota - head_idx  # position within the group, 0 for the head

    # --- find-or-allocate for group heads -------------------------------
    # All probe work stays on (N,) planes (never an (N, P) tensor: the
    # small minor dim would be padded to 128 lanes).
    h = spatial_hash_planar(cx, cy, cz)
    found = jnp.zeros((n,), bool)
    found_slot = jnp.full((n,), -1, dtype=jnp.int32)
    for pr in range(max_probes):
        cand = ((h + jnp.uint32(pr)) & jnp.uint32(capacity - 1)).astype(jnp.int32)
        hit = ((m.kx[cand] == cx) & (m.ky[cand] == cy) & (m.kz[cand] == cz))
        found_slot = jnp.where(~found & hit, cand, found_slot)
        found = found | hit
    found = found & head

    kx_t, ky_t, kz_t = m.kx, m.ky, m.kz
    alloc_slot = jnp.full((n,), -1, dtype=jnp.int32)
    pending = head & ~found
    for pr in range(max_probes):
        cand = ((h + jnp.uint32(pr)) & jnp.uint32(capacity - 1)).astype(jnp.int32)
        empty_here = kx_t[cand] == EMPTY
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
        alloc_slot = jnp.where(winner, cand, alloc_slot)
        pending = pending & ~winner

    head_slot = jnp.where(found, found_slot, alloc_slot)          # -1 if failed
    # Propagate the head's slot to every member of its group.
    slot_pp = jnp.where(head_idx >= 0, head_slot[jnp.maximum(head_idx, 0)], -1)

    # --- append to blocks up to capacity --------------------------------
    base_count = jnp.where(slot_pp >= 0, m.counts[jnp.maximum(slot_pp, 0)], kmax)
    dest_k = base_count + rank
    ok = svalid & (slot_pp >= 0) & (dest_k < kmax)

    flat_dest = jnp.where(ok, slot_pp * kmax + dest_k, capacity * kmax)
    px_t = m.px.at[flat_dest].set(sx, mode="drop")
    py_t = m.py.at[flat_dest].set(sy, mode="drop")
    pz_t = m.pz.at[flat_dest].set(sz, mode="drop")
    counts_t = m.counts.at[jnp.where(ok, slot_pp, capacity)].add(1, mode="drop")
    return MapState(kx=kx_t, ky=ky_t, kz=kz_t, px=px_t, py=py_t, pz=pz_t,
                    counts=counts_t)


def evict_far(m: MapState, origin, max_distance: float) -> MapState:
    """RemovePointsFarFromLocation: drop blocks whose first point is far.

    Matches v1.2.0: the test uses only ``points.front()`` of each block and a
    strict ``> max_distance^2`` comparison.
    """
    c, k = m.capacity, m.block_size
    first = jnp.arange(c, dtype=jnp.int32) * k
    fx, fy, fz = m.px[first], m.py[first], m.pz[first]
    dx, dy, dz = fx - origin[0], fy - origin[1], fz - origin[2]
    d2 = dx * dx + dy * dy + dz * dz
    occupied = m.kx != EMPTY
    kill = occupied & (d2 > max_distance * max_distance)
    return MapState(
        kx=jnp.where(kill, EMPTY, m.kx),
        ky=jnp.where(kill, EMPTY, m.ky),
        kz=jnp.where(kill, EMPTY, m.kz),
        px=m.px, py=m.py, pz=m.pz,
        counts=jnp.where(kill, 0, m.counts),
    )


def update(m: MapState, p: P3, mask, pose, voxel_size: float,
           max_distance: float, max_probes: int) -> MapState:
    """VoxelHashMap::Update: transform by pose, insert, evict far blocks."""
    world = transform(pose, p)
    m = insert(m, world, mask, voxel_size, max_probes)
    return evict_far(m, pose[:3, 3], max_distance)
