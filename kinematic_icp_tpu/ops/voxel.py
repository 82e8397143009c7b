"""Voxel-grid utilities: point->voxel coords, spatial hashing, downsampling.

TPU-native equivalent of ``kiss_icp::VoxelDownsample`` / ``PointToVoxel``
(KISS-ICP v1.2.0, used at /root/reference/cpp/kinematic_icp/pipeline/
KinematicICP.cpp:38-44).  The robin-map based "keep first point per voxel"
becomes a lexicographic multi-key sort + run-head compaction under static
shapes: invalid/padded points carry a sentinel voxel key that sorts last.
All point data is planar (ops/points.py) for dense TPU layouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .points import P3

#: sentinel voxel coordinate for invalid/padded points (sorts after any real
#: coordinate and never equals a real voxel of an in-range point)
SENTINEL = jnp.iinfo(jnp.int32).max

# KISS-ICP spatial hash constants (VoxelHashMap.cpp, v1.2.0).  Plain ints so
# importing this module does not initialize a JAX backend.
_HX = 73856093
_HY = 19349669
_HZ = 83492791


def voxel_coords_planar(p: P3, voxel_size: float):
    """floor(p / voxel_size) planes as int32, per KISS-ICP PointToVoxel."""
    inv = 1.0 / voxel_size
    return (jnp.floor(p.x * inv).astype(jnp.int32),
            jnp.floor(p.y * inv).astype(jnp.int32),
            jnp.floor(p.z * inv).astype(jnp.int32))


def voxel_coords(points, voxel_size: float):
    """(..., 3) array form (host/test convenience)."""
    return jnp.floor(points / voxel_size).astype(jnp.int32)


def spatial_hash_planar(bx, by, bz):
    """Voxel coord planes -> (...,) uint32 hash (KISS-ICP constants)."""
    return ((bx.astype(jnp.uint32) * jnp.uint32(_HX))
            ^ (by.astype(jnp.uint32) * jnp.uint32(_HY))
            ^ (bz.astype(jnp.uint32) * jnp.uint32(_HZ)))


def spatial_hash(coords):
    """(..., 3) int32 voxel coords -> (...,) uint32 hash."""
    return spatial_hash_planar(coords[..., 0], coords[..., 1], coords[..., 2])


#: packed relative-coordinate sentinel (all-ones sorts last)
PACKED_KEY_SENTINEL = 0xFFFFFFFF


def pack_rebased_keys(cx, cy, cz, mask):
    """Voxel coord planes -> ONE u32 sort key (10 bits/axis, rebased).

    A frame's in-range points span at most ~2*max_range/voxel_size cells
    per axis regardless of where the robot has drifted, so coords rebased
    to the frame's per-axis minimum fit 10 bits whenever the caller's
    static bound allows (see ``packable_span``).  One u32 key instead of
    three i32 keys makes the grouping sorts ~1.7x cheaper.  Invalid points
    pack to an all-ones sentinel that sorts last.  Equal keys <=> equal
    voxels (rebasing is a per-axis constant shift).
    """
    big = jnp.int32(1 << 30)
    mx = jnp.min(jnp.where(mask, cx, big))
    my = jnp.min(jnp.where(mask, cy, big))
    mz = jnp.min(jnp.where(mask, cz, big))
    rx, ry, rz = cx - mx, cy - my, cz - mz
    # Defensive: a point past the caller's static extent bound drops for
    # this frame instead of corrupting the bit-packed grouping.
    mask = mask & (rx < 1024) & (ry < 1024) & (rz < 1024)
    key = ((rx.astype(jnp.uint32) << 20) | (ry.astype(jnp.uint32) << 10)
           | rz.astype(jnp.uint32))
    return jnp.where(mask, key, jnp.uint32(PACKED_KEY_SENTINEL))


def packable_span(voxel_size: float, max_extent: float | None) -> bool:
    """Static check: does a frame's coord span fit 10 bits per axis?"""
    if max_extent is None:
        return False
    return max_extent / voxel_size + 8 < 1024


#: width at which the packed-word (quantized-payload) sort path engages;
#: below this the sorts are cheap and points stay exact f32.
PACKED_WORD_MIN_N = 32768


def _packed_downsample_core(p: P3, mask, voxel_size: float,
                            tiebreak: str = "first"):
    """Grouping + compaction of the packed-word downsample path.

    Returns (fkey (N,) u32, fword (N,) u32, (mnx, mny, mnz), num_heads):
    the first ``num_heads`` rows of (fkey, fword) are the surviving voxels
    in voxel-lex order; the tail is sentinel-keyed.  The compaction is ONE
    2-operand unstable sort: head keys are UNIQUE (one head per voxel), so
    re-keying non-heads to the sentinel and sorting by key directly is
    bit-identical to the old (pos, key, word) 3-operand sort at ~2/3 the
    cost (~14.5 us/operand at 64K, docs/performance.md cost model).
    """
    cx, cy, cz = voxel_coords_planar(p, voxel_size)
    n = cx.shape[0]
    inv = 1.0 / voxel_size
    key = pack_rebased_keys(cx, cy, cz, mask)
    wx = jnp.clip((p.x * inv - cx) * 1024.0, 0, 1023).astype(jnp.uint32)
    wy = jnp.clip((p.y * inv - cy) * 1024.0, 0, 1023).astype(jnp.uint32)
    wz = jnp.clip((p.z * inv - cz) * 1024.0, 0, 1023).astype(jnp.uint32)
    word = jnp.where(mask, (wx << 20) | (wy << 10) | wz, jnp.uint32(0))
    idx = jnp.arange(n, dtype=jnp.int32)
    if tiebreak == "first":
        # (key, idx) is unique, so the unstable 2-key sort IS the stable
        # 1-key sort, without XLA's appended-iota operand.
        key, _, word = jax.lax.sort((key, idx, word), num_keys=2,
                                    is_stable=False)
    else:
        # "min": representative = smallest quantized offset — one fewer
        # sort operand, and permutation-invariant.
        assert tiebreak == "min", tiebreak
        key, word = jax.lax.sort((key, word), num_keys=2, is_stable=False)
    valid = key != jnp.uint32(PACKED_KEY_SENTINEL)
    head = (key != jnp.roll(key, 1)).at[0].set(True) & valid
    key2 = jnp.where(head, key, jnp.uint32(PACKED_KEY_SENTINEL))
    fkey, fword = jax.lax.sort((key2, word), num_keys=1, is_stable=False)
    big = jnp.int32(1 << 30)
    mnx = jnp.min(jnp.where(mask, cx, big))
    mny = jnp.min(jnp.where(mask, cy, big))
    mnz = jnp.min(jnp.where(mask, cz, big))
    return fkey, fword, (mnx, mny, mnz), jnp.sum(head)


def _reconstruct_packed(fkey, fword, mins, voxel_size: float):
    """(key, word) rows -> P3 world points (bin centres), planes aligned
    with the input rows (garbage on sentinel rows — callers mask)."""
    mnx, mny, mnz = mins
    ten = jnp.uint32(1023)
    half = jnp.float32(0.5 / 1024.0)

    def rec(kshift, wshift, mn):
        c = ((fkey >> kshift) & ten).astype(jnp.int32) + mn
        o = ((fword >> wshift) & ten).astype(jnp.float32)
        return (c.astype(jnp.float32) + o * (1.0 / 1024.0) + half
                ) * voxel_size

    return P3(rec(20, 20, mnx), rec(10, 10, mny), rec(0, 0, mnz))


def _truncate(planes: P3, n: int, out_size: int):
    if out_size <= n:
        return P3(planes.x[:out_size], planes.y[:out_size],
                  planes.z[:out_size])
    pad = out_size - n
    return P3(*(jnp.concatenate([a, jnp.zeros((pad,), a.dtype)])
                for a in (planes.x, planes.y, planes.z)))


def voxel_downsample(p: P3, mask, voxel_size: float, out_size: int,
                     max_extent: float | None = None,
                     tiebreak: str = "first"):
    """Keep the first (in input order) point of each occupied voxel.

    Args:
      p: P3 of (N,) planes (padded).
      mask: (N,) bool validity.
      voxel_size: grid pitch.
      out_size: static output capacity.
      max_extent: optional static bound on the spatial extent of the valid
        points (e.g. 2 * max_range for a range-filtered scan); when the
        implied coord span fits 10 bits/axis the grouping sort runs on one
        packed u32 key instead of three i32 keys.

    Returns (P3 of (out_size,), out_mask (out_size,), num_dropped).
    Output order is voxel-lexicographic (the reference's robin_map iteration
    order is arbitrary, so downstream consumers cannot depend on order
    anyway).  Voxels beyond ``out_size`` are dropped — the reference's
    dynamic containers drop nothing, so ``num_dropped`` (scalar int32, the
    count of occupied voxels past capacity) is surfaced for the caller to
    gate or warn on (choose capacities so it stays 0).

    At widths >= ``PACKED_WORD_MIN_N`` with a packable span, the point
    payload rides the two grouping sorts as ONE u32 of 10-bit-per-axis
    within-voxel offsets instead of three f32 planes (TPU sort cost is
    ~linear in operand count: 5 -> 3 operands is ~1.6x cheaper at 64K).
    Surviving points are reconstructed to bin centers, quantizing them by
    at most voxel_size/2048 per axis (0.24 mm at the 0.5 m map-update
    grid — 4x below the hash map's own 10-bit point packing, and ~100x
    below the reference's own input-order sensitivity; see
    tests/test_differential.py::TestChaosFloor).  First-point-wins is
    exact: the input index is the sort's tie-break key, and equal
    (voxel, word) pairs reconstruct identically.
    """
    cx, cy, cz = voxel_coords_planar(p, voxel_size)
    n = cx.shape[0]

    if packable_span(voxel_size, max_extent) and n >= PACKED_WORD_MIN_N:
        fkey, fword, mins, num_heads = _packed_downsample_core(
            p, mask, voxel_size, tiebreak=tiebreak)
        out = _truncate(_reconstruct_packed(fkey, fword, mins, voxel_size),
                        n, out_size)
    else:
        # Stable sort; stability keeps the first input point at the head of
        # each equal-key run ("first point wins").
        if packable_span(voxel_size, max_extent):
            key = pack_rebased_keys(cx, cy, cz, mask)
            key, sx, sy, sz = jax.lax.sort(
                (key, p.x, p.y, p.z), num_keys=1, is_stable=True)
            valid = key != jnp.uint32(PACKED_KEY_SENTINEL)
            head = key != jnp.roll(key, 1)
        else:
            cx = jnp.where(mask, cx, SENTINEL)
            cy = jnp.where(mask, cy, SENTINEL)
            cz = jnp.where(mask, cz, SENTINEL)
            cx, cy, cz, sx, sy, sz = jax.lax.sort(
                (cx, cy, cz, p.x, p.y, p.z), num_keys=3, is_stable=True)
            valid = cx != SENTINEL
            head = ((cx != jnp.roll(cx, 1)) | (cy != jnp.roll(cy, 1))
                    | (cz != jnp.roll(cz, 1)))
        head = head.at[0].set(True) & valid

        # Compact heads to the front with one more sort (element scatters
        # cost ~10 ns each on TPU; a sort is ~an order cheaper).  The key is
        # the sorted position for heads — unique, so no stability needed —
        # and head order is preserved.
        key = jnp.where(head, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
        _, ox, oy, oz = jax.lax.sort((key, sx, sy, sz), num_keys=1,
                                     is_stable=False)
        out = _truncate(P3(ox, oy, oz), n, out_size)
        num_heads = jnp.sum(head)
    num_kept = jnp.minimum(num_heads, out_size)
    out_mask = jnp.arange(out_size) < num_kept
    return out, out_mask, (num_heads - num_kept).astype(jnp.int32)


def double_downsample(p: P3, mask, voxel_size: float, *,
                      max_downsampled: int, max_source: int,
                      max_extent: float | None = None,
                      tiebreak: str = "first"):
    """KISS-ICP's double downsample (reference KinematicICP.cpp:38-44).

    Returns (source, source_mask, frame_downsample, frame_downsample_mask,
    dropped): frame_downsample at 0.5 * voxel_size feeds the map update;
    source at 1.5 * voxel_size (of frame_downsample) feeds the ICP.
    ``dropped`` is a (2,) int32 of capacity-overflow voxel counts
    (frame_downsample, source) — 0 when capacities are sized right.
    """
    frame_ds, frame_ds_mask, drop_ds = voxel_downsample(
        p, mask, voxel_size * 0.5, max_downsampled, max_extent=max_extent,
        tiebreak=tiebreak)
    source, source_mask, drop_src = voxel_downsample(
        frame_ds, frame_ds_mask, voxel_size * 1.5, max_source,
        max_extent=max_extent)
    return (source, source_mask, frame_ds, frame_ds_mask,
            jnp.stack([drop_ds, drop_src]))
