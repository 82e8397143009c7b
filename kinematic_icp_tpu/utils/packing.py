"""Single-transfer frame upload codec for the online serving path.

Why this exists: the per-message path of the reference is one synchronous
``RegisterFrame`` per scan (online_node.cpp:40-67).  On a tunnel-attached
TPU every host->device transfer pays a measured ~22 ms protocol floor
*regardless of size*, and concurrent transfers serialize (6 x ~170 KB
transfers take 6 x ~30 ms, not 30 ms) — so the round-4 server, which
shipped points / timestamps / mask / has_ts / extrinsic / rel as six
separate ``jnp.asarray`` calls, paid ~6 floors per frame and capped at
~13 fps no matter how fast the chip was.

The fix is to ship each frame as ONE flat uint16 buffer:

  ``[64-word header | position words | timestamp words]``

header words (all little-endian u16):
  [0:2]   valid point count (u32 as lo, hi)
  [2]     has_timestamps flag
  [3]     active flag (1 = real frame; an all-zero buffer is an inactive
          padding frame whose state updates are write-masked — used by the
          chunk-scan streaming mode to pad partial chunks to one static
          shape)
  [4:36]  relative_odometry 4x4 f32, row-major (2 words per value)
  [36:42] position offset xyz f32 (quantized codec)
  [42:48] position scale  xyz f32 (quantized codec)
  [48:64] reserved

body, codec "f32" (lossless — bit-exact round trip):
  positions as raw f32 bits, point-major (6 words/point), then
  timestamps as raw f32 bits (2 words/point).  W = 64 + 8*bucket.

body, codec "u16" (quantized — half the bytes):
  positions as ``round((p - offset) / scale)`` per axis (3 words/point),
  timestamps as ``round(t * 65535)`` (1 word/point).  W = 64 + 4*bucket.
  Per-frame offset/scale are chosen from the frame's bounding box, so the
  worst-case quantization error is ``extent / 2 / 65535`` per axis —
  ~0.9 mm at a 120 m scene extent, under the map's own ~0.5 mm packed-key
  quantization and ~1000x below the voxel size.  bench.py gates the
  codec's trajectory ATE against the reference chaos floor.

The unpack side is pure JAX and runs *inside* the jitted odometry step, so
the host does exactly one ``device_put`` per frame (or one per K-frame
chunk in streaming mode) and zero other per-frame transfers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

HEADER_WORDS = 64
CODECS = ("f32", "u16")


def packed_words(bucket: int, codec: str) -> int:
    """Total u16 words for one packed frame at the given point bucket."""
    assert codec in CODECS, codec
    return HEADER_WORDS + (8 if codec == "f32" else 4) * bucket


def packed_bytes(bucket: int, codec: str) -> int:
    return 2 * packed_words(bucket, codec)


# ----------------------------------------------------------------------
# Host side (numpy): pack one frame into a preallocated u16 row.
# ----------------------------------------------------------------------

def _f32_words(values) -> np.ndarray:
    """f32 array -> interleaved (lo, hi) u16 words.

    On a little-endian host this is just a reinterpreting view — each f32's
    bytes [b0 b1 b2 b3] read as u16 pairs [b0b1, b2b3] = [lo, hi], exactly
    the layout ``_words_to_f32`` reassembles on device (which is
    endianness-explicit, so the host must be little-endian — asserted once).
    """
    assert np.little_endian, "packing codec assumes a little-endian host"
    return np.ascontiguousarray(values, np.float32).view(np.uint16).ravel()


def pack_frame_into(buf: np.ndarray, points, timestamps, relative_odometry,
                    codec: str) -> int:
    """Pack one scan into ``buf`` (a zeroed (W,) u16 row); returns count.

    ``points`` (N, 3) float; ``timestamps`` (N,) in [0, 1] or None;
    ``relative_odometry`` (4, 4).  Points beyond the bucket are the
    caller's to count as truncated.  The zeroed padding reproduces the
    old explicit zero-pad exactly, so the "f32" codec round-trips the
    legacy (pts, ts, mask) inputs bit-for-bit.
    """
    bucket = (buf.shape[0] - HEADER_WORDS) // (8 if codec == "f32" else 4)
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    n = min(len(pts), bucket)
    pts = pts[:n]
    has_ts = timestamps is not None and len(timestamps) >= n > 0
    ts = (np.clip(np.asarray(timestamps, np.float32)[:n], 0.0, 1.0)
          if has_ts else None)

    buf[0] = n & 0xFFFF
    buf[1] = n >> 16
    buf[2] = 1 if has_ts else 0
    buf[3] = 1  # active (zeroed padding buffers stay inactive)
    buf[4:36] = _f32_words(np.asarray(relative_odometry, np.float32))
    if codec == "f32":
        if n:
            buf[HEADER_WORDS:HEADER_WORDS + 6 * n] = _f32_words(pts)
            if has_ts:
                o = HEADER_WORDS + 6 * bucket
                buf[o:o + 2 * n] = _f32_words(ts)
    else:
        if n:
            offset = pts.min(axis=0)
            scale = np.maximum(pts.max(axis=0) - offset, 1e-12) / 65535.0
            # round-half-up via floor(x + 0.5): one fused temporary chain,
            # ~3x faster than rint+clip on 64K rows; the half-ulp tie
            # direction is irrelevant at this codec's error bound
            q = np.clip((pts - offset) * (1.0 / scale) + 0.5, 0.0, 65535.0)
            buf[36:42] = _f32_words(offset)
            buf[42:48] = _f32_words(scale)
            buf[HEADER_WORDS:HEADER_WORDS + 3 * n] = \
                q.astype(np.uint16).ravel()
            if has_ts:
                o = HEADER_WORDS + 3 * bucket
                buf[o:o + n] = (ts * 65535.0 + 0.5).astype(np.uint16)
    return n


def pack_frame(points, timestamps, relative_odometry, bucket: int,
               codec: str) -> tuple[np.ndarray, int]:
    """Allocate-and-pack convenience wrapper; returns (buf, count)."""
    buf = np.zeros(packed_words(bucket, codec), np.uint16)
    n = pack_frame_into(buf, points, timestamps, relative_odometry, codec)
    return buf, n


# ----------------------------------------------------------------------
# Device side (pure JAX, runs inside jit): unpack.
# ----------------------------------------------------------------------

def _words_to_f32(w):
    """Interleaved (lo, hi) u16 words -> f32 (inverse of ``_f32_words``)."""
    w = w.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        w[0::2] | (w[1::2] << 16), jnp.float32)


def unpack_frame(packed, bucket: int, codec: str, return_active=False):
    """(W,) u16 device buffer -> (points (B,3) f32, ts (B,), mask (B,),
    has_timestamps scalar bool, relative_odometry (4,4) f32[, active])."""
    assert codec in CODECS, codec
    hdr = packed[:HEADER_WORDS]
    count = hdr[0].astype(jnp.uint32) | (hdr[1].astype(jnp.uint32) << 16)
    has_ts = hdr[2] > 0
    rel = _words_to_f32(hdr[4:36]).reshape(4, 4)
    body = packed[HEADER_WORDS:]
    if codec == "f32":
        pts = _words_to_f32(body[:6 * bucket]).reshape(bucket, 3)
        ts = _words_to_f32(body[6 * bucket:8 * bucket])
    else:
        offset = _words_to_f32(hdr[36:42])
        scale = _words_to_f32(hdr[42:48])
        pts = (offset[None, :]
               + body[:3 * bucket].reshape(bucket, 3).astype(jnp.float32)
               * scale[None, :])
        ts = body[3 * bucket:4 * bucket].astype(jnp.float32) * (1.0 / 65535.0)
    mask = jnp.arange(bucket, dtype=jnp.uint32) < count
    if return_active:
        # identity rel for inactive (all-zero) padding buffers: their rel
        # words decode to a zero matrix, which would poison the pose
        # composition even under write-masking
        rel = jnp.where(hdr[3] > 0, rel, jnp.eye(4, dtype=rel.dtype))
        return pts, ts, mask, has_ts, rel, hdr[3] > 0
    return pts, ts, mask, has_ts, rel
