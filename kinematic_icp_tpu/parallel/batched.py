"""Host-side runner for batches of independent sequences on a device mesh.

The TPU-native answer to "process many bags": instead of the reference's one
bag at CPU speed (offline_node.cpp), B sequences advance in lock-step, padded
to shared static shapes, with states sharded over the ``data`` axis and each
sequence's map sharded over the ``map`` axis (parallel/sharded.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import Config
from ..oracle.reference import se3_log
from ..utils.compilation_cache import enable_compilation_cache
from . import sharded
from .mesh import make_mesh


class BatchedOdometryRunner:
    """Lock-step batched odometry over a (data, map) mesh."""

    def __init__(self, config: Config, batch: int, mesh=None,
                 extrinsic=None, stationary_gate: float = 1e-3,
                 dtype=jnp.float32):
        enable_compilation_cache()
        self.config = config
        self.batch = batch
        self.mesh = mesh if mesh is not None else make_mesh(data=1, map=1)
        self.extrinsic = (np.eye(4) if extrinsic is None
                          else np.asarray(extrinsic, np.float64))
        self.stationary_gate = stationary_gate
        self.state = sharded.init_sharded_state(config, self.mesh, batch, dtype)
        self.step_fn = sharded.make_sharded_step(config, self.mesh)
        self._scan_runner = None
        self.poses = [[] for _ in range(batch)]

    def step(self, frames, rel_odometry, timestamps=None):
        """Advance every sequence by one frame.

        Args:
          frames: list of B (N_i, 3) arrays (None = sequence finished;
            treated as stationary empty frame).
          rel_odometry: list of B (4, 4) deltas (None = identity).
          timestamps: optional list of B (N_i,) normalized times.

        Returns (B, 4, 4) numpy poses after the step.
        """
        b, n = self.batch, self.config.max_points
        pts = np.zeros((b, n, 3), np.float32)
        ts = np.zeros((b, n), np.float32)
        mask = np.zeros((b, n), bool)
        has_ts = np.zeros((b,), bool)
        rel = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        active = np.zeros((b,), bool)

        for i in range(b):
            f = frames[i] if i < len(frames) else None
            r = rel_odometry[i] if rel_odometry and i < len(rel_odometry) else None
            if r is not None:
                rel[i] = np.asarray(r, np.float32)
                active[i] = np.linalg.norm(
                    se3_log(np.asarray(r, np.float64))) > self.stationary_gate
            if f is None:
                active[i] = False
                continue
            f = np.asarray(f, np.float32).reshape(-1, 3)
            k = min(len(f), n)
            pts[i, :k] = f[:k]
            mask[i, :k] = True
            if timestamps is not None and timestamps[i] is not None:
                t = np.asarray(timestamps[i], np.float32)
                ts[i, :k] = t[:k]
                has_ts[i] = True

        self.state, out = self.step_fn(
            self.state, jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
            jnp.asarray(has_ts), jnp.asarray(self.extrinsic.astype(np.float32)),
            jnp.asarray(rel), jnp.asarray(active))
        poses = np.asarray(out.pose, np.float64)
        for i in range(b):
            self.poses[i].append(poses[i])
        return poses

    def run_device(self, sequences):
        """Run B sequences to completion in ONE device dispatch.

        The whole-sequence variant of ``run()``: frames pre-pad to
        (F, B, N, ...) arrays and the frame recurrence advances inside a
        ``lax.scan`` nested in the (data, map) ``shard_map``
        (``sharded.make_sharded_sequence_runner``) — no per-frame host
        round trip, which on a tunnel-attached chip is a ~22 ms floor per
        frame.  Ragged sequence lengths pad with identity odometry =
        stationary frames whose state updates are write-masked (the
        device-side gate uses the standard 1e-3 threshold, like
        ``offline.make_sequence_runner``).  Appends to ``self.poses``
        (trimmed to each sequence's true length) and returns it.
        """
        import jax.numpy as jnp

        b, n = self.batch, self.config.max_points
        from ..offline import pad_sequence
        num_frames = max(len(s["frames"]) for s in sequences)
        pts = np.zeros((num_frames, b, n, 3), np.float32)
        ts = np.zeros((num_frames, b, n), np.float32)
        mask = np.zeros((num_frames, b, n), bool)
        has_ts = np.zeros((num_frames, b), bool)
        rels = np.tile(np.eye(4, dtype=np.float32), (num_frames, b, 1, 1))
        for i, s in enumerate(sequences[:b]):
            f_i = len(s["frames"])
            p5 = pad_sequence(s["frames"], s["rel_odometry"], self.config)
            pts[:f_i, i], ts[:f_i, i], mask[:f_i, i] = p5[0], p5[1], p5[2]
            has_ts[:f_i, i], rels[:f_i, i] = p5[3], p5[4]
        if self._scan_runner is None:
            self._scan_runner = sharded.make_sharded_sequence_runner(
                self.config, self.mesh)
        self.state, poses, overflow = self._scan_runner(
            self.state, jnp.asarray(pts), jnp.asarray(ts),
            jnp.asarray(mask), jnp.asarray(has_ts),
            jnp.asarray(self.extrinsic.astype(np.float32)),
            jnp.asarray(rels))
        poses = np.asarray(poses, np.float64)
        overflow = np.asarray(overflow)
        for i in range(b):
            f_i = (len(sequences[i]["frames"]) if i < len(sequences)
                   else num_frames)
            self.poses[i].extend(list(poses[:f_i, i]))
        if overflow.any():
            import warnings
            warnings.warn(
                f"capacity overflow per sequence {overflow.tolist()} — "
                f"raise max_downsampled/max_source/map_capacity")
        return self.poses

    def run(self, sequences):
        """Run B sequences to completion (ragged lengths padded with None).

        ``sequences``: list of B dicts with keys ``frames`` (list of
        (points, timestamps)) and ``rel_odometry`` (list of (4, 4)).
        Returns list of per-sequence pose lists.
        """
        num_frames = max(len(s["frames"]) for s in sequences)
        for k in range(num_frames):
            frames, rels, tss = [], [], []
            for s in sequences:
                if k < len(s["frames"]):
                    pts_k, ts_k = s["frames"][k]
                    frames.append(pts_k)
                    tss.append(ts_k)
                    rels.append(s["rel_odometry"][k])
                else:
                    frames.append(None)
                    tss.append(None)
                    rels.append(None)
            self.step(frames, rels, tss)
        return self.poses
