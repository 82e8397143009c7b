"""Batched-DP scaling sweep (BASELINE config 3 diagnosis).

Runs the batched sequence runner at batch in {1, 2, 4, 8, 16} for both
bench regimes and prints per-point aggregate fps + DP efficiency, so the
sub-linear scaling has a measured curve instead of a single point.

Usage: python tools/batch_sweep.py [small_frames] [large_frames]
(large regime skipped when large_frames = 0)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMALL_FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
LARGE_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
BATCHES = [int(b) for b in os.environ.get(
    "SWEEP_BATCHES", "1,2,4,8,16").split(",")]


def sweep(tag, cfg, seq, runs=2):
    import jax
    import jax.numpy as jnp

    from kinematic_icp_tpu.offline import (init_batched_state,
                                           make_batched_sequence_runner,
                                           pad_sequence)

    frames = len(seq["frames"])
    pts, ts, mask, has_ts, rels = pad_sequence(
        seq["frames"], seq["rel_odometry"], cfg)
    ext = jnp.asarray(seq["extrinsic"], jnp.float32)
    base_fps = None
    for batch in BATCHES:
        bargs = tuple(
            jnp.asarray(np.broadcast_to(np.asarray(a)[:, None],
                                        (a.shape[0], batch) + a.shape[1:]))
            for a in (pts, ts, mask, has_ts, rels))
        runner = make_batched_sequence_runner(cfg)
        state = init_batched_state(cfg, batch)
        t0 = time.time()
        _, bposes, overflow, _ = runner(state, bargs[0], bargs[1], bargs[2],
                                     bargs[3], ext, bargs[4])
        np.asarray(bposes)
        compile_s = time.time() - t0
        times = []
        for _ in range(runs):
            state = init_batched_state(cfg, batch)
            jax.tree.map(lambda x: x.block_until_ready(), state)
            t0 = time.time()
            _, bposes, _, _ = runner(state, bargs[0], bargs[1], bargs[2],
                                  bargs[3], ext, bargs[4])
            np.asarray(bposes)
            times.append(time.time() - t0)
        fps = batch * frames / min(times)
        if base_fps is None:
            base_fps = fps
        print(json.dumps({
            "tag": tag, "batch": batch,
            "aggregate_fps": round(fps, 1),
            "per_sequence_fps": round(fps / batch, 1),
            "speedup_vs_batch1": round(fps / base_fps, 3),
            "dp_efficiency": round(fps / (base_fps * batch), 3),
            "overflow_any": bool(np.asarray(overflow).any()),
            "compile_s": round(compile_s, 1),
        }), flush=True)


def main():
    from kinematic_icp_tpu import Config
    from kinematic_icp_tpu.utils import synthetic
    from kinematic_icp_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache()

    cfg_small = Config(max_points=4096, max_downsampled=4096,
                       max_source=1024, map_capacity=1 << 14, max_probes=8,
                       voxel_size=1.0, max_range=60.0, deskew=True)
    sweep("small_2.8k", cfg_small, synthetic.make_sequence(SMALL_FRAMES))

    if LARGE_FRAMES:
        # 64K-point inputs are ~0.8 MB/frame/sequence: cap the batch so the
        # replicated input stays well under HBM (batch 8 x 100 frames
        # ~ 630 MB).
        global BATCHES
        BATCHES = [b for b in BATCHES if b <= 8]
        cfg_large = Config(max_points=65536, max_downsampled=8192,
                           max_source=1024, map_capacity=5 << 14,
                           max_probes=5, voxel_size=1.0, max_range=60.0,
                           deskew=True)
        seq = synthetic.make_sequence(
            LARGE_FRAMES, lidar=synthetic.realistic_lidar(),
            clear_path_margin=3.0)
        sweep("large_64k", cfg_large, seq)


if __name__ == "__main__":
    main()
