"""Benchmark: odometry frames/sec per chip vs the CPU reference oracle.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / <reference-algorithm CPU fps>}

The baseline is the float64 CPU oracle (kinematic_icp_tpu.oracle), a faithful
transcription of the reference C++ algorithm — the reference itself cannot be
compiled here (its build fetches KISS-ICP from the network).  The device run
processes the whole sequence in one lax.scan (no per-frame host round trips),
which is the intended offline deployment mode.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NUM_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
ORACLE_FRAMES = int(os.environ.get("BENCH_ORACLE_FRAMES", "12"))


def main():
    from kinematic_icp_tpu import Config
    from kinematic_icp_tpu.offline import (make_sequence_runner, pad_sequence)
    from kinematic_icp_tpu.models import pipeline
    from kinematic_icp_tpu.oracle import OracleKinematicICP
    from kinematic_icp_tpu.oracle.reference import se3_log
    from kinematic_icp_tpu.utils import synthetic
    from kinematic_icp_tpu.utils.compilation_cache import enable_compilation_cache
    from kinematic_icp_tpu.utils.evaluation import ate_rmse
    import jax
    import jax.numpy as jnp

    enable_compilation_cache()

    cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                 map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                 deskew=True)

    seq = synthetic.make_sequence(NUM_FRAMES)
    pts, ts, mask, has_ts, rels = pad_sequence(
        seq["frames"], seq["rel_odometry"], cfg)

    runner = make_sequence_runner(cfg)
    ext = jnp.eye(4)

    def device_run():
        state = pipeline.init_state(cfg)
        final_state, poses = runner(
            state, jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
            jnp.asarray(has_ts), ext, jnp.asarray(rels))
        return np.asarray(poses, np.float64)

    # Warm-up (compile) then timed run.
    t0 = time.time()
    poses = device_run()
    compile_and_first = time.time() - t0
    t0 = time.time()
    poses = device_run()
    elapsed = time.time() - t0
    fps = NUM_FRAMES / elapsed

    # Accuracy sanity vs ground truth.
    ate = ate_rmse(seq["gt_poses"], list(poses), align=False)

    # CPU oracle baseline (reference algorithm, float64, dict map).
    oracle = OracleKinematicICP(cfg)
    t0 = time.time()
    done = 0
    for k in range(min(ORACLE_FRAMES, NUM_FRAMES)):
        p, t = seq["frames"][k]
        rel = seq["rel_odometry"][k]
        if np.linalg.norm(se3_log(rel)) > 1e-3:
            oracle.register_frame(p.astype(np.float64), t.astype(np.float64),
                                  seq["extrinsic"], rel)
        done += 1
    oracle_fps = done / (time.time() - t0)

    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / oracle_fps, 3),
        "details": {
            "device": str(jax.devices()[0]),
            "num_frames": NUM_FRAMES,
            "compile_plus_first_run_sec": round(compile_and_first, 2),
            "ate_vs_gt_m": round(ate, 4),
            "oracle_cpu_fps": round(oracle_fps, 3),
            "oracle_frames_timed": done,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
