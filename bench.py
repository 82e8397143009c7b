"""Benchmark: odometry frames/sec per chip vs the CPU reference oracle.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / <reference-algorithm CPU fps>}

The baseline is the float64 CPU oracle (kinematic_icp_tpu.oracle), a faithful
transcription of the reference C++ algorithm — the reference itself cannot be
compiled here (its build fetches KISS-ICP from the network).  The device run
processes the whole sequence in one lax.scan (no per-frame host round trips),
which is the intended offline deployment mode.

Robustness: tunnel-attached TPU pools occasionally hand out a degraded
session where every dispatch runs ~1000x slower.  We calibrate with a small
representative program first and re-exec the process (fresh pool assignment)
up to BENCH_MAX_ATTEMPTS times if degradation is detected; the timed section
itself is best-of-BENCH_RUNS with state init and uploads excluded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NUM_FRAMES = int(os.environ.get("BENCH_FRAMES", "100"))
ORACLE_FRAMES = int(os.environ.get("BENCH_ORACLE_FRAMES", "12"))
BENCH_RUNS = int(os.environ.get("BENCH_RUNS", "3"))
MAX_ATTEMPTS = int(os.environ.get("BENCH_MAX_ATTEMPTS", "3"))
_ATTEMPT = int(os.environ.get("_BENCH_ATTEMPT", "0"))
#: healthy dispatch of the calibration program is <2 ms; degraded ~140 ms
CALIB_THRESHOLD_MS = float(os.environ.get("BENCH_CALIB_THRESHOLD_MS", "20"))


def calibrate_dispatch_ms():
    """Time a small-but-representative jitted program (gather-heavy NN)."""
    import jax
    import jax.numpy as jnp

    from kinematic_icp_tpu.ops import hashmap
    from kinematic_icp_tpu.ops.points import P3

    C, K, N = 1 << 14, 20, 4096
    rng = np.random.default_rng(0)
    pts = P3.from_array(jnp.asarray(
        rng.uniform(-40, 40, (N, 3)).astype(np.float32)))
    mask = jnp.ones(N, bool)
    m = jax.jit(lambda m, p: hashmap.insert(m, p, mask, 1.0, 4))(
        hashmap.empty(C, K), pts)
    f = jax.jit(lambda m, q, mk: hashmap.nearest_neighbor(m, q, mk, 1.0, 4, 12))
    np.asarray(f(m, pts, mask)[1])
    t0 = time.time()
    for _ in range(10):
        r = f(m, pts, mask)
    np.asarray(r[1])  # true completion barrier (relay-safe)
    return (time.time() - t0) / 10 * 1000


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

    calib_ms = calibrate_dispatch_ms()
    if calib_ms > CALIB_THRESHOLD_MS and _ATTEMPT + 1 < MAX_ATTEMPTS:
        print(f"[bench] degraded session detected "
              f"(calibration {calib_ms:.1f} ms/dispatch); re-executing "
              f"(attempt {_ATTEMPT + 1}/{MAX_ATTEMPTS})", file=sys.stderr)
        os.environ["_BENCH_ATTEMPT"] = str(_ATTEMPT + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                 map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                 deskew=True)

    seq = synthetic.make_sequence(NUM_FRAMES)
    pts, ts, mask, has_ts, rels = pad_sequence(
        seq["frames"], seq["rel_odometry"], cfg)

    runner = make_sequence_runner(cfg)
    ext = jnp.eye(4)
    dev_args = (jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
                jnp.asarray(has_ts), ext, jnp.asarray(rels))
    jax.tree.map(lambda x: x.block_until_ready(), dev_args)

    # Warm-up (compile) + correctness capture.
    state = pipeline.init_state(cfg)
    t0 = time.time()
    _, poses = runner(state, *dev_args)
    poses = np.asarray(poses, np.float64)
    compile_and_first = time.time() - t0

    # Timed: best of BENCH_RUNS, state init excluded.
    times = []
    for _ in range(BENCH_RUNS):
        st = pipeline.init_state(cfg)
        jax.tree.map(lambda x: x.block_until_ready(), st)
        t0 = time.time()
        _, p = runner(st, *dev_args)
        p = np.asarray(p)  # relay-safe completion barrier
        times.append(time.time() - t0)
    best = min(times)
    fps = NUM_FRAMES / best

    ate = ate_rmse(seq["gt_poses"], list(poses), align=False)

    # Batched multi-bag DP on the same chip (BASELINE config 3): B copies of
    # the sequence advance lock-step in one vmapped scan; aggregate fps =
    # B * frames / time.
    batched_fps = None
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    if batch > 1:
        from kinematic_icp_tpu.offline import (init_batched_state,
                                               make_batched_sequence_runner)
        bargs = tuple(
            jnp.asarray(np.broadcast_to(np.asarray(a)[:, None],
                                        (a.shape[0], batch) + a.shape[1:]))
            for a in (pts, ts, mask, has_ts, rels))
        brunner = make_batched_sequence_runner(cfg)
        bstate = init_batched_state(cfg, batch)
        _, bposes = brunner(bstate, bargs[0], bargs[1], bargs[2], bargs[3],
                            ext, bargs[4])
        np.asarray(bposes)
        btimes = []
        for _ in range(BENCH_RUNS):
            bstate = init_batched_state(cfg, batch)
            jax.tree.map(lambda x: x.block_until_ready(), bstate)
            t0 = time.time()
            _, bposes = brunner(bstate, bargs[0], bargs[1], bargs[2],
                                bargs[3], ext, bargs[4])
            np.asarray(bposes)
            btimes.append(time.time() - t0)
        batched_fps = batch * NUM_FRAMES / min(btimes)

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
            "run_times_sec": [round(t, 4) for t in times],
            "calibration_ms_per_dispatch": round(calib_ms, 2),
            "attempts": _ATTEMPT + 1,
            "ate_vs_gt_m": round(ate, 4),
            "oracle_cpu_fps": round(oracle_fps, 3),
            "oracle_frames_timed": done,
        },
    }
    if batched_fps is not None:
        # Same-chip DP mostly shares one HBM pipe (the per-frame passes are
        # bandwidth-bound), so the aggregate gain over a single sequence is
        # modest; DP scales across chips, not within one (configs 4-5).
        result["details"]["batched_dp"] = {
            "batch": batch,
            "aggregate_frames_per_sec": round(batched_fps, 1),
            "speedup_vs_single_sequence": round(batched_fps / fps, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
