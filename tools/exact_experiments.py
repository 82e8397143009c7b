"""Round-4 experiments: where does the reference-exact mode's time go?

Exact mode (Config.exact_gn_reassociation: re-gather the full 27-voxel
neighborhood every GN iteration, Registration.cpp:179-187) ran at 883.9 fps
in BENCH_r03 vs a >=1700 fps target.  Levers measured here on the real chip:

  A. table shape: the shared G=5 headline table vs G=4 variants
     (docs/performance.md records the exact path ~1.6x slower at G=5);
  B. GN iteration counts actually executed (is the while_loop's early exit
     worth its ~30-40 us/trip boundary?);
  C. trip-overhead probe: exact mode with max_num_iterations clamped.

Usage:  python tools/exact_experiments.py [frames]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 300


def main():
    import jax
    import jax.numpy as jnp

    from kinematic_icp_tpu import Config
    from kinematic_icp_tpu.models import pipeline
    from kinematic_icp_tpu.offline import make_sequence_runner, pad_sequence
    from kinematic_icp_tpu.utils import synthetic
    from kinematic_icp_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    from kinematic_icp_tpu.utils.evaluation import ate_rmse

    enable_compilation_cache()

    cfg_base = Config(max_points=65536, max_downsampled=8192,
                      max_source=1024, map_capacity=5 << 14, max_probes=5,
                      voxel_size=1.0, max_range=60.0, deskew=True)
    seq = synthetic.make_sequence(
        FRAMES, lidar=synthetic.realistic_lidar(), clear_path_margin=3.0)

    pts, ts, mask, has_ts, rels = pad_sequence(
        seq["frames"], seq["rel_odometry"], cfg_base)
    ext = jnp.asarray(seq["extrinsic"], jnp.float32)
    dev = (jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
           jnp.asarray(has_ts), ext, jnp.asarray(rels))
    jax.tree.map(lambda x: x.block_until_ready(), dev)

    ref_poses = None

    def run(tag, cfg, runs=2, unroll=2):
        nonlocal ref_poses
        runner = make_sequence_runner(cfg, unroll)
        state = pipeline.init_state(cfg)
        t0 = time.time()
        _, poses, overflow, _ = runner(state, *dev)
        poses = np.asarray(poses, np.float64)
        compile_s = time.time() - t0
        times = []
        for _ in range(runs):
            st = pipeline.init_state(cfg)
            jax.tree.map(lambda x: x.block_until_ready(), st)
            t0 = time.time()
            _, p, _, _ = runner(st, *dev)
            np.asarray(p)
            times.append(time.time() - t0)
        fps = FRAMES / min(times)
        out = {"tag": tag, "fps": round(fps, 1),
               "overflow": [int(v) for v in np.asarray(overflow)],
               "compile_s": round(compile_s, 1)}
        if ref_poses is None:
            ref_poses = poses
        else:
            out["ate_vs_first_m"] = round(float(ate_rmse(
                list(ref_poses), list(poses), align=False)), 4)
        print(json.dumps(out), flush=True)
        return fps

    # A. table shapes (exact mode, XLA loop — the pallas-certified variant
    #    is part E); EXP_SHAPES=1 to include the slower shapes
    exact = dict(neighbor_candidates=27, exact_gn_reassociation=True,
                 gn_backend="xla")
    if os.environ.get("EXP_SHAPES"):
        run("exact_G5_16384b (r3 headline shape)",
            dataclasses.replace(cfg_base, **exact))
        run("exact_G4_32768b",
            dataclasses.replace(cfg_base, map_capacity=1 << 17, max_probes=4,
                                **exact))
        run("exact_G8_16384b",
            dataclasses.replace(cfg_base, map_capacity=1 << 17, max_probes=8,
                                **exact))
    run("exact_G4_16384b",
        dataclasses.replace(cfg_base, map_capacity=1 << 16, max_probes=4,
                            **exact))

    # B. iteration statistics (exact mode, G4 shape): scan that keeps debug
    cfg_it = dataclasses.replace(cfg_base, map_capacity=1 << 16,
                                 max_probes=4, **exact)

    from kinematic_icp_tpu.offline import _per_frame_constants

    def iters_run(state, pts, ts, mask, has_ts, extrinsic, rels):
        active, twists = _per_frame_constants(rels, extrinsic, cfg_it)
        if twists is None:
            twists = jnp.zeros((rels.shape[0], 0))

        def body(carry, xs):
            p, t, mk, ht, rel, act, tw = xs
            with jax.default_matmul_precision("highest"):
                st, out = pipeline.register_frame(
                    carry, p, t, mk, ht, extrinsic, rel, cfg_it, active=act,
                    rel_twist_in_lidar=tw)
            return st, (out.debug.iterations, out.debug.num_correspondences)

        return jax.lax.scan(body, state,
                            (pts, ts, mask, has_ts, rels, active, twists))

    f = jax.jit(iters_run, donate_argnums=(0,))
    _, (iters, ncorr) = f(pipeline.init_state(cfg_it), *dev)
    iters = np.asarray(iters)
    ncorr = np.asarray(ncorr)
    print(json.dumps({
        "tag": "iteration_stats_exact_G4",
        "iters_mean": round(float(iters.mean()), 2),
        "iters_p50": int(np.percentile(iters, 50)),
        "iters_p90": int(np.percentile(iters, 90)),
        "iters_max": int(iters.max()),
        "hist": {str(k): int((iters == k).sum())
                 for k in sorted(set(iters.tolist()))},
        "ncorr_mean": int(ncorr.mean()),
    }), flush=True)

    # C. trip-overhead probe: clamp max_num_iterations
    if os.environ.get("EXP_MAXITER"):
        for mni in (2, 4):
            run(f"exact_G4_maxiter{mni}",
                dataclasses.replace(cfg_it, max_num_iterations=mni))

    # E. crossing-certified Pallas exact path (gn_backend=auto -> pallas
    #    on TPU) vs the XLA loop, with fallback rates.
    variants = [("exact_G4_pallas_xcert",
                 dataclasses.replace(cfg_it, gn_backend="auto"))]
    if os.environ.get("EXP_PRUNED"):
        variants += [
            (f"exact_G4_pruned{v}",
             dataclasses.replace(cfg_it, gn_backend="xla",
                                 exact_prune_candidates=v))
            for v in (14, 18, 22)]

    # D. pruned-exact (certificate + fallback) at the G4 shape, and the
    #    scan-unroll probe.  Fallback rate measured with a debug scan.
    for tag, cfg_v in variants:
        run(tag, cfg_v)

        def fb_run(state, pts, ts, mask, has_ts, extrinsic, rels,
                   cfg_v=cfg_v):
            active, twists = _per_frame_constants(rels, extrinsic, cfg_v)
            if twists is None:
                twists = jnp.zeros((rels.shape[0], 0))

            def body(carry, xs):
                p, t, mk, ht, rel, act, tw = xs
                with jax.default_matmul_precision("highest"):
                    st, out = pipeline.register_frame(
                        carry, p, t, mk, ht, extrinsic, rel, cfg_v,
                        active=act, rel_twist_in_lidar=tw)
                return st, out.debug.exact_fallback

            return jax.lax.scan(body, state,
                                (pts, ts, mask, has_ts, rels, active,
                                 twists))

        _, fb = jax.jit(fb_run, donate_argnums=(0,))(
            pipeline.init_state(cfg_v), *dev)
        fb = np.asarray(fb)
        print(json.dumps({"tag": f"fallback_rate_{tag}",
                          "frames_fallback": int(fb.sum()),
                          "frames": int(fb.shape[0]),
                          "first_20": fb[:20].astype(int).tolist()}),
              flush=True)

    if os.environ.get("EXP_UNROLL"):
        run("exact_G4_unroll4", cfg_it, unroll=4)
        run("exact_G4_unroll1", cfg_it, unroll=1)


if __name__ == "__main__":
    main()
