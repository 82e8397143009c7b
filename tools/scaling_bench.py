"""Scaling-efficiency harness: frames/s vs device count (BASELINE config 5).

Runs the SAME workload over growing device counts and reports aggregate
frames/s and scaling efficiency vs single-device.  Two modes:

  * ``dp``  — batched multi-sequence data parallelism: B = seqs_per_device
    x d independent sequences advance in ONE jitted scan, with every
    batch-axis array sharded over a ('data',) mesh (GSPMD partitions the
    whole program; no collectives needed — the upper bound of scaling).
  * ``map`` — one batch of sequences with the voxel hash table sharded over
    a ('map',) mesh (psum'd normal equations + the (N,) pmin NN combine;
    the communication-bound mode, parallel/sharded.py).

Usable today in three settings, unchanged:
  * virtual CPU mesh (trend only):
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/scaling_bench.py
  * one real chip (baseline point): python tools/scaling_bench.py
  * a real pod slice: python tools/scaling_bench.py [--distributed]
    (jax.distributed auto-detects; every host runs the same command).

Prints one JSON line per (mode, device count) plus a final summary line
with the efficiency curve.  The reference has no distributed runtime
(SURVEY.md section 5.8) — the comparable quantity is its single-process
frames/s, reported by bench.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--seqs-per-device", type=int, default=2)
    ap.add_argument("--modes", default="dp,map")
    ap.add_argument("--large", action="store_true",
                    help="realistic 64K-point frames instead of the small "
                         "regime")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--max-devices", type=int, default=0,
                    help="cap the sweep (0 = all available)")
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed (multi-host pod slice)")
    ap.add_argument("--map-runner", choices=("scan", "step"), default="scan",
                    help="map mode: whole-sequence device-side scan "
                         "(default) or the legacy per-frame host loop")
    return ap.parse_args()


def device_counts(n):
    d, out = 1, []
    while d <= n:
        out.append(d)
        d *= 2
    if out[-1] != n:
        out.append(n)
    return out


def main():
    args = parse_args()
    if args.distributed:
        from kinematic_icp_tpu.parallel.mesh import initialize_distributed
        initialize_distributed()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from kinematic_icp_tpu import Config
    from kinematic_icp_tpu.offline import (init_batched_state,
                                           make_batched_sequence_runner,
                                           pad_sequence)
    from kinematic_icp_tpu.parallel.mesh import make_mesh
    from kinematic_icp_tpu.parallel.sharded import (
        init_sharded_state, make_sharded_sequence_runner, make_sharded_step)
    from kinematic_icp_tpu.utils import synthetic
    from kinematic_icp_tpu.utils.compilation_cache import (
        enable_compilation_cache)
    from kinematic_icp_tpu.oracle.reference import se3_log

    enable_compilation_cache()
    ndev = len(jax.devices())
    if args.max_devices:
        ndev = min(ndev, args.max_devices)
    counts = device_counts(ndev)
    print(f"# devices available: {ndev} ({jax.devices()[0].platform}); "
          f"sweeping {counts}", file=sys.stderr)

    if args.large:
        cfg = Config(max_points=65536, max_downsampled=8192, max_source=1024,
                     map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                     deskew=True)
        seq = synthetic.make_sequence(
            args.frames, lidar=synthetic.realistic_lidar(),
            clear_path_margin=3.0)
    else:
        cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                     map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                     deskew=True)
        seq = synthetic.make_sequence(args.frames)

    pts, ts, mask, has_ts, rels = pad_sequence(
        seq["frames"], seq["rel_odometry"], cfg)
    F = args.frames
    results = {}

    def bcast(a, b):
        """(F, ...) -> (F, B, ...) replicated along a new batch axis."""
        a = np.asarray(a)
        return np.broadcast_to(a[:, None], (a.shape[0], b) + a.shape[1:])

    if "dp" in args.modes.split(","):
        curve = []
        for d in counts:
            b = args.seqs_per_device * d
            mesh = make_mesh(data=d, map=1, devices=jax.devices()[:d])
            shard = NamedSharding(mesh, P(None, "data"))
            dev = tuple(jax.device_put(jnp.asarray(bcast(a, b)), shard)
                        for a in (pts, ts, mask, has_ts, rels))
            runner = make_batched_sequence_runner(cfg)
            state_shard = P("data")

            def mk_state():
                st = init_batched_state(cfg, b)
                return jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, state_shard)), st)

            ext = jnp.eye(4)
            st = mk_state()
            _, poses, _, _ = runner(st, dev[0], dev[1], dev[2], dev[3], ext, dev[4])
            np.asarray(poses)
            times = []
            for _ in range(args.runs):
                st = mk_state()
                jax.tree.map(lambda x: x.block_until_ready(), st)
                t0 = time.time()
                _, poses, _, _ = runner(st, dev[0], dev[1], dev[2], dev[3], ext,
                                  dev[4])
                np.asarray(poses)
                times.append(time.time() - t0)
            fps = b * F / min(times)
            curve.append((d, fps))
            print(json.dumps({"mode": "dp", "devices": d, "batch": b,
                              "aggregate_fps": round(fps, 1)}))
        base = curve[0][1]
        results["dp"] = {
            "devices": [c[0] for c in curve],
            "aggregate_fps": [round(c[1], 1) for c in curve],
            "efficiency": [round(c[1] / (c[0] * base), 3) for c in curve],
        }

    if "map" in args.modes.split(","):
        # Whole-sequence device-side scan (make_sharded_sequence_runner):
        # ONE dispatch for all F frames, so the curve measures the map-axis
        # collectives, not the host dispatch floor the old per-frame-step
        # harness inherited (VERDICT r4 Missing #3).  --map-runner step
        # keeps the legacy per-frame path for comparison.
        active = np.asarray([np.linalg.norm(se3_log(r)) > 1e-3
                             for r in seq["rel_odometry"]])
        per_frame = args.map_runner == "step"
        curve = []
        for d in counts:
            if cfg.map_capacity % (d * cfg.max_probes):
                continue
            mesh = make_mesh(data=1, map=d, devices=jax.devices()[:d])
            ext = jnp.eye(4)
            if per_frame:
                step = make_sharded_step(cfg, mesh, donate=False)

                def run_once():
                    st = init_sharded_state(cfg, mesh, 1)
                    jax.tree.map(lambda x: x.block_until_ready(), st)
                    t0 = time.time()
                    for i in range(F):
                        st, out = step(
                            st, jnp.asarray(pts[i][None]),
                            jnp.asarray(ts[i][None]),
                            jnp.asarray(mask[i][None]),
                            jnp.asarray(has_ts[i][None]), ext,
                            jnp.asarray(rels[i][None]),
                            jnp.asarray(active[i][None]))
                    jax.tree.map(lambda x: x.block_until_ready(), st)
                    return time.time() - t0
            else:
                runner = make_sharded_sequence_runner(cfg, mesh,
                                                      donate=False)
                dev = tuple(jnp.asarray(a[:, None]) for a in
                            (pts, ts, mask, has_ts, rels))

                def run_once():
                    st = init_sharded_state(cfg, mesh, 1)
                    jax.tree.map(lambda x: x.block_until_ready(), st)
                    t0 = time.time()
                    _, poses, _ = runner(st, dev[0], dev[1], dev[2],
                                         dev[3], ext, dev[4])
                    np.asarray(poses)
                    return time.time() - t0

            run_once()  # compile
            times = [run_once() for _ in range(max(1, args.runs - 1))]
            fps = F / min(times)
            curve.append((d, fps))
            print(json.dumps({"mode": "map", "devices": d,
                              "runner": args.map_runner,
                              "fps": round(fps, 1)}))
        base = curve[0][1]
        results["map"] = {
            "runner": args.map_runner,
            "devices": [c[0] for c in curve],
            "fps": [round(c[1], 1) for c in curve],
            # map sharding splits ONE sequence's work: ideal is flat fps
            # with d-fold capacity, so efficiency is fps retention.
            "fps_retention_vs_1dev": [round(c[1] / base, 3) for c in curve],
        }

    print(json.dumps({"metric": "scaling", "platform":
                      jax.devices()[0].platform, "num_devices": ndev,
                      "frames": F, "results": results}))


if __name__ == "__main__":
    main()
