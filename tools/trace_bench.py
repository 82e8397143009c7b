"""Capture a profiler trace of the offline sequence runner and summarize
per-op device time from the trace (prints top HLO ops by total duration)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.offline import make_sequence_runner, pad_sequence
from kinematic_icp_tpu.utils import synthetic

TRACE_DIR = "/tmp/kicp_trace"

def main():
    # TRACE_LARGE=1 traces the realistic 64K-point regime instead of the
    # default 8K bench config; TRACE_EXACT=1 traces the reference-exact
    # reassociation mode at its own best table shape (G=4 x 16384 buckets);
    # TRACE_BATCH=N traces the batched-DP runner (bench small regime) at
    # batch N — used to localize the batch-16 regression (VERDICT r4 #2).
    batch = int(os.environ.get("TRACE_BATCH", "0"))
    if batch:
        cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                     map_capacity=1 << 14, max_probes=8, voxel_size=1.0,
                     max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(50)
    elif os.environ.get("TRACE_EXACT"):
        cfg = Config(max_points=65536, max_downsampled=8192,
                     max_source=1024, map_capacity=1 << 16, max_probes=4,
                     voxel_size=1.0, max_range=60.0, deskew=True,
                     neighbor_candidates=27, exact_gn_reassociation=True)
        seq = synthetic.make_sequence(50, lidar=synthetic.realistic_lidar(),
                                      clear_path_margin=3.0)
    elif os.environ.get("TRACE_LARGE"):
        cfg = Config(max_points=65536, max_downsampled=8192,
                     max_source=1024, map_capacity=5 << 14, max_probes=5, voxel_size=1.0,
                     max_range=60.0, deskew=True)
        seq = synthetic.make_sequence(50, lidar=synthetic.realistic_lidar(),
                                      clear_path_margin=3.0)
    else:
        cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                     map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                     deskew=True)
        seq = synthetic.make_sequence(50)
    pts, ts, mask, has_ts, rels = pad_sequence(seq["frames"], seq["rel_odometry"], cfg)
    ext = jnp.eye(4)
    if batch:
        from kinematic_icp_tpu.offline import (init_batched_state,
                                               make_batched_sequence_runner)
        runner = make_batched_sequence_runner(cfg)
        dev = tuple(
            jnp.asarray(np.broadcast_to(
                np.asarray(a)[:, None],
                (a.shape[0], batch) + a.shape[1:]))
            for a in (pts, ts, mask, has_ts, rels))
        dev = dev[:4] + (ext,) + dev[4:]
        mk_state = lambda: init_batched_state(cfg, batch)  # noqa: E731
    else:
        runner = make_sequence_runner(cfg)
        dev = (jnp.asarray(pts), jnp.asarray(ts), jnp.asarray(mask),
               jnp.asarray(has_ts), ext, jnp.asarray(rels))
        mk_state = lambda: pipeline.init_state(cfg)  # noqa: E731
    state = mk_state()
    t0 = time.time()
    _, poses, _, _ = runner(state, *dev)
    np.asarray(poses)
    print(f"compile+first: {time.time()-t0:.1f} s")

    state = mk_state()
    jax.tree.map(lambda x: x.block_until_ready(), state)
    t0 = time.time()
    _, poses, _, _ = runner(state, *dev)
    np.asarray(poses)
    wall = time.time() - t0
    n_work = 50 * max(batch, 1)
    print(f"untraced run: {wall:.3f} s = {n_work / wall:.1f} frames/s aggregate")

    state = mk_state()
    jax.tree.map(lambda x: x.block_until_ready(), state)
    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        _, poses, _, _ = runner(state, *dev)
        np.asarray(poses)

    # Parse the trace: sum durations by event name on device tracks.
    files = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert files, "no trace written"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Find device PIDs (process names containing TPU / device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    total_us = sum(tot.values())
    print(f"device pids: {sorted(dev_pids)} names={[pid_names[p] for p in dev_pids]}")
    print(f"total device-op time: {total_us/1e3:.2f} ms over 50 frames "
          f"=> {total_us/50:.0f} us/frame")
    print(f"{'op':60s} {'total_ms':>9s} {'count':>7s} {'us/frame':>9s}")
    for name, us in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{name[:60]:60s} {us/1e3:9.2f} {cnt[name]:7d} {us/50:9.1f}")

if __name__ == "__main__":
    main()
