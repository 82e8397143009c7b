"""Online per-message latency of LidarOdometryServer.register_frame.

The reference's primary deployment is per-message streaming
(/root/reference/ros/src/kinematic_icp_ros/nodes/online_node.cpp:40-67):
every PointCloud2 triggers one RegisterFrame on the host thread.  All of
this repo's headline numbers are whole-sequence ``lax.scan`` throughput
(one dispatch, no host round-trips); this tool measures the streaming path
the way the reference is actually used — per-frame wall latency of
``server.register_frame`` including host padding, host->device transfer,
dispatch, and the device->host sync of pose + overflow counters.

Prints one JSON line per regime with p50/p90/p99/mean latency (ms) and the
implied online fps.  Usage: python tools/online_latency.py [measure_frames]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MEASURE = int(sys.argv[1]) if len(sys.argv) > 1 else 200
WARMUP = int(os.environ.get("ONLINE_WARMUP", "30"))


def run_regime(tag, cfg, seq):
    from kinematic_icp_tpu.server import LidarOdometryServer

    server = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
    frames = seq["frames"]
    rels = seq["rel_odometry"]
    lat = []
    for i, (p, t) in enumerate(frames):
        t0 = time.perf_counter()
        server.register_frame(p, t, rels[i], stamp=0.1 * (i + 1))
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat[WARMUP:]) * 1e3

    # Pipelined streaming mode: enqueue-only (blocking=False), one drain()
    # at the end; bitwise-equal trajectory, no per-frame sync.
    server2 = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
    p, t = frames[0]
    server2.register_frame(p, t, rels[0], stamp=0.1)
    t0 = time.perf_counter()
    for i in range(1, len(frames)):
        p, t = frames[i]
        server2.register_frame(p, t, rels[i], stamp=0.1 * (i + 1),
                               blocking=False)
    server2.drain()
    stream_dt = time.perf_counter() - t0

    out = {
        "tag": tag,
        "frames_measured": len(lat_ms),
        "mean_points_per_frame": round(float(np.mean(
            [p.shape[0] for p, _ in frames]))),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "mean_ms": round(float(lat_ms.mean()), 2),
        "online_fps": round(1e3 / float(lat_ms.mean()), 1),
        "streaming_fps": round((len(frames) - 1) / stream_dt, 1),
        "overflow_stats": server.overflow_stats,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from kinematic_icp_tpu import Config
    from kinematic_icp_tpu.utils import synthetic
    from kinematic_icp_tpu.utils.compilation_cache import (
        enable_compilation_cache)

    enable_compilation_cache()

    n = WARMUP + MEASURE
    cfg_large = Config(max_points=65536, max_downsampled=8192,
                       max_source=1024, map_capacity=5 << 14, max_probes=5,
                       voxel_size=1.0, max_range=60.0, deskew=True)
    seq_large = synthetic.make_sequence(
        n, lidar=synthetic.realistic_lidar(), clear_path_margin=3.0)
    run_regime("online_64k", cfg_large, seq_large)

    cfg_small = Config(max_points=4096, max_downsampled=4096,
                       max_source=1024, map_capacity=1 << 14, max_probes=8,
                       voxel_size=1.0, max_range=60.0, deskew=True)
    seq_small = synthetic.make_sequence(n)
    run_regime("online_small", cfg_small, seq_small)


if __name__ == "__main__":
    main()
