"""Online serving example: per-message vs pipelined streaming registration.

The reference's primary deployment is one synchronous ``RegisterFrame`` per
incoming scan on the host thread
(/root/reference/ros/src/kinematic_icp_ros/nodes/online_node.cpp:40-67).
This example drives the same shape through ``LidarOdometryServer`` twice:

  * blocking mode — one packed upload + one 76-byte readback per frame
    (lowest latency per pose; what a live robot would run),
  * streaming mode — ``register_frame(blocking=False)`` stages
    ``stream_chunk`` frames per host->device transfer and dispatches
    asynchronously; ``drain()`` settles all poses in one fetch
    (highest throughput; what a replay/ingest service would run).

Trajectories are bitwise identical between the two modes by construction
(the same compiled step executable consumes the same packed bytes).  The
optional ``upload="u16"`` codec halves the wire bytes at ~1 mm input
quantization (ATE-gated in bench.py).

Run:  JAX_PLATFORMS=cpu python examples/streaming_server.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.server import LidarOdometryServer
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.evaluation import ate_rmse

FRAMES = 30


def drive(server, seq, blocking):
    t0 = time.perf_counter()
    for i, (pts, ts) in enumerate(seq["frames"]):
        server.register_frame(pts, ts, seq["rel_odometry"][i],
                              stamp=0.1 * (i + 1), blocking=blocking)
    server.drain()
    return time.perf_counter() - t0


def main():
    cfg = Config(max_points=4096, max_downsampled=4096, max_source=1024,
                 map_capacity=1 << 13, voxel_size=1.0, max_range=60.0,
                 deskew=True)
    seq = synthetic.make_sequence(FRAMES)

    blocking = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"])
    dt_b = drive(blocking, seq, blocking=True)

    streaming = LidarOdometryServer(cfg, extrinsic=seq["extrinsic"],
                                    stream_chunk=8)
    dt_s = drive(streaming, seq, blocking=False)

    pb = np.asarray([p for _, p in blocking.poses_with_stamps])
    ps = np.asarray([p for _, p in streaming.poses_with_stamps])
    assert np.array_equal(pb, ps), "streaming must be bitwise-equal"

    ate = ate_rmse(seq["gt_poses"], list(pb), align=False)
    print(f"frames={FRAMES}  blocking {FRAMES / dt_b:.1f} fps  "
          f"streaming {FRAMES / dt_s:.1f} fps (chunked transfers, "
          f"incl. compile on first run)")
    print(f"trajectories bitwise-equal; ATE vs ground truth {ate:.3f} m")
    print(f"overflow stats: {blocking.overflow_stats}")
    print("OK")


if __name__ == "__main__":
    main()
