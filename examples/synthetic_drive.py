"""Canonical end-to-end drive: synthetic world -> odometry -> ATE report.

Usage:  JAX_PLATFORMS=cpu python examples/synthetic_drive.py [num_frames]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.server import LidarOdometryServer
from kinematic_icp_tpu.utils import synthetic
from kinematic_icp_tpu.utils.evaluation import ate_rmse, rpe


def main(num_frames=40):
    cfg = Config(max_points=16384, max_downsampled=8192, max_source=4096,
                 map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                 deskew=True)
    seq = synthetic.make_sequence(num_frames)
    server = LidarOdometryServer(cfg)

    t0 = time.time()
    dead_pose = np.eye(4)
    dead_poses = []
    for k in range(num_frames):
        pts, ts = seq["frames"][k]
        rel = seq["rel_odometry"][k]
        server.register_frame(pts, ts, rel, stamp=0.1 * k)
        dead_pose = dead_pose @ rel
        dead_poses.append(dead_pose.copy())
        if k == 0:
            t_compile = time.time() - t0
            t0 = time.time()
    elapsed = time.time() - t0

    est = [p for _, p in server.poses_with_stamps]
    gt = seq["gt_poses"]
    ate = ate_rmse(gt, est, align=False)
    ate_dead = ate_rmse(gt, dead_poses, align=False)
    rpe_t, rpe_r = rpe(gt, est)
    fps = (num_frames - 1) / elapsed
    print(f"frames={num_frames} compile={t_compile:.1f}s "
          f"rate={fps:.2f} fps")
    print(f"ATE  icp={ate:.4f} m   dead-reckoning={ate_dead:.4f} m")
    print(f"RPE  trans={rpe_t:.4f} m  rot={np.degrees(rpe_r):.3f} deg")
    assert ate < 0.5 * ate_dead or ate < 0.05, (
        f"odometry ({ate:.3f}) should beat dead reckoning ({ate_dead:.3f})")
    print("OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
