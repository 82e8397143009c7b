"""Offline odometry runner: mcap bag(s) -> TUM trajectory.

The reference OfflineNode equivalent
(ros/src/kinematic_icp_ros/nodes/offline_node.cpp): drains one or more bags
through the look-ahead buffered reader, replays /tf into the transform
buffer, converts each scan (3D PointCloud2 or 2D LaserScan), queries the
wheel-odometry delta between scan stamps, runs the kinematic-ICP pipeline,
and writes ``<bag>_kinematic_icp_poses_tum.txt``.

Usage:
  python -m kinematic_icp_tpu.run_odometry BAG [BAG...]
      [--lidar-topic /lidar_points] [--use-2d-lidar]
      [--base-frame base_link] [--wheel-odom-frame odom]
      [--config params.yaml] [--output-dir DIR] [--max-frames N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_arg_parser():
    p = argparse.ArgumentParser(
        description="TPU-native Kinematic-ICP offline odometry")
    p.add_argument("bags", nargs="+", help="mcap bag file(s), chained")
    p.add_argument("--lidar-topic", default="/lidar_points")
    p.add_argument("--use-2d-lidar", action="store_true",
                   help="treat the topic as sensor_msgs/LaserScan")
    p.add_argument("--base-frame", default="base_link")
    p.add_argument("--wheel-odom-frame", default="odom")
    p.add_argument("--config", default=None, help="parameter YAML")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--max-points", type=int, default=65536,
                   help="padded per-scan point capacity")
    p.add_argument("--no-progress", action="store_true")
    p.add_argument("--visualize", action="store_true",
                   help="also write <bag>_kinematic_icp_view.html — a "
                        "standalone interactive 3D view of the trajectory "
                        "and final local map (the RViz-profile equivalent; "
                        "mirrors the reference launch files' visualize arg)")
    return p


def run(args) -> str:
    from . import Config, ServerConfig, load_yaml_config
    from .server import LidarOdometryServer
    from .utils.io.bag import BagMultiplexer, BufferableBag, decode_message
    from .utils.io.laserscan import project_laser
    from .utils.io.messages import LaserScan, PointCloud2
    from .utils.io.tf import TransformBuffer
    from .utils.progress import ProgressBar

    if args.config:
        config, server_cfg = load_yaml_config(args.config)
    else:
        # the reference ships YAML that enables deskew (kinematic_icp_ros.yaml)
        config, server_cfg = Config(deskew=True), ServerConfig()
    config = config.replace(max_points=args.max_points)
    server_cfg_kw = dict(base_frame=args.base_frame,
                         wheel_odom_frame=args.wheel_odom_frame)
    import dataclasses
    server_cfg = dataclasses.replace(server_cfg, **server_cfg_kw)

    tf_buffer = TransformBuffer()
    mux = BagMultiplexer()
    for bag in args.bags:
        mux.add_bag(BufferableBag(bag, tf_buffer, args.lidar_topic))
    total = mux.message_count()
    if args.max_frames:
        total = min(total, args.max_frames)

    server = LidarOdometryServer(config, server_cfg)
    progress = (None if args.no_progress
                else ProgressBar(total, desc="kinematic-icp"))

    processed = 0
    for raw in mux:
        if args.max_frames and processed >= args.max_frames:
            break
        msg = decode_message(raw)
        if args.use_2d_lidar:
            if not isinstance(msg, LaserScan):
                continue
            msg = project_laser(msg)
        if not isinstance(msg, PointCloud2):
            continue
        result = server.register_message(msg, tf_buffer)
        if result is None:
            continue  # awaiting tf initialization
        processed += 1
        if progress:
            progress.update()
    if progress:
        progress.close()

    # Output naming parity: <bag>_kinematic_icp_poses_tum.txt
    # (offline_node.cpp:44-50).
    first_bag = args.bags[0]
    stem = os.path.splitext(os.path.basename(first_bag))[0]
    out_dir = args.output_dir or os.path.dirname(os.path.abspath(first_bag))
    out_path = os.path.join(out_dir, f"{stem}_kinematic_icp_poses_tum.txt")
    if server is None:
        print("no messages processed", file=sys.stderr)
        return out_path
    server.write_tum(out_path)
    print(f"wrote {processed} poses to {out_path}")

    if args.visualize and server.poses_with_stamps:
        from .utils.viewer import write_html_viewer
        poses = np.stack([p for _, p in server.poses_with_stamps])
        html_path = os.path.join(out_dir, f"{stem}_kinematic_icp_view.html")
        write_html_viewer(html_path, title=stem,
                          local_map=server.local_map_pointcloud(),
                          trajectory=poses)
        print(f"wrote viewer to {html_path}")
    return out_path


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    main()
