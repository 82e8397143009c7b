"""Pure device-time per stage: iterate each stage inside one jitted scan.

Each stage is wrapped in lax.scan over REPS iterations with a data dependency
through the carry, so the measured wall time is REPS * device_time + one
dispatch. Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from kinematic_icp_tpu import Config
from kinematic_icp_tpu.models import pipeline
from kinematic_icp_tpu.offline import pad_sequence
from kinematic_icp_tpu.ops import hashmap, preprocessing, registration, voxel
from kinematic_icp_tpu.ops.points import P3, transform
from kinematic_icp_tpu.utils import synthetic

REPS = 50


def device_ms(make_body, init_carry, reps=REPS):
    """Time lax.scan(body, carry, length=reps) in one dispatch."""
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_body(c), None
        out, _ = jax.lax.scan(body, carry, None, length=reps)
        return out
    with jax.default_matmul_precision("highest"):
        out = run(init_carry)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        out = run(init_carry)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        dt = time.perf_counter() - t0
    return dt / reps * 1000


def main():
    large = "--large" in sys.argv
    if large:
        cfg = Config(max_points=65536, max_downsampled=8192, max_source=1024,
                     map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                     deskew=True)
        seq = synthetic.make_sequence(30, lidar=synthetic.realistic_lidar(),
                                      clear_path_margin=3.0)
    else:
        cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                     map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                     deskew=True)
        seq = synthetic.make_sequence(30)
    pts, ts, mask, has_ts, rels = pad_sequence(seq["frames"], seq["rel_odometry"], cfg)

    step = pipeline.make_step(cfg, donate=False)
    state = pipeline.init_state(cfg)
    ext = jnp.eye(4)
    for k in range(20):
        state, _ = step(state, jnp.asarray(pts[k]), jnp.asarray(ts[k]),
                        jnp.asarray(mask[k]), jnp.asarray(has_ts[k]), ext,
                        jnp.asarray(rels[k]))
    jax.tree.map(lambda x: x.block_until_ready(), state)

    k = 21
    p = P3.from_array(jnp.asarray(pts[k]))
    tsk = jnp.asarray(ts[k])
    mk = jnp.asarray(mask[k])
    rel = jnp.asarray(rels[k])

    frame, fmask = preprocessing.preprocess(
        p, tsk, mk, rel, min_range=cfg.min_range, max_range=cfg.max_range,
        deskew_enabled=True, has_timestamps=jnp.bool_(True))
    source, smask, fds, fdsmask, _ = voxel.double_downsample(
        frame, fmask, cfg.voxel_size, max_downsampled=cfg.max_downsampled,
        max_source=cfg.max_source)
    world = transform(state.pose, source)

    # Each carry feeds the next iteration to prevent loop-invariant hoisting.
    t = device_ms(
        lambda c: preprocessing.preprocess(
            P3(c.x + 1e-9, c.y, c.z), tsk, mk, rel,
            min_range=cfg.min_range, max_range=cfg.max_range,
            deskew_enabled=True, has_timestamps=jnp.bool_(True))[0],
        p)
    print(f"preprocess        {t:8.3f} ms")

    def dds_body(c):
        out = voxel.double_downsample(
            P3(c.x + 1e-9, c.y, c.z), fmask, cfg.voxel_size,
            max_downsampled=cfg.max_downsampled, max_source=cfg.max_source)
        return P3(c.x + out[2].x[0] * 1e-12, c.y, c.z)
    t = device_ms(dds_body, frame)
    print(f"double_downsample {t:8.3f} ms")

    def gc_body(c):
        cand = hashmap.gather_candidates(
            state.map, P3(c.x + 1e-9, c.y, c.z), cfg.voxel_size,
            cfg.max_probes, cfg.neighbor_candidates)
        return P3(c.x + cand.words[0, 0, 0].astype(jnp.float32) * 1e-12,
                  c.y, c.z)
    print(f"gather_candidates {device_ms(gc_body, world):8.3f} ms")

    def gn_body(c):
        pose = c
        newpose, _ = registration.compute_robot_motion(
            state.map, source, smask, pose, rel, 0.5,
            voxel_size=cfg.voxel_size, max_probes=cfg.max_probes,
            max_num_iterations=cfg.max_num_iterations,
            convergence_criterion=cfg.convergence_criterion,
            use_adaptive_odometry_regularization=True,
            fixed_regularization=0.0,
            num_candidate_voxels=cfg.neighbor_candidates)
        return newpose
    print(f"gn_full           {device_ms(gn_body, state.pose):8.3f} ms")

    t = device_ms(lambda c: hashmap.insert(c, fds, fdsmask, cfg.voxel_size,
                                           cfg.max_probes), state.map)
    print(f"insert            {t:8.3f} ms")

    t = device_ms(lambda c: hashmap.evict_far(c, state.pose[:3, 3],
                                              cfg.max_range, cfg.voxel_size),
                  state.map)
    print(f"evict_far         {t:8.3f} ms")

    def full_body(c):
        st = c
        st2, _ = pipeline.register_frame(st, jnp.asarray(pts[k]), tsk, mk,
                                         jnp.bool_(True), ext, rel, cfg)
        return st2
    print(f"full_step         {device_ms(full_body, state):8.3f} ms")


if __name__ == "__main__":
    main()
