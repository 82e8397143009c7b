"""Per-stage device timing for the odometry step (run on the real chip).

Usage: python tools/profile_stages.py
Prints median ms per stage at bench.py's shapes.
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
from kinematic_icp_tpu.ops import hashmap, preprocessing, registration, se3, threshold, voxel
from kinematic_icp_tpu.ops.points import P3, transform
from kinematic_icp_tpu.utils import synthetic


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    cfg = Config(max_points=8192, max_downsampled=8192, max_source=4096,
                 map_capacity=1 << 16, voxel_size=1.0, max_range=60.0,
                 deskew=True)
    seq = synthetic.make_sequence(30)
    pts, ts, mask, has_ts, rels = pad_sequence(seq["frames"], seq["rel_odometry"], cfg)

    # Build a representative mid-sequence state by running the real step.
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

    with jax.default_matmul_precision("highest"):
        pre = jax.jit(lambda p, t, m, r: preprocessing.preprocess(
            p, t, m, r, min_range=cfg.min_range, max_range=cfg.max_range,
            deskew_enabled=True, has_timestamps=True))
        frame, fmask = pre(p, tsk, mk, rel)

        dd = jax.jit(lambda f, m: voxel.double_downsample(
            f, m, cfg.voxel_size, max_downsampled=cfg.max_downsampled,
            max_source=cfg.max_source))
        source, smask, fds, fdsmask = dd(frame, fmask)

        gather = jax.jit(lambda mp, q: hashmap.gather_candidates(
            mp, q, cfg.voxel_size, cfg.max_probes, cfg.neighbor_candidates))
        world = transform(state.pose, source)
        cand = gather(state.map, world)

        def gn(mp, src, sm, pose, rel):
            return registration.compute_robot_motion(
                mp, src, sm, pose, rel, 0.5,
                voxel_size=cfg.voxel_size, max_probes=cfg.max_probes,
                max_num_iterations=cfg.max_num_iterations,
                convergence_criterion=cfg.convergence_criterion,
                use_adaptive_odometry_regularization=True,
                fixed_regularization=0.0,
                num_candidate_voxels=cfg.neighbor_candidates)
        gnj = jax.jit(gn)

        ins = jax.jit(lambda mp, f, m: hashmap.insert(
            mp, f, m, cfg.voxel_size, cfg.max_probes))
        ev = jax.jit(lambda mp: hashmap.evict_far(
            mp, state.pose[:3, 3], cfg.max_range, cfg.voxel_size))

        full = jax.jit(lambda st, pp, tt, mm: pipeline.register_frame(
            st, pp, tt, mm, jnp.bool_(True), ext, rel, cfg))

        print(f"preprocess        {timeit(pre, p, tsk, mk, rel):8.3f} ms")
        print(f"double_downsample {timeit(dd, frame, fmask):8.3f} ms")
        print(f"gather_candidates {timeit(gather, state.map, world):8.3f} ms")
        print(f"gn_full           {timeit(gnj, state.map, source, smask, state.pose, rel):8.3f} ms")
        print(f"insert            {timeit(ins, state.map, fds, fdsmask):8.3f} ms")
        print(f"evict_far         {timeit(ev, state.map):8.3f} ms")
        print(f"full_step         {timeit(full, state, jnp.asarray(pts[k]), tsk, mk):8.3f} ms")


if __name__ == "__main__":
    main()
