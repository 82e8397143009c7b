"""Map-sharded + sequence-batched odometry step over a device mesh.

The voxel hash map's slots are partitioned over the ``map`` mesh axis
(ownership = top bits of the KISS spatial hash, so slot indexing inside each
shard keeps using the low bits untouched); independent sequences are
partitioned over the ``data`` axis.  Per GN iteration:

  * every shard probes its local table for all query points (misses are
    cheap — non-owned voxels are simply absent),
  * the winning shard per query is ONE (N,) int32 ``pmin`` over packed
    (distance | shard) keys (see ``_combine_local_nn``) and keeps the pair,
  * the 2-DoF normal equations, residual SSE and correspondence counts
    reduce with a single ``psum`` (6 + 2 floats),
  * map insert/evict stay shard-local (ownership-filtered).

Per-iteration collective payload over the map axis is therefore 4 B/query
(the pmin) + 32 B (the psums) — the kinematic 2-DoF formulation shards
unusually well because the normal equations are a fixed 6-float vector
regardless of point count.

All collectives ride the ``map`` axis only; the ``data`` axis never
communicates (sequences are independent), so on a pod slice the map axis
should be laid out on ICI-adjacent devices.

Why the sharded GN uses the XLA ``while_loop`` lowering and not the fused
Pallas kernel (``Config.gn_backend`` is ignored here by design, not
omission): the Pallas kernel fuses the ENTIRE GN iteration loop —
re-selection, reduction, solve, convergence — into one device kernel, but
with a sharded map every iteration needs a cross-shard ``pmin`` to pick
each query's winning shard, and collectives cannot execute inside a
Mosaic kernel.  Splitting the kernel at the collective boundary would
re-introduce exactly the per-iteration launch overhead the kernel exists
to remove.  The sharded formulation instead keeps the per-iteration
payload tiny (4 B/query + 32 B) so the XLA loop is collective-bound, not
launch-bound, on real interconnects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.pipeline import FrameOutputs, OdometryState
from ..ops import hashmap, motion_model, preprocessing, registration, se3, threshold, voxel
from ..ops.points import P3, transform


def _owner_of(bx, by, bz, num_shards: int):
    """Shard owning a voxel: top log2(m) bits of the spatial hash."""
    if num_shards == 1:
        return jnp.zeros(bx.shape, jnp.uint32)
    shift = 32 - (num_shards - 1).bit_length()
    return voxel.spatial_hash_planar(bx, by, bz) >> jnp.uint32(shift)


def _combine_local_nn(tgt, dist, source_mask, tau, axis_name: str):
    """Combine per-shard NN results: each shard keeps its winning pairs.

    Collective payload: ONE (N,) int32 ``pmin`` — the shard index rides
    the 5 low mantissa bits of the bitcast local distance (IEEE
    non-negative floats order as integers; the sign bit is clear even for
    the +inf no-candidate sentinel, so a signed min works).  The previous
    formulation all-gathered the full (m, N) f32 distance plane and
    argmin'd it on every shard — m x the bytes on the wire and an O(m*N)
    reduction per shard, for the same winner.  Cross-shard ties (equal to
    <= 2^-18 relative after masking) break to the lowest shard index; the
    tau gate uses the winner's own full-precision distance, so the
    correspondence set matches the single-device association.  The psum'd
    statistics over winner-only local pairs then equal the single-device
    reduction.
    """
    lo = jnp.uint32(31)
    key = jax.lax.bitcast_convert_type(dist, jnp.uint32) & ~lo
    key = (key | jax.lax.axis_index(axis_name).astype(jnp.uint32)
           ).astype(jnp.int32)
    best = jax.lax.pmin(key, axis_name)                  # (N,) int32
    mine = key == best
    corr_mask = source_mask & (dist < tau) & mine
    return tgt, corr_mask


def _sharded_robot_motion(local_map, source, source_mask, last_pose,
                          relative_odometry, tau, config: Config,
                          axis_name: str):
    """ComputeRobotMotion with map-axis collectives (Registration.cpp:151-190)."""
    guess = se3.compose44(last_pose, relative_odometry)

    if config.exact_gn_reassociation:
        def assoc(pose):
            world = transform(pose, source)
            tgt, dist = hashmap.nearest_neighbor(
                local_map, world, source_mask, config.voxel_size,
                config.max_probes, config.neighbor_candidates)
            return _combine_local_nn(tgt, dist, source_mask, tau, axis_name)
    else:
        # One gather pass per frame against this shard's slots; GN
        # iterations re-select among cached candidates (gather-free) and
        # combine winners across the map axis.
        world_guess = transform(guess, source)
        cand = hashmap.gather_candidates(
            local_map, world_guess, config.voxel_size,
            config.max_probes, config.neighbor_candidates)
        if config.gn_candidates_per_voxel:
            cand = hashmap.reduce_candidates(
                cand, world_guess, config.gn_candidates_per_voxel,
                config.voxel_size)

        def assoc(pose):
            world = transform(pose, source)
            tgt, dist = hashmap.nn_from_candidates(cand, world, source_mask,
                                                   config.voxel_size)
            return _combine_local_nn(tgt, dist, source_mask, tau, axis_name)

    targets, corr_mask = assoc(guess)

    if config.use_adaptive_odometry_regularization:
        sums = jax.lax.psum(
            registration.partial_residual_sse(source, targets, corr_mask, guess),
            axis_name)
        beta = registration.regularization_from_sums(sums)
    else:
        beta = jnp.asarray(config.fixed_regularization, dtype=source.dtype)

    def cond_fn(carry):
        _, _, _, it, converged = carry
        return (it < config.max_num_iterations) & ~converged

    def body_fn(carry):
        pose, targets, corr_mask, it, _ = carry
        sums = jax.lax.psum(
            registration.partial_normal_equations(source, targets, corr_mask, pose),
            axis_name)
        dx = registration.solve_normal_equations(sums, beta)
        pose = se3.compose44(pose, motion_model.motion_model(dx))
        converged = jnp.linalg.norm(dx) < config.convergence_criterion
        targets, corr_mask = jax.lax.cond(
            converged | (it + 1 >= config.max_num_iterations),
            lambda: (targets, corr_mask),
            lambda: assoc(pose))
        return pose, targets, corr_mask, it + 1, converged

    # Initial loop counters derive from `guess` so they inherit its varying
    # mesh axes (shard_map's type system rejects mixing unvarying carry
    # inputs with varying body outputs).
    zero = (guess[0, 0] * 0).astype(jnp.int32)
    it0 = zero
    converged0 = zero > 0
    pose, targets, corr_mask, iters, _ = jax.lax.while_loop(
        cond_fn, body_fn, (guess, targets, corr_mask, it0, converged0))

    num_corr = jax.lax.psum(jnp.sum(corr_mask).astype(jnp.int32), axis_name)
    debug = registration.RegistrationDebug(
        iterations=iters, num_correspondences=num_corr)
    return pose, debug


def sharded_register_frame(state: OdometryState, points, timestamps, mask,
                           has_timestamps, lidar_to_base, relative_odometry,
                           config: Config, num_shards: int,
                           axis_name: str = "map", active=None,
                           rel_twist_in_lidar=None):
    """One odometry step on a map shard (call inside shard_map, per sequence).

    ``state.map`` holds this shard's slots (config.map_capacity // num_shards);
    every other input/output is replicated across the map axis.  Preprocessing
    and downsampling are recomputed identically on each shard (cheap,
    deterministic) — only association/reduction/insert are shard-aware.
    ``active`` (scalar bool, optional) is the stationary gate: when False the
    returned state is byte-identical to the input (write-masked map update,
    no full-table select).
    ``rel_twist_in_lidar``: optional precomputed (6,)
    ``se3_log(ext^-1 @ rel @ ext)`` — pose-independent per frame, so the
    sequence runner hoists the conjugation + matrix log out of the scan
    body exactly like the single-device path (offline._per_frame_constants).
    """
    dtype = state.pose.dtype
    p = P3.from_array(points).astype(dtype)

    if config.deskew:
        if rel_twist_in_lidar is None:
            ext_inv = se3.inverse(lidar_to_base)
            rel_odom_in_lidar = se3.compose44(
                se3.compose44(ext_inv, relative_odometry), lidar_to_base)
            rel_twist_in_lidar = se3.se3_log(rel_odom_in_lidar)
        frame, frame_mask = preprocessing.preprocess(
            p, timestamps, mask, None,
            min_range=config.min_range, max_range=config.max_range,
            deskew_enabled=True, has_timestamps=has_timestamps,
            twist=rel_twist_in_lidar)
    else:
        frame = p
        frame_mask = preprocessing.range_filter_mask(
            p, mask, config.min_range, config.max_range)

    frame_in_base = transform(lidar_to_base, frame)
    source, source_mask, frame_ds, frame_ds_mask, ds_dropped = \
        voxel.double_downsample(
            frame_in_base, frame_mask, config.voxel_size,
            max_downsampled=config.max_downsampled,
            max_source=config.max_source,
            max_extent=2.0 * config.max_range)

    tau = threshold.compute_threshold(
        state.threshold,
        map_discretization_error=config.map_resolution(),
        use_adaptive=config.use_adaptive_threshold,
        fixed_threshold=config.fixed_threshold)

    new_pose, debug = _sharded_robot_motion(
        state.map, source, source_mask, state.pose, relative_odometry, tau,
        config, axis_name)

    prediction = se3.compose44(state.pose, relative_odometry)
    odometry_error = se3.compose44(se3.inverse(prediction), new_pose)
    new_threshold = threshold.update_odometry_error(
        state.threshold, odometry_error,
        max_range=config.max_range, use_adaptive=config.use_adaptive_threshold)

    # Ownership-filtered insert + local evict (VoxelHashMap::Update).
    world_ds = transform(new_pose, frame_ds)
    bx, by, bz = voxel.voxel_coords_planar(world_ds, config.voxel_size)
    owners = _owner_of(bx, by, bz, num_shards)
    my = owners == jax.lax.axis_index(axis_name).astype(jnp.uint32)
    ins_mask = frame_ds_mask & my
    if active is not None:
        ins_mask = ins_mask & active
    new_map, insert_failed = hashmap.insert(
        state.map, world_ds, ins_mask, config.voxel_size, config.max_probes,
        max_extent=2.0 * config.max_range, return_failed=True)
    new_map = hashmap.evict_far(new_map, new_pose[:3, 3], config.max_range,
                                config.voxel_size, enable=active)

    if active is not None:
        new_pose = jnp.where(active, new_pose, state.pose)
        new_threshold = jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new_threshold,
            state.threshold)

    new_state = OdometryState(pose=new_pose, map=new_map,
                              threshold=new_threshold)
    outputs = FrameOutputs(
        frame=frame_in_base, frame_mask=frame_mask,
        source=source, source_mask=source_mask,
        pose=new_pose, debug=debug,
        overflow=jnp.concatenate(
            [ds_dropped,
             jax.lax.psum(insert_failed, axis_name)[None]]
        ).astype(jnp.int32))
    return new_state, outputs


# ----------------------------------------------------------------------
# Batched + sharded step over a (data, map) mesh
# ----------------------------------------------------------------------

def init_sharded_state(config: Config, mesh, batch: int,
                       dtype=jnp.float32) -> OdometryState:
    """Batched odometry state with map buckets sharded over the mesh.

    Array layouts (B = batch of sequences, NB = total bucket count, G =
    slots/bucket, R = K+4):  pose (B, 4, 4) @ P('data'); bucket table
    (B, NB, G*R) @ P('data', 'map'); threshold scalars (B,) @ P('data').
    """
    m = mesh.shape["map"]
    g = config.max_probes
    k = config.max_points_per_voxel
    assert config.map_capacity % (m * g) == 0
    nb = config.map_capacity // g

    def mk(spec, shape, fill, dt):
        sharding = NamedSharding(mesh, spec)
        return jax.jit(
            lambda: jnp.full(shape, fill, dtype=dt),
            out_shardings=sharding)()

    row = jnp.asarray(hashmap._empty_row_np(k, g))
    return OdometryState(
        pose=mk(P("data"), (batch, 4, 4), 0, dtype) + jnp.eye(4, dtype=dtype),
        map=hashmap.MapState(
            table=jax.jit(
                lambda: jnp.broadcast_to(row, (batch, nb, row.shape[0])),
                out_shardings=NamedSharding(mesh, P("data", "map")))(),
            bucket_slots=g,
        ),
        threshold=threshold.ThresholdState(
            odom_sse=mk(P("data"), (batch,), 0, dtype),
            num_samples=mk(P("data"), (batch,), 1e-8, dtype),
        ),
    )


def make_sharded_step(config: Config, mesh, donate: bool = True):
    """Jitted batched step over the (data, map) mesh.

    Inputs: state as from init_sharded_state; points (B, N, 3),
    timestamps (B, N), mask (B, N), has_timestamps (B,),
    lidar_to_base (4, 4) shared, relative_odometry (B, 4, 4),
    active (B,) bool — per-sequence stationary gate (False keeps state).
    """
    m = mesh.shape["map"]
    cfg_local = config.replace(map_capacity=config.map_capacity // m)

    def seq_step(state, pts, ts, mask, has_ts, ext, rel, active):
        # Per-sequence stationary gate (LidarOdometryServer.cpp:202): an
        # inactive sequence keeps its previous state (compute is wasted for
        # it, but the batch stays lock-step with static shapes).  The gate
        # is folded into the step so the map update masks its writes.
        new_state, out = sharded_register_frame(
            state, pts, ts, mask, has_ts, ext, rel,
            config=cfg_local, num_shards=m, active=active)
        out = out._replace(pose=new_state.pose)
        return new_state, out

    def local_batch_step(state, pts, ts, mask, has_ts, ext, rel, active):
        # Inside shard_map: leading dim = local batch slice; map shard local.
        return jax.vmap(
            seq_step, in_axes=(0, 0, 0, 0, 0, None, 0, 0))(
                state, pts, ts, mask, has_ts, ext, rel, active)

    dm = P("data", "map")
    state_specs = OdometryState(
        pose=P("data"),
        map=hashmap.MapState(table=dm, bucket_slots=config.max_probes),
        threshold=threshold.ThresholdState(odom_sse=P("data"),
                                           num_samples=P("data")),
    )
    p3_data = P3(P("data"), P("data"), P("data"))
    out_specs = FrameOutputs(
        frame=p3_data, frame_mask=P("data"), source=p3_data,
        source_mask=P("data"), pose=P("data"),
        debug=registration.RegistrationDebug(
            iterations=P("data"), num_correspondences=P("data")),
        overflow=P("data"))

    # check_vma=False: the varying-manual-axes checker (jax 0.9.0, the
    # pinned environment version) mis-tracks numpy constants captured
    # inside while_loop bodies under vmap-in-shard_map composition;
    # semantics are unaffected (collectives are all explicit here).
    # RE-TEST on any jax upgrade: flip to True and run
    # tests/test_parallel.py — if the checker passes, drop this override.
    fn = jax.shard_map(
        local_batch_step, mesh=mesh,
        in_specs=(state_specs, P("data"), P("data"), P("data"), P("data"),
                  P(), P("data"), P("data")),
        out_specs=(state_specs, out_specs),
        check_vma=False)

    def wrapped(*args):
        with jax.default_matmul_precision("highest"):
            return fn(*args)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())


def make_sharded_sequence_runner(config: Config, mesh, donate: bool = True):
    """Whole-sequence device-side scan over the (data, map) mesh.

    The per-frame ``make_sharded_step`` pays one host dispatch round trip
    per frame — on a tunnel-attached chip that is a ~22 ms protocol floor
    per frame, which caps every config-4/5 measurement at the link rate
    no matter how fast the chips are.  This runner advances ALL frames of
    all sequences in ONE dispatch: the frame loop is a ``lax.scan``
    INSIDE ``shard_map``, so the map-axis collectives (the (N,) int32
    ``pmin`` NN combine + the 32 B of psums per GN iteration) ride inside
    the compiled loop, exactly mirroring the single-device
    ``offline.make_sequence_runner`` (including its hoisted per-frame
    stationary gate + deskew twist).

    Inputs: state from ``init_sharded_state``; pts (F, B, N, 3), ts
    (F, B, N), mask (F, B, N), has_ts (F, B), lidar_to_base (4, 4)
    shared, rels (F, B, 4, 4).  The per-sequence stationary gate is
    computed on device from ``rels`` (identity padding => inactive
    frame), like the single-device runner.

    Returns (final_state, poses (F, B, 4, 4), overflow (B, 3) totals).
    """
    m = mesh.shape["map"]
    cfg_local = config.replace(map_capacity=config.map_capacity // m)

    def local_run(state, pts, ts, mask, has_ts, ext, rels):
        # Per-frame constants hoisted out of the scan, vectorized over
        # (F, local B): stationary gate + conjugated deskew twist
        # (pose-independent; computing them in the body cost ~15 tiny
        # fusions per frame on the single-device path).
        fb = rels.shape[:2]
        flat = rels.reshape((-1, 4, 4))
        logs = jax.vmap(se3.se3_log)(flat)
        active = (jnp.linalg.norm(logs, axis=-1) > 1e-3).reshape(fb)
        if config.deskew:
            ext_inv = se3.inverse(ext)
            conj = jax.vmap(
                lambda r: se3.compose44(se3.compose44(ext_inv, r), ext))(flat)
            twists = jax.vmap(se3.se3_log)(conj).reshape(fb + (6,))
        else:
            twists = jnp.zeros(fb + (0,), dtype=rels.dtype)

        def seq_step(st, p_, t_, mk_, ht_, rel_, act_, tw_):
            st, out = sharded_register_frame(
                st, p_, t_, mk_, ht_, ext, rel_,
                config=cfg_local, num_shards=m, active=act_,
                rel_twist_in_lidar=(tw_ if config.deskew else None))
            return st, (st.pose, out.overflow)

        def body(carry, xs):
            with jax.default_matmul_precision("highest"):
                return jax.vmap(seq_step)(carry, *xs)

        final, (poses, overflow) = jax.lax.scan(
            body, state, (pts, ts, mask, has_ts, rels, active, twists))
        return final, poses, jnp.sum(overflow, axis=0)

    dm = P("data", "map")
    state_specs = OdometryState(
        pose=P("data"),
        map=hashmap.MapState(table=dm, bucket_slots=config.max_probes),
        threshold=threshold.ThresholdState(odom_sse=P("data"),
                                           num_samples=P("data")),
    )
    fdata = P(None, "data")
    # see make_sharded_step for the check_vma=False rationale
    fn = jax.shard_map(
        local_run, mesh=mesh,
        in_specs=(state_specs, fdata, fdata, fdata, fdata, P(), fdata),
        out_specs=(state_specs, fdata, P("data")),
        check_vma=False)

    def wrapped(*args):
        with jax.default_matmul_precision("highest"):
            return fn(*args)

    return jax.jit(wrapped, donate_argnums=(0,) if donate else ())
