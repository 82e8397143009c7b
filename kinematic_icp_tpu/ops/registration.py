"""Kinematically-constrained ICP (2-DoF Gauss-Newton on the unicycle model).

TPU-native reimplementation of ``kinematic_icp::KinematicRegistration``
(/root/reference/cpp/kinematic_icp/registration/Registration.cpp):

  * initial guess = ``last_pose * relative_wheel_odometry``       (cpp:156)
  * data association: NN lookup in the voxel map, keep dist < tau (cpp:62-81)
  * adaptive Tikhonov regularizer beta = 1/mean residual^2 from the initial
    guess (cpp:48-60)
  * per iteration: 2x2 normal equations ``JTJ/N + diag(beta, 0)``, solve,
    compose through the unicycle motion model, re-associate, break when
    ``|dx| < convergence_criterion``                               (cpp:179-187)
  * Jacobian columns ``R e_x`` and ``R (-s_y, s_x, 0)``            (cpp:89-91)

The TBB parallel_for/parallel_reduce over points become one fused masked
planar reduction; the GN loop is a ``lax.while_loop`` with static shapes.
With no correspondences (e.g. empty map) the perturbation is forced to zero,
so the loop exits immediately and the initial guess is returned — matching
the reference's early return for an empty map (cpp:157).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import hashmap, motion_model, se3
from .points import P3, transform

#: reference uses DBL_MIN; a float32-safe tiny value serves the same purpose
_EPSILON = 1e-30


class RegistrationDebug(NamedTuple):
    iterations: jnp.ndarray           # int32 — GN iterations executed
    num_correspondences: jnp.ndarray  # int32 — at the last association
    #: scalar f32 — the adaptive threshold's "odometry error in point
    #: space" |t_err| + 2 R sin(theta_err/2) (CorrespondenceThreshold
    #: .cpp:7-12), computed INSIDE the fused Pallas kernel (the guess and
    #: final pose are already in registers there); None on the XLA paths,
    #: where the pipeline computes it from the returned pose instead.
    odometry_error_pt: jnp.ndarray | None = None
    #: scalar bool — pruned-exact mode's certificate was violated this
    #: frame and the full-27 fallback loop recomputed the solve; None
    #: unless exact_prune_candidates is active.
    exact_fallback: jnp.ndarray | None = None


#: calibrated Mosaic stack model for the fused GN kernel: ~9 (rows, N)
#: f32/u32 planes total (4 input planes + d2/key/select temporaries) —
#: the compiler reported 19.14 MB for rows=540, N=1024 (8.7 planes).
_PALLAS_GN_PLANES = 9
#: scoped-VMEM ceiling we are willing to request (v5e validated at 24 MB
#: for the exact-mode shape; physical VMEM is far larger — the 16 MB
#: default is a compiler soft limit that pallas_gn raises per-kernel)
_PALLAS_GN_VMEM_CAP = 28 * 2**20


def pallas_gn_vmem_bytes(candidate_rows: int, num_queries: int) -> int:
    """Estimated scoped-VMEM need of the fused GN kernel (see model above)."""
    return _PALLAS_GN_PLANES * candidate_rows * num_queries * 4


def pallas_gn_fits(candidate_rows: int, num_queries: int) -> bool:
    """Static check: does the fused GN kernel's VMEM footprint fit?

    The kernel (ops/pallas_gn.py) keeps 4 (rows, N) f32/u32 planes
    resident plus ~5 planes of Mosaic stack temporaries (d2 / packed key /
    selection masks); gn_solve raises the compiler's scoped-VMEM limit to
    the estimate (capped at 28 MB — validated on v5e, whose 16 MB default
    is a soft limit).  E.g. rows=200, N=1024 (the 64K realistic regime)
    needs ~7.4 MB; rows=540 (exact mode, full 27-voxel cache), N=1024
    needs ~19.9 MB and fits under the raised limit; N=4096 shapes must
    take the XLA while_loop path.
    """
    return pallas_gn_vmem_bytes(candidate_rows, num_queries) \
        <= _PALLAS_GN_VMEM_CAP


def data_association(m: hashmap.MapState, source: P3, source_mask, pose,
                     max_correspondence_distance, voxel_size: float,
                     max_probes: int, num_candidate_voxels: int = 27):
    """Associate local-frame source points to map points (Registration.cpp:62-81).

    Returns (targets P3, corr_mask (N,)): the stored pairing is
    (local source point, world target point), exactly like the reference.
    """
    world = transform(pose, source)
    targets, dist = hashmap.nearest_neighbor(
        m, world, source_mask, voxel_size, max_probes, num_candidate_voxels)
    corr_mask = source_mask & (dist < max_correspondence_distance)
    return targets, corr_mask


def associate_from_candidates(cand, source: P3, source_mask, pose,
                              max_correspondence_distance, voxel_size: float):
    """Re-associate against a cached CandidateSet (elementwise only).

    The candidate neighborhoods were gathered at the initial-guess pose;
    GN iterations move the pose by millimetres, so refreshing only the
    *selection* (not the gather) preserves accuracy while making each GN
    iteration gather-free.  Set Config.exact_gn_reassociation for the
    reference's re-gather-every-iteration behavior.
    """
    world = transform(pose, source)
    targets, dist = hashmap.nn_from_candidates(cand, world, source_mask,
                                               voxel_size)
    corr_mask = source_mask & (dist < max_correspondence_distance)
    return targets, corr_mask


def _residual(source: P3, targets: P3, pose):
    world = transform(pose, source)
    return P3(world.x - targets.x, world.y - targets.y, world.z - targets.z)


def partial_residual_sse(source: P3, targets: P3, corr_mask, pose):
    """(sse, n) partial sums of squared residuals — psum-reducible (2,)."""
    r = _residual(source, targets, pose)
    sq = r.x * r.x + r.y * r.y + r.z * r.z
    n = jnp.sum(corr_mask).astype(source.x.dtype)
    sse = jnp.sum(jnp.where(corr_mask, sq, 0.0))
    return jnp.stack([sse, n])


def regularization_from_sums(sums):
    """beta = 1 / (sse/n + eps); 0 with no correspondences."""
    sse, n = sums[0], sums[1]
    mean = sse / jnp.maximum(n, 1.0)
    beta = 1.0 / (mean + _EPSILON)
    return jnp.where(n > 0, beta, 0.0)


def compute_odometry_regularization(source: P3, targets: P3, corr_mask, pose):
    """beta = 1 / (mean ||T s - t||^2 + eps)  (Registration.cpp:48-60)."""
    return regularization_from_sums(
        partial_residual_sse(source, targets, corr_mask, pose))


def partial_normal_equations(source: P3, targets: P3, corr_mask, pose):
    """Masked partial sums of the 2x2 normal equations over local pairs.

    residual_i = T s_i - t_i
    J_i = [R e_x | R (-s_y, s_x, 0)]            (3x2)

    Returns a (6,) vector (a00, a01, a11, b0, b1, n) — linear in the
    correspondences, so cross-device reduction is a plain ``psum``.
    """
    R = pose[:3, :3]
    r = _residual(source, targets, pose)

    # j0 = R e_x (constant); j1_i = R (-s_y, s_x, 0) per point.
    j0x, j0y, j0z = R[0, 0], R[1, 0], R[2, 0]
    j1x = -source.y * R[0, 0] + source.x * R[0, 1]
    j1y = -source.y * R[1, 0] + source.x * R[1, 1]
    j1z = -source.y * R[2, 0] + source.x * R[2, 1]

    w = corr_mask.astype(source.x.dtype)
    j1_dot_j0 = j1x * j0x + j1y * j0y + j1z * j0z
    j1_dot_j1 = j1x * j1x + j1y * j1y + j1z * j1z
    r_dot_j0 = r.x * j0x + r.y * j0y + r.z * j0z
    r_dot_j1 = r.x * j1x + r.y * j1y + r.z * j1z

    n = jnp.sum(w)
    a00 = n * (j0x * j0x + j0y * j0y + j0z * j0z)
    a01 = jnp.sum(w * j1_dot_j0)
    a11 = jnp.sum(w * j1_dot_j1)
    b0 = jnp.sum(w * r_dot_j0)
    b1 = jnp.sum(w * r_dot_j1)
    return jnp.stack([a00, a01, a11, b0, b1, n])


def solve_normal_equations(sums, beta):
    """Solve the (already reduced) 2x2 system: dx = -(JTJ/N + Omega)^-1 JTr/N."""
    a00, a01, a11, b0, b1, n_corr = (sums[i] for i in range(6))
    n = jnp.maximum(n_corr, 1.0)
    a00, a01, a11 = a00 / n, a01 / n, a11 / n
    b0, b1 = b0 / n, b1 / n
    a00 = a00 + beta                                 # Omega = diag(beta, 0)

    det = a00 * a11 - a01 * a01
    safe_det = jnp.where(jnp.abs(det) > _EPSILON, det, 1.0)
    dx0 = -(a11 * b0 - a01 * b1) / safe_det
    dx1 = -(a00 * b1 - a01 * b0) / safe_det
    dx = jnp.stack([dx0, dx1])
    # No correspondences or singular system -> no update.
    ok = (n_corr > 0) & (jnp.abs(det) > _EPSILON)
    return jnp.where(ok, dx, jnp.zeros_like(dx))


def compute_perturbation(source: P3, targets: P3, corr_mask, pose, beta):
    """Single-device perturbation (Registration.cpp:83-126)."""
    return solve_normal_equations(
        partial_normal_equations(source, targets, corr_mask, pose), beta)


def compute_robot_motion(m: hashmap.MapState, source: P3, source_mask,
                         last_pose, relative_wheel_odometry,
                         max_correspondence_distance,
                         *, voxel_size: float, max_probes: int,
                         max_num_iterations: int, convergence_criterion: float,
                         use_adaptive_odometry_regularization: bool,
                         fixed_regularization: float,
                         num_candidate_voxels: int = 27,
                         exact_gn_reassociation: bool = False,
                         exact_prune_candidates: int = 0,
                         gn_candidates_per_voxel: int = 0,
                         gn_backend: str = "auto",
                         threshold_max_range: float = 0.0):
    """Full ComputeRobotMotion (Registration.cpp:151-190).

    By default candidate map points are gathered ONCE at the initial guess
    and GN iterations re-select among them (gather-free);
    ``exact_gn_reassociation`` restores the reference's full re-gather per
    iteration.  ``exact_prune_candidates`` (with exact mode) re-gathers
    only the V nearest voxels by box lower bound per iteration and stays
    exact: every association also checks the certificate that no skipped
    voxel could have beaten (or tied) the found neighbor within tau, and a
    frame with any violated certificate recomputes through the full-27
    loop via ``lax.cond`` (see ``hashmap.gather_candidates``
    ``return_skip_bound``).  Certificate-passing frames are BITWISE equal
    to the full loop; fallback frames re-run the identical full-27 code
    but inside a cond branch, where XLA's fusion context may contract FMAs
    differently — equal to the last ulp, not bit-for-bit.  ``gn_backend``: "pallas" fuses the whole
    candidate-cached loop into one TPU kernel (ops/pallas_gn.py), "xla"
    uses the lax while_loop, "auto" picks pallas on TPU.  Returns
    (new_pose (4, 4), RegistrationDebug).
    """
    guess = se3.compose44(last_pose, relative_wheel_odometry)

    if gn_backend == "auto":
        rows = num_candidate_voxels * (gn_candidates_per_voxel
                                       or m.block_size)
        fits = pallas_gn_fits(rows, source.x.shape[-1])
        gn_backend = ("pallas" if jax.default_backend() == "tpu" and fits
                      else "xla")

    if gn_backend == "pallas" and not exact_gn_reassociation:
        from . import pallas_gn

        world_guess = transform(guess, source)
        cand = hashmap.gather_candidates(
            m, world_guess, voxel_size, max_probes, num_candidate_voxels)
        if gn_candidates_per_voxel:
            cand = hashmap.reduce_candidates(
                cand, world_guess, gn_candidates_per_voxel, voxel_size)
        pose, iters, num_corr, err, _ = pallas_gn.gn_solve(
            cand, source, source_mask, guess, max_correspondence_distance,
            voxel_size=voxel_size, max_num_iterations=max_num_iterations,
            convergence_criterion=convergence_criterion,
            use_adaptive_regularization=use_adaptive_odometry_regularization,
            fixed_regularization=fixed_regularization,
            max_range=threshold_max_range)
        return pose, RegistrationDebug(iterations=iters,
                                       num_correspondences=num_corr,
                                       odometry_error_pt=err)

    def run_gn(associate):
        """The reference GN loop over an ``associate(pose) -> (targets,
        corr_mask, certificate_violated)`` function.  Returns (pose, iters,
        num_corr, any_violation)."""
        targets, corr_mask, viol = associate(guess)

        if use_adaptive_odometry_regularization:
            beta = compute_odometry_regularization(
                source, targets, corr_mask, guess)
        else:
            beta = jnp.asarray(fixed_regularization, dtype=source.x.dtype)

        def cond_fn(carry):
            it, converged = carry[-3], carry[-2]
            return (it < max_num_iterations) & ~converged

        def body_fn(carry):
            pose, targets, corr_mask, it, _, viol = carry
            dx = compute_perturbation(source, targets, corr_mask, pose, beta)
            delta = motion_model.motion_model(dx)
            pose = se3.compose44(pose, delta)
            converged = jnp.linalg.norm(dx) < convergence_criterion
            # Re-associate only when the loop will continue (the reference
            # recomputes correspondences at the end of every non-final
            # iteration, Registration.cpp:185-186).
            targets, corr_mask, viol2 = jax.lax.cond(
                converged | (it + 1 >= max_num_iterations),
                lambda: (targets, corr_mask, jnp.bool_(False)),
                lambda: associate(pose),
            )
            return pose, targets, corr_mask, it + 1, converged, viol | viol2

        # The loop body runs at least once when iterations are allowed at
        # all (converged starts False); hoisting the first iteration out of
        # the while_loop saves one loop trip's fixed overhead and lets XLA
        # schedule it together with the initial association and regularizer.
        carry = (guess, targets, corr_mask, jnp.int32(0), jnp.bool_(False),
                 viol)
        if max_num_iterations >= 1:
            carry = body_fn(carry)
        pose, targets, corr_mask, iters, _, viol = jax.lax.while_loop(
            cond_fn, body_fn, carry)
        return (pose, iters, jnp.sum(corr_mask).astype(jnp.int32), viol)

    no_viol = jnp.bool_(False)
    if exact_gn_reassociation:
        def associate_native(pose):
            t, c = data_association(
                m, source, source_mask, pose, max_correspondence_distance,
                voxel_size, max_probes, 27)
            return t, c, no_viol

        if gn_backend == "pallas":
            # Certified fused kernel: the full 27-voxel neighborhood is
            # cached at the guess and the kernel re-selects per iteration,
            # evaluating the window-margin exactness certificate at every
            # trajectory-feeding selection (see pallas_gn.gn_solve) —
            # while it holds, the cached re-selection IS the reference's
            # re-gather (frozen map, sufficient window margin).  Violating
            # frames re-solve through the XLA full-27 loop.
            from . import pallas_gn

            world_guess = transform(guess, source)
            cand = hashmap.gather_candidates(
                m, world_guess, voxel_size, max_probes, 27)
            k_pose, k_it, k_nc, k_err, crossed = pallas_gn.gn_solve(
                cand, source, source_mask, guess,
                max_correspondence_distance,
                voxel_size=voxel_size,
                max_num_iterations=max_num_iterations,
                convergence_criterion=convergence_criterion,
                use_adaptive_regularization=(
                    use_adaptive_odometry_regularization),
                fixed_regularization=fixed_regularization,
                max_range=threshold_max_range, check_crossing=True)

            def fallback_native():
                pose, iters, ncorr, _ = run_gn(associate_native)
                # Same point-space odometry-error formula as the kernel
                # (rotations preserve norms; Frobenius inner product).
                dt = jnp.linalg.norm(pose[:3, 3] - guess[:3, 3])
                frob = jnp.sum(pose[:3, :3] * guess[:3, :3])
                c = jnp.clip((frob - 1.0) * 0.5, -1.0, 1.0)
                err = dt + 2.0 * threshold_max_range * jnp.sqrt(
                    jnp.maximum((1.0 - c) * 0.5, 0.0))
                return pose, iters, ncorr, err.astype(jnp.float32)

            pose, iters, ncorr, err = jax.lax.cond(
                crossed,
                fallback_native,
                lambda: (k_pose, k_it, k_nc, k_err),
            )
            return pose, RegistrationDebug(
                iterations=iters, num_correspondences=ncorr,
                odometry_error_pt=err, exact_fallback=crossed)

        if 0 < exact_prune_candidates < 27:
            tau2 = (max_correspondence_distance
                    * max_correspondence_distance)

            def associate_pruned(pose):
                world = transform(pose, source)
                cand, skip_lb_d2 = hashmap.gather_candidates(
                    m, world, voxel_size, max_probes,
                    exact_prune_candidates, return_skip_bound=True)
                t, dist = hashmap.nn_from_candidates(
                    cand, world, source_mask, voxel_size)
                # Certificate: the pruned search is bit-identical to the
                # full 27-voxel search unless some skipped voxel's box
                # lower bound reaches min(d*, tau)^2 — a candidate past tau
                # is rejected by the threshold gate either way (and the
                # rejected row's target is masked out of every downstream
                # sum), so only sub-tau winners matter.  The selection key
                # masks the 10 low mantissa bits of d^2 and tie-breaks by
                # (offset id, lane), so a skipped point in the SAME mask
                # bucket as d*^2 could still have won the tie: inflate the
                # threshold to the top of the NEXT bucket (the +0x400 also
                # absorbs the sqrt(d2)^2 round-trip, <= 1 ulp).
                d_cap = jnp.minimum(dist, max_correspondence_distance)
                d2 = jnp.minimum(d_cap * d_cap, tau2)
                thresh = jax.lax.bitcast_convert_type(
                    (jax.lax.bitcast_convert_type(d2, jnp.uint32)
                     | jnp.uint32(0x3FF)) + jnp.uint32(0x400), jnp.float32)
                viol = jnp.any(source_mask & (skip_lb_d2 <= thresh))
                return t, source_mask & (dist < max_correspondence_distance
                                         ), viol

            fast = run_gn(associate_pruned)
            # Certificate violated anywhere this frame (rare: bootstrap
            # frames with a near-empty map, or a query in a map hole):
            # recompute the WHOLE solve through the full-27 loop.  Both
            # branches only read the map table, so the cond copies nothing
            # large.
            pose, iters, ncorr, _ = jax.lax.cond(
                fast[3],
                lambda: run_gn(associate_native)[:3] + (no_viol,),
                lambda: fast[:3] + (no_viol,),
            )
            debug = RegistrationDebug(iterations=iters,
                                      num_correspondences=ncorr,
                                      exact_fallback=fast[3])
            return pose, debug
        else:
            pose, iters, ncorr, _ = run_gn(associate_native)
    else:
        world_guess = transform(guess, source)
        cand = hashmap.gather_candidates(
            m, world_guess, voxel_size, max_probes, num_candidate_voxels)
        if gn_candidates_per_voxel:
            cand = hashmap.reduce_candidates(
                cand, world_guess, gn_candidates_per_voxel, voxel_size)

        def associate_cached(pose):
            t, c = associate_from_candidates(
                cand, source, source_mask, pose,
                max_correspondence_distance, voxel_size)
            return t, c, no_viol

        pose, iters, ncorr, _ = run_gn(associate_cached)

    debug = RegistrationDebug(iterations=iters, num_correspondences=ncorr)
    return pose, debug
