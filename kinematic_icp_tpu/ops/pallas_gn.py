"""Fused Pallas TPU kernel for the candidate-cached Gauss-Newton loop.

Why a kernel: the GN loop's real per-iteration arithmetic is tiny (a few
passes over the VMEM-sized candidate planes plus a 2x2 scalar solve), but the
XLA lowering runs it as ~10 separate fusions per ``lax.while_loop`` trip —
measured ~27 us/iteration of fixed fusion-launch overhead at source widths
of 1-4K points, ~270 us/frame of the realistic-regime budget.  Fusing the
whole loop (selection -> normal equations -> solve -> unicycle update ->
re-selection, times max_num_iterations) into ONE kernel keeps every
intermediate in VMEM/registers and pays the launch cost once.

Semantics replicated exactly from ops/registration.py (reference
Registration.cpp:151-190):
  * NN re-selection per iteration among the per-frame cached candidates,
    with the same packed-key tie-breaking as ``hashmap.nn_from_candidates``;
  * adaptive beta from the initial-guess residuals;
  * 2x2 normal equations (JTJ/N + diag(beta, 0)), unicycle motion model
    (z-axis twist closed form of se3_exp), convergence on |dx|;
  * converged iterations degrade to exact no-ops (dx = 0 composes an exact
    identity), so the fixed ``fori_loop`` trip count reproduces the dynamic
    loop's trajectory.

The candidate planes are unpacked OUTSIDE the kernel (pose-independent, one
XLA fusion); the kernel consumes (V*K, N) coordinate planes + tie-break tags
and the (1, N) source planes — all resident in VMEM for the whole solve.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashmap import CandidateSet, _candidate_points

#: far-away coordinate for invalid candidates: d2 ~ 1e36 stays finite in f32
#: and its bitcast key sorts after every real distance.
_FAR = 1e18
_EPSILON = 1e-30


def _taylor_abc(t2):
    """Small-angle A, B, C for a z-axis twist (|theta| <= ~0.2 rad per GN
    step in practice; the series are f32-exact far beyond that)."""
    a = 1.0 - t2 / 6.0 + t2 * t2 / 120.0
    b = 0.5 - t2 / 24.0 + t2 * t2 / 720.0
    c = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0
    return a, b, c


def _motion_delta(dx0, dx1):
    """Unicycle motion model -> (r00, r01, r10, r11, tx, ty) of the SE(3)
    delta (z-axis rotation block; z/row/col 2 are identity/zero).

    Mirrors motion_model.control_to_twist + se3_exp specialized to
    w = (0, 0, theta), v = (rho sinc, rho verc, 0); all scalar arithmetic.
    """
    rho, theta = dx0, dx1
    t2 = theta * theta
    big = jnp.abs(theta) >= 1e-3
    # sinc/verc: f32-stable (Taylor below 1e-3; sin-based identities above)
    safe = jnp.where(big, theta, 1.0)
    sinc = jnp.where(big, jnp.sin(safe) / safe, 1.0 - t2 / 6.0)
    sh = jnp.sin(0.5 * safe)
    verc = jnp.where(big, 2.0 * sh * sh / safe, theta / 2.0 - t2 * theta / 24.0)
    vx = rho * sinc
    vy = rho * verc

    # exp of the z-axis twist: R = rotz(theta), t = V (vx, vy, 0) with
    # V = I + B W + C W^2, W = hat((0,0,theta)).
    ct = jnp.where(big, jnp.cos(safe), 1.0 - t2 / 2.0 + t2 * t2 / 24.0)
    st = jnp.where(big, jnp.sin(safe), theta - t2 * theta / 6.0)
    _, b_c, c_c = _taylor_abc(t2)
    bb = jnp.where(big, 2.0 * (sh / safe) * sh, b_c * theta)  # B*theta
    cc = jnp.where(big, (1.0 - sinc) / safe, c_c * theta)     # C*theta
    v00 = 1.0 - cc * theta
    tx = v00 * vx - bb * vy
    ty = bb * vx + v00 * vy
    return ct, -st, st, ct, tx, ty


def _kernel(params_ref, px_ref, py_ref, pz_ref, tag_ref,
            sx_ref, sy_ref, sz_ref, sm_ref, bx_ref, by_ref, bz_ref,
            pose_out_ref, stats_out_ref, err_out_ref, *,
            max_num_iterations: int, convergence_criterion: float,
            use_adaptive_regularization: bool, fixed_regularization: float,
            check_crossing: bool):
    px = px_ref[:]                      # (VK, N) candidate planes
    py = py_ref[:]
    pz = pz_ref[:]
    tag = tag_ref[:]                    # (VK, N) tie-break tags
    sx = sx_ref[:]                      # (1, N) source planes
    sy = sy_ref[:]
    sz = sz_ref[:]
    sm = sm_ref[:]                      # (1, N) source mask as f32
    if check_crossing:
        bx = bx_ref[:]                  # (1, N) gather-time voxel coords
        by = by_ref[:]                  # (as f32 — exact to 2^24)
        bz = bz_ref[:]

    def P(i):
        return params_ref[0, i]

    tau = P(12)
    inv_vs = P(14)

    lo = jnp.uint32(0x3FF)

    def select(r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2s):
        """nn_from_candidates + threshold gate, fused; returns targets+corr
        (+ the window-margin exactness certificate when enabled, see
        below)."""
        wx = r00 * sx + r01 * sy + r02 * sz + t0          # (1, N)
        wy = r10 * sx + r11 * sy + r12 * sz + t1
        wz = r20 * sx + r21 * sy + r22 * sz + t2s
        dx = px - wx
        dy = py - wy
        dz = pz - wz
        d2 = dx * dx + dy * dy + dz * dz                  # (VK, N)
        # Mosaic cannot min-reduce unsigned ints; every key is < 2^31
        # (d2 >= 0 keeps the sign bit clear, even for the _FAR sentinel's
        # +inf), so reduce the bitcast as SIGNED int32 — same order.
        key = pltpu.bitcast((pltpu.bitcast(d2, jnp.uint32) & ~lo) | tag,
                            jnp.int32)
        best = jnp.min(key, axis=0, keepdims=True)        # (1, N)
        pick = key == best
        nx = jnp.sum(jnp.where(pick, px, 0.0), axis=0, keepdims=True)
        ny = jnp.sum(jnp.where(pick, py, 0.0), axis=0, keepdims=True)
        nz = jnp.sum(jnp.where(pick, pz, 0.0), axis=0, keepdims=True)
        ex = nx - wx
        ey = ny - wy
        ez = nz - wz
        dw2 = ex * ex + ey * ey + ez * ez
        dist = jnp.sqrt(dw2)
        corr = sm * (dist < tau).astype(jnp.float32)      # (1, N)
        if not check_crossing:
            return nx, ny, nz, corr, jnp.float32(0.0)
        # Window-margin certificate: every cached candidate lies in the
        # 3-voxel window W = [vs*(b-1), vs*(b+2)) around the gather-time
        # voxel b.  The selection at the CURRENT pose is identical to the
        # reference's re-gather (27 voxels around the current voxel c')
        # when, per masked query, inflate(min(d*, tau)^2) < min(m, vs)^2:
        #   * points the reference sees but we don't live outside W, at
        #     distance >= m = dist(w, boundary of W);
        #   * points we see but the reference doesn't (c' != b) are >= 2
        #     voxels from c' along some axis, i.e. at distance > vs
        #     (and when w leaves W entirely, m <= 0 always fires);
        #   * a candidate past tau is rejected by both sides regardless.
        # inflate() lifts d*^2 to the top of the NEXT selection-key mask
        # bucket (low-10-mantissa quantized ties break by offset id, and
        # it absorbs the dw2-vs-d2 recompute drift).  For an unmoved query
        # m >= vs, so the certificate passes whenever tau < vs — frontier
        # queries included.
        vs = P(15)
        mx = jnp.minimum(wx - (bx - 1.0) * vs, (bx + 2.0) * vs - wx)
        my = jnp.minimum(wy - (by - 1.0) * vs, (by + 2.0) * vs - wy)
        mz = jnp.minimum(wz - (bz - 1.0) * vs, (bz + 2.0) * vs - wz)
        margin = jnp.maximum(
            jnp.minimum(jnp.minimum(jnp.minimum(mx, my), mz), vs), 0.0)
        cap2 = jnp.minimum(dw2, tau * tau)
        cap2 = pltpu.bitcast(
            (pltpu.bitcast(cap2, jnp.uint32) | jnp.uint32(0x3FF))
            + jnp.uint32(0x400), jnp.float32)
        viol = jnp.sum(sm * (cap2 >= margin * margin).astype(jnp.float32))
        return nx, ny, nz, corr, viol

    def normal_eqs(r00, r01, r10, r11, r20, r21, t0, t1, t2s,
                   r02, r12, r22, nx, ny, nz, corr):
        """partial_normal_equations, identical formulas."""
        wx = r00 * sx + r01 * sy + r02 * sz + t0
        wy = r10 * sx + r11 * sy + r12 * sz + t1
        wz = r20 * sx + r21 * sy + r22 * sz + t2s
        rx = wx - nx
        ry = wy - ny
        rz = wz - nz
        j1x = -sy * r00 + sx * r01
        j1y = -sy * r10 + sx * r11
        j1z = -sy * r20 + sx * r21
        j1_dot_j0 = j1x * r00 + j1y * r10 + j1z * r20
        j1_dot_j1 = j1x * j1x + j1y * j1y + j1z * j1z
        r_dot_j0 = rx * r00 + ry * r10 + rz * r20
        r_dot_j1 = rx * j1x + ry * j1y + rz * j1z
        n = jnp.sum(corr)
        a00 = n * (r00 * r00 + r10 * r10 + r20 * r20)
        a01 = jnp.sum(corr * j1_dot_j0)
        a11 = jnp.sum(corr * j1_dot_j1)
        b0 = jnp.sum(corr * r_dot_j0)
        b1 = jnp.sum(corr * r_dot_j1)
        return a00, a01, a11, b0, b1, n

    # ---- initial association at the guess + regularizer ------------------
    # The certificate runs at the INITIAL selection too: the in-kernel
    # transform of the guess can differ from the XLA-side one that chose
    # the gather windows by an ulp (FMA contraction), which the margin's
    # one-bucket inflation absorbs.
    guess = tuple(P(i) for i in range(12))
    nx, ny, nz, corr, crossed0 = select(*guess)
    if use_adaptive_regularization:
        g = guess
        wx = g[0] * sx + g[1] * sy + g[2] * sz + g[9]
        wy = g[3] * sx + g[4] * sy + g[5] * sz + g[10]
        wz = g[6] * sx + g[7] * sy + g[8] * sz + g[11]
        rx = wx - nx
        ry = wy - ny
        rz = wz - nz
        sq = rx * rx + ry * ry + rz * rz
        ncorr0 = jnp.sum(corr)
        sse = jnp.sum(corr * sq)
        mean = sse / jnp.maximum(ncorr0, 1.0)
        beta = jnp.where(ncorr0 > 0, 1.0 / (mean + _EPSILON), 0.0)
    else:
        beta = jnp.float32(fixed_regularization)

    def cond(carry):
        # NOTE: lax.while_loop, not fori_loop — Mosaic compiles the rolled
        # while body in under a second, while the (unrolled) fori lowering
        # takes ~4 MINUTES through the remote TPU compiler for the same
        # body; the dynamic exit also skips converged iterations' work.
        it, conv = carry[-3], carry[-2]
        return (it < max_num_iterations) & ~conv

    def body(carry):
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2s,
         nx, ny, nz, corr, it, conv, crossed) = carry
        a00, a01, a11, b0, b1, n = normal_eqs(
            r00, r01, r10, r11, r20, r21, t0, t1, t2s, r02, r12, r22,
            nx, ny, nz, corr)
        nsafe = jnp.maximum(n, 1.0)
        a00 = a00 / nsafe + beta
        a01 = a01 / nsafe
        a11 = a11 / nsafe
        b0 = b0 / nsafe
        b1 = b1 / nsafe
        det = a00 * a11 - a01 * a01
        safe_det = jnp.where(jnp.abs(det) > _EPSILON, det, 1.0)
        dx0 = -(a11 * b0 - a01 * b1) / safe_det
        dx1 = -(a00 * b1 - a01 * b0) / safe_det
        ok = (n > 0) & (jnp.abs(det) > _EPSILON)
        dx0 = jnp.where(ok, dx0, 0.0)
        dx1 = jnp.where(ok, dx1, 0.0)

        d00, d01, d10, d11, dtx, dty = _motion_delta(dx0, dx1)
        # pose' = pose @ delta (delta's z row/col are identity)
        n00 = r00 * d00 + r01 * d10
        n01 = r00 * d01 + r01 * d11
        n10 = r10 * d00 + r11 * d10
        n11 = r10 * d01 + r11 * d11
        n20 = r20 * d00 + r21 * d10
        n21 = r20 * d01 + r21 * d11
        nt0 = r00 * dtx + r01 * dty + t0
        nt1 = r10 * dtx + r11 * dty + t1
        nt2 = r20 * dtx + r21 * dty + t2s

        it = it + 1
        conv = jnp.sqrt(dx0 * dx0 + dx1 * dx1) < convergence_criterion
        nx2, ny2, nz2, corr2, cr2 = select(n00, n01, r02, n10, n11, r12,
                                           n20, n21, r22, nt0, nt1, nt2)
        # This select feeds the NEXT iteration only when the loop
        # continues; a trailing (post-convergence / post-last) selection
        # never participates in the reference trajectory, so its
        # certificate does not count.
        used = (~conv) & (it < max_num_iterations)
        return (n00, n01, r02, n10, n11, r12, n20, n21, r22,
                nt0, nt1, nt2, nx2, ny2, nz2, corr2, it, conv,
                crossed + jnp.where(used, cr2, 0.0))

    carry = guess + (nx, ny, nz, corr, jnp.int32(0), jnp.bool_(False),
                     crossed0)
    carry = jax.lax.while_loop(cond, body, carry)
    (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2s,
     nx, ny, nz, corr, it, conv, crossed) = carry

    out = jnp.stack([r00, r01, r02, t0, r10, r11, r12, t1,
                     r20, r21, r22, t2s, 0.0 * t0, 0.0 * t0, 0.0 * t0,
                     1.0 + 0.0 * t0]).reshape(1, 16)
    pose_out_ref[:] = out
    stats_out_ref[0, 0] = it
    stats_out_ref[0, 1] = jnp.sum(corr).astype(jnp.int32)
    stats_out_ref[0, 2] = (crossed > 0).astype(jnp.int32)

    # Adaptive-threshold "odometry error in point space" of
    # E = guess^-1 @ final (CorrespondenceThreshold.cpp:7-12): rotations
    # preserve norms, so |t_E| = |t_final - t_guess|, and
    # trace(R_guess^T R_final) is the Frobenius inner product of the two
    # rotation blocks; sin(acos(c)/2) = sqrt((1-c)/2) exactly.
    dtx = t0 - P(9)
    dty = t1 - P(10)
    dtz = t2s - P(11)
    dt = jnp.sqrt(dtx * dtx + dty * dty + dtz * dtz)
    frob = (r00 * P(0) + r01 * P(1) + r02 * P(2)
            + r10 * P(3) + r11 * P(4) + r12 * P(5)
            + r20 * P(6) + r21 * P(7) + r22 * P(8))
    c = jnp.clip((frob - 1.0) * 0.5, -1.0, 1.0)
    err_out_ref[0, 0] = dt + 2.0 * P(13) * jnp.sqrt(
        jnp.maximum((1.0 - c) * 0.5, 0.0))


def gn_solve(cand: CandidateSet, source, source_mask, guess, tau, *,
             voxel_size: float, max_num_iterations: int,
             convergence_criterion: float,
             use_adaptive_regularization: bool,
             fixed_regularization: float,
             max_range: float = 0.0,
             check_crossing: bool = False,
             interpret: bool = False):
    """Run the whole candidate-cached GN solve as one Pallas kernel.

    Args mirror registration.compute_robot_motion's candidate-cached branch;
    ``guess`` is the (4, 4) initial pose.  Returns (pose (4, 4), iterations,
    num_correspondences, odometry_error_pt, crossed) — odometry_error_pt is
    the adaptive threshold's point-space error of guess^-1 @ pose, computed
    in-kernel (scaled by ``max_range``).

    ``check_crossing``: every trajectory-feeding selection also evaluates
    the WINDOW-MARGIN exactness certificate (see the kernel comment):
    while it holds, the cached re-selection is EXACTLY the reference's
    re-gather-per-iteration association (Registration.cpp:179-187) — the
    re-gathered neighborhood could only add points farther than the
    query's margin to the cached window (all past min(d*, tau)), and
    could only drop points farther than one voxel (past any sub-tau
    winner).  ``crossed`` (scalar bool) reports a violation; the
    exact-mode caller re-solves those frames through the XLA full-27
    loop.  For an unmoved query the margin is a full voxel, so the fast
    path engages whenever tau < voxel_size regardless of map coverage.
    """
    v, k, n = cand.words.shape
    assert k <= 32, "packed NN tie-break key holds a 5-bit entry lane"
    dtype = source.x.dtype
    pts, valid = _candidate_points(cand, voxel_size, dtype)
    px = jnp.where(valid, pts.x, _FAR).reshape(v * k, n)
    py = jnp.where(valid, pts.y, _FAR).reshape(v * k, n)
    pz = jnp.where(valid, pts.z, _FAR).reshape(v * k, n)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (v, k, n), 1)
    tag = ((cand.rel.astype(jnp.uint32)[:, None, :] << 5) | lane
           ).reshape(v * k, n)

    params = jnp.concatenate([
        guess[:3, :3].astype(jnp.float32).reshape(9),
        guess[:3, 3].astype(jnp.float32),
        jnp.asarray(tau, jnp.float32)[None],
        jnp.asarray(max_range, jnp.float32)[None],
        jnp.full(1, 1.0 / voxel_size, jnp.float32),
        jnp.full(1, voxel_size, jnp.float32),
    ]).reshape(1, 16)

    if check_crossing:
        bx = cand.base_x.astype(jnp.float32)[None, :]
        by = cand.base_y.astype(jnp.float32)[None, :]
        bz = cand.base_z.astype(jnp.float32)[None, :]
    else:
        bx = by = bz = jnp.zeros((1, n), jnp.float32)

    kern = functools.partial(
        _kernel,
        max_num_iterations=max_num_iterations,
        convergence_criterion=convergence_criterion,
        use_adaptive_regularization=use_adaptive_regularization,
        fixed_regularization=fixed_regularization,
        check_crossing=check_crossing)

    compiler_params = None
    if not interpret:
        # Raise the compiler's scoped-VMEM soft limit to the calibrated
        # estimate for this shape (the 16 MB default rejects the
        # exact-mode 540-row kernel, which runs fine at ~20 MB on v5e).
        # KICP_PALLAS_VMEM_MB overrides for experiments.
        from .registration import pallas_gn_vmem_bytes
        need = pallas_gn_vmem_bytes(v * k, n) + (3 << 20)
        env_mb = int(os.environ.get("KICP_PALLAS_VMEM_MB", "0"))
        limit = (env_mb << 20) if env_mb else max(16 << 20, need)
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=limit)
    pose16, stats, err = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, 16), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        in_specs=[pl.BlockSpec((1, 16), memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 3), memory_space=pltpu.SMEM),
                   pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)),
        compiler_params=compiler_params,
        interpret=interpret,
    )(params, px, py, pz, tag,
      source.x[None, :].astype(jnp.float32),
      source.y[None, :].astype(jnp.float32),
      source.z[None, :].astype(jnp.float32),
      source_mask[None, :].astype(jnp.float32),
      bx, by, bz)

    pose = pose16.reshape(4, 4).astype(guess.dtype)
    return pose, stats[0, 0], stats[0, 1], err[0, 0], stats[0, 2] > 0
