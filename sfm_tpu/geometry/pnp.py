"""Perspective-n-Point: DLT pose from 2D-3D correspondences + Gauss-Newton
pose refinement.

Replaces cv::solvePnPRansac(SOLVEPNP_ITERATIVE) (CSfM.cpp:552-560).  The
RANSAC harness (hypothesis sampling / inlier voting) lives in
sfm_tpu/ransac.py; here:
  - ``pnp_dlt``: 6+ point DLT of the 3x4 projection matrix, R extracted by
    orthogonal Procrustes, cheirality-corrected.
  - ``refine_pose``: fixed-iteration damped Gauss-Newton on the masked
    reprojection residual (the "iterative" part of SOLVEPNP_ITERATIVE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import log_so3
from .camera import project


def pnp_dlt(K: jnp.ndarray, xyz: jnp.ndarray, uv: jnp.ndarray,
            w: jnp.ndarray):
    """Weighted DLT pose.  xyz [N,3] world, uv [N,2] pixels, w [N] weights.

    Works in normalized camera coords (K removed) for conditioning.
    Returns (rvec, tvec).  Needs >= 6 effective points, non-coplanar."""
    wf = w.astype(xyz.dtype)
    Kinv = jnp.linalg.inv(K)
    ones = jnp.ones((uv.shape[0], 1), uv.dtype)
    xn = (jnp.concatenate([uv, ones], axis=1) @ Kinv.T)[:, :2]
    # normalize 3D points: center + scale (Hartley-style) for fp32
    wsum = jnp.maximum(jnp.sum(wf), 1e-6)
    mean3 = jnp.sum(xyz * wf[:, None], axis=0) / wsum
    Xc = xyz - mean3
    scale3 = jnp.sum(jnp.linalg.norm(Xc, axis=-1) * wf) / wsum
    s3 = jnp.sqrt(3.0) / jnp.maximum(scale3, 1e-9)
    Xn = Xc * s3

    x, y = xn[:, 0], xn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    X0, X1, X2 = Xn[:, 0], Xn[:, 1], Xn[:, 2]
    # P rows p1,p2,p3 (12 unknowns): x = p1.X / p3.X, y = p2.X / p3.X
    r1 = jnp.stack([X0, X1, X2, one, zero, zero, zero, zero,
                    -x * X0, -x * X1, -x * X2, -x], axis=-1)
    r2 = jnp.stack([zero, zero, zero, zero, X0, X1, X2, one,
                    -y * X0, -y * X1, -y * X2, -y], axis=-1)
    A = jnp.concatenate([r1 * wf[:, None], r2 * wf[:, None]], axis=0)
    evals, V = jnp.linalg.eigh(A.T @ A)
    p = V[:, 0]
    P = p.reshape(3, 4)
    M = P[:, :3]
    # fix global sign so that most weighted points have positive depth
    z_sign = jnp.sum(jnp.sign(Xn @ M[2] + P[2, 3]) * wf)
    P = P * jnp.where(z_sign < 0, -1.0, 1.0)
    M = P[:, :3]
    # orthogonal Procrustes: R = U V^T, scale = mean singular value
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0], M.dtype)) + \
        jnp.diag(jnp.array([0.0, 0.0, 1.0], M.dtype)) * det
    R = U @ D @ Vt
    scale = jnp.sum(S * jnp.array([1.0, 1.0, det], M.dtype)) / 3.0
    t_n = P[:, 3] / jnp.maximum(scale, 1e-12)
    # undo 3D normalization: x_cam = R (s3 (X - mean3)) + t_n
    #                              = s3 R X + (t_n - s3 R mean3)
    # true pose: x_cam' = R X + t  with t = (t_n / s3... )
    # x_cam is only defined up to the projective scale, so recover
    # t = t_n / s3 ... careful: P was estimated on Xn, so R Xn + t_n ~ cam.
    # cam = R (s3(X-mean3)) + t_n = s3 (R X + (t_n/s3 - R mean3)).
    # Projection is scale-invariant in cam -> t = t_n/s3 - R mean3.
    t = t_n / s3 - R @ mean3
    return log_so3(R), t


def _pose_residual_jac(K, rvec, tvec, xyz, uv, w):
    """Masked residuals [N,2] and analytic pose-Jacobian blocks [N,2,6]
    under the local left-multiplicative parameterization
    (R <- exp(dw) R, t <- t + dt) — the same closed forms as the BA blocks
    (sfm_tpu/ba/residuals.py)."""
    from .rotations import exp_so3 as _exp, hat as _hat
    R = _exp(rvec)
    RX = xyz @ R.T
    p = RX + tvec
    z = p[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    inv_z = 1.0 / z_safe
    fx, fy, skew = K[0, 0], K[1, 1], K[0, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * p[:, 0] * inv_z + skew * p[:, 1] * inv_z + cx
    v = fy * p[:, 1] * inv_z + cy
    r = (jnp.stack([u, v], -1) - uv) * w[:, None]
    zero = jnp.zeros_like(inv_z)
    duv_dp = jnp.stack([
        jnp.stack([fx * inv_z, skew * inv_z,
                   -(fx * p[:, 0] + skew * p[:, 1]) * inv_z * inv_z], -1),
        jnp.stack([zero, fy * inv_z, -fy * p[:, 1] * inv_z * inv_z], -1),
    ], axis=1)
    A_w = jnp.einsum("oij,ojk->oik", duv_dp, -_hat(RX))
    A = jnp.concatenate([A_w, duv_dp], -1) * w[:, None, None]
    return r, A


def refine_pose(K: jnp.ndarray, rvec: jnp.ndarray, tvec: jnp.ndarray,
                xyz: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray,
                iters: int = 10, damping: float = 1e-4):
    """Pose-only damped Gauss-Newton (Levenberg) on masked reprojection,
    with analytic Jacobians and a local pose parameterization.

    Fixed trip count; jit/vmap-friendly.  Returns (rvec, tvec)."""
    from .rotations import exp_so3 as _exp, log_so3 as _log

    def cost_of(rv, tv):
        pred = project(K, rv, tv, xyz)
        return jnp.sum(((pred - uv) * w[:, None]) ** 2)

    def body(_, carry):
        rv, tv, cost = carry
        r, A = _pose_residual_jac(K, rv, tv, xyz, uv, w)
        H = jnp.einsum("oia,oib->ab", A, A)
        g = jnp.einsum("oia,oi->a", A, r)
        H = H + damping * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        step = jnp.linalg.solve(H, g)
        rv_new = _log(_exp(-step[:3]) @ _exp(rv))
        tv_new = tv - step[3:]
        new_cost = cost_of(rv_new, tv_new)
        ok = new_cost < cost
        return (jnp.where(ok, rv_new, rv), jnp.where(ok, tv_new, tv),
                jnp.where(ok, new_cost, cost))

    rv, tv, _ = jax.lax.fori_loop(0, iters, body,
                                  (rvec, tvec, cost_of(rvec, tvec)))
    return rv, tv


def reprojection_errors(K, rvec, tvec, xyz, uv):
    """Per-point reprojection error in pixels [N]."""
    pred = project(K, rvec, tvec, xyz)
    return jnp.linalg.norm(pred - uv, axis=-1)
