"""Epipolar geometry: F from poses, epipolar distances, match filtering,
and the ORB-SLAM-style H/F model-selection scores.

Replaces:
  - GeometryUtils::calculateFundamentalMatrix (CSfM.cpp:164)
  - GeometryUtils::filterMatches (epipolar distance + positive depth,
    CSfM.cpp:165, 922)
  - GeometryUtils::distancePointLine2D (CSfM.cpp:456-457)
  - CSfM::calculateHomographyScore / calculateFundamentalScore
    (CSfM.cpp:415-469)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import exp_so3
from .camera import depths
from .smallinv import inv3x3


def essential_from_poses(rvec0, tvec0, rvec1, tvec1):
    """E for the relative pose cam0 -> cam1 (world-to-cam convention).

    x1^T E x0 = 0 for normalized coords.  E = [t_rel]_x R_rel with
    R_rel = R1 R0^T, t_rel = t1 - R_rel t0.
    """
    R0, R1 = exp_so3(rvec0), exp_so3(rvec1)
    R = R1 @ R0.T
    t = tvec1 - R @ tvec0
    tx = jnp.array([
        [0.0, -t[2], t[1]],
        [t[2], 0.0, -t[0]],
        [-t[1], t[0], 0.0],
    ], dtype=t.dtype)
    return tx @ R


def fundamental_from_poses(K0, rvec0, tvec0, K1, rvec1, tvec1):
    """F = K1^-T E K0^-1 (GeometryUtils::calculateFundamentalMatrix)."""
    E = essential_from_poses(rvec0, tvec0, rvec1, tvec1)
    K0inv = inv3x3(K0)
    K1inv = inv3x3(K1)
    return K1inv.T @ E @ K0inv


def _homog(uv):
    return jnp.concatenate([uv, jnp.ones(uv.shape[:-1] + (1,), uv.dtype)], -1)


def epiline_distance_sq(F, uv0, uv1):
    """Squared point-to-epipolar-line distances, both directions.

    Returns (d1_sq, d0_sq): distance of x1 to F x0, and of x0 to F^T x1.
    uv0, uv1: [N,2] pixels.
    """
    x0 = _homog(uv0)
    x1 = _homog(uv1)
    l1 = x0 @ F.T          # lines in image 1
    l0 = x1 @ F             # lines in image 0
    num = jnp.sum(x1 * l1, axis=-1)  # = x1^T F x0 (same scalar both ways)
    d1 = num * num / (l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-12)
    d0 = num * num / (l0[:, 0] ** 2 + l0[:, 1] ** 2 + 1e-12)
    return d1, d0


def filter_matches_epipolar(F, uv0, uv1, xyz,
                            rvec0, tvec0, rvec1, tvec1,
                            max_err: float, valid=None):
    """GeometryUtils::filterMatches: keep matches whose symmetric epipolar
    distance is below max_err (px) AND whose triangulated point has positive
    depth in both cameras.  Returns a boolean keep mask [N]."""
    d1, d0 = epiline_distance_sq(F, uv0, uv1)
    max2 = max_err * max_err
    ok_epi = (d1 < max2) & (d0 < max2)
    z0 = depths(rvec0, tvec0, xyz)
    z1 = depths(rvec1, tvec1, xyz)
    ok = ok_epi & (z0 > 0) & (z1 > 0)
    if valid is not None:
        ok = ok & valid
    return ok


def homography_transfer_error_sq(H, uv0, uv1):
    """Squared symmetric transfer errors under homography H (x1 ~ H x0).

    Returns (e_fwd, e_bwd): |x1 - H x0|^2 and |x0 - H^-1 x1|^2."""
    Hinv = inv3x3(H)
    x0 = _homog(uv0)
    x1 = _homog(uv1)
    p1 = x0 @ H.T
    p0 = x1 @ Hinv.T
    p1 = p1[:, :2] / (p1[:, 2:3] + jnp.where(jnp.abs(p1[:, 2:3]) < 1e-12, 1e-12, 0.0))
    p0 = p0[:, :2] / (p0[:, 2:3] + jnp.where(jnp.abs(p0[:, 2:3]) < 1e-12, 1e-12, 0.0))
    e_fwd = jnp.sum((uv1 - p1) ** 2, axis=-1)
    e_bwd = jnp.sum((uv0 - p0) ** 2, axis=-1)
    return e_fwd, e_bwd


def homography_score(H, uv0, uv1, valid, th: float = 5.99):
    """ORB-SLAM SH score (CSfM.cpp:415-441): sum over matches of
    (th - e) for each direction where e < th.  Also returns the per-match
    inlier mask (both directions below threshold)."""
    e_fwd, e_bwd = homography_transfer_error_sq(H, uv0, uv1)
    v = valid.astype(e_fwd.dtype)
    s = jnp.sum(jnp.where((e_fwd < th) & valid, th - e_fwd, 0.0))
    s += jnp.sum(jnp.where((e_bwd < th) & valid, th - e_bwd, 0.0))
    inliers = (e_fwd < th) & (e_bwd < th) & valid
    del v
    return s, inliers


def fundamental_score(F, uv0, uv1, valid, th: float = 3.84,
                      th_score: float = 5.99):
    """ORB-SLAM SF score (CSfM.cpp:443-469): epipolar point-line distances,
    inlier threshold th, score term (th_score - d)."""
    d1, d0 = epiline_distance_sq(F, uv0, uv1)
    s = jnp.sum(jnp.where((d1 < th) & valid, th_score - d1, 0.0))
    s += jnp.sum(jnp.where((d0 < th) & valid, th_score - d0, 0.0))
    inliers = (d1 < th) & (d0 < th) & valid
    return s, inliers


def mean_transfer_error(H, uv0, uv1, valid):
    """GeometryUtils::calculateHomographyAvgError (CSfM.cpp:871)."""
    e_fwd, e_bwd = homography_transfer_error_sq(H, uv0, uv1)
    e = 0.5 * (jnp.sqrt(e_fwd) + jnp.sqrt(e_bwd))
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, e, 0.0)) / n


def mean_epipolar_error(F, uv0, uv1, valid):
    """GeometryUtils::calculateFundamentalAvgError (CSfM.cpp:894)."""
    d1, d0 = epiline_distance_sq(F, uv0, uv1)
    e = 0.5 * (jnp.sqrt(d1) + jnp.sqrt(d0))
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, e, 0.0)) / n
