"""Two-view motion: E/H decomposition with cheirality voting.

Replaces GeometryUtils::RtFromEssentialMatrix (SVD 4-way decomposition +
cheirality vote, CSfM.cpp:899) and RtFromHomographyMatrix (Faugeras-style
decomposition + cheirality vote, CSfM.cpp:874).  The decompositions follow
the textbook algorithms (Hartley & Zisserman 9.6.2; Faugeras & Lustman 1988);
candidate selection triangulates every match under every candidate in one
vmap and votes by positive-depth count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import log_so3
from .triangulate import triangulate_pair
from .camera import apply_intrinsics
from .smallinv import inv3x3


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t) with |t| = 1.  Returns (Rs [4,3,3], ts [4,3])."""
    U, S, Vt = jnp.linalg.svd(E)
    # make proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H: jnp.ndarray, K0: jnp.ndarray, K1: jnp.ndarray):
    """Faugeras SVD decomposition of a Euclidean homography into 8 candidate
    (R, t) motions (plane normals are computed but not returned).

    H maps pixels image0 -> image1; A = K1^-1 H K0 is the calibrated
    homography A ~ R + t n^T / d."""
    A = inv3x3(K1) @ H @ K0
    U, D, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]
    eps = 1e-9
    denom13 = jnp.maximum(d1 * d1 - d3 * d3, eps)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom13, 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom13, 0.0, None))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    sign_flips = jnp.array([1.0, -1.0, -1.0, 1.0])

    def make_case(positive_d2: bool):
        # positive_d2: d' = d2 case -> Rp is a rotation about y by theta,
        #   tp = (d1 - d3) [x1, 0, -x3].
        # else: d' = -d2 case -> Rp = diag-structured rotation+reflection,
        #   tp = (d1 + d3) [x1, 0, x3].
        if positive_d2:
            denom = jnp.maximum((d1 + d3) * d2, eps)
            c = (d2 * d2 + d1 * d3) / denom
            t_scale, t_z_sign, ryy, czz = d1 - d3, -1.0, 1.0, 1.0
        else:
            denom = jnp.maximum((d1 - d3) * d2, eps)
            c = (d1 * d3 - d2 * d2) / denom
            t_scale, t_z_sign, ryy, czz = d1 + d3, 1.0, -1.0, -1.0
        aux_s = jnp.sqrt(jnp.clip(
            (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) / denom

        def one(i):
            st = sign_flips[i] * aux_s
            Rp = jnp.stack([
                jnp.stack([c, jnp.zeros_like(c), -st * czz]),
                jnp.stack([jnp.zeros_like(c), jnp.full_like(c, ryy),
                           jnp.zeros_like(c)]),
                jnp.stack([st, jnp.zeros_like(c), c * czz]),
            ])
            R = s * (U @ Rp @ Vt)
            tp = t_scale * jnp.stack([x1s[i], jnp.zeros_like(x1s[i]),
                                      t_z_sign * x3s[i]])
            tp = tp / (jnp.linalg.norm(tp) + eps)
            t = U @ tp
            return R, t

        Rs, ts = jax.vmap(one)(jnp.arange(4))
        return Rs, ts

    Rs_a, ts_a = make_case(+1)
    Rs_b, ts_b = make_case(-1)
    return jnp.concatenate([Rs_a, Rs_b]), jnp.concatenate([ts_a, ts_b])


def cheirality_vote(Rs, ts, K0, K1, uv0, uv1, valid,
                    max_reproj_err: float = 7.0):
    """Pick the (R, t) candidate maximizing the number of matches that
    triangulate in front of BOTH cameras with acceptable reprojection error.

    Camera 0 at origin; candidate pose is (R, t) for camera 1.
    Returns (best_R, best_t, best_X [N,3], good_mask [N], n_good)."""
    P0 = K0 @ jnp.concatenate([jnp.eye(3, dtype=K0.dtype),
                               jnp.zeros((3, 1), K0.dtype)], axis=1)

    def score(R, t):
        P1 = K1 @ jnp.concatenate([R, t[:, None]], axis=1)
        X = triangulate_pair(P0, P1, uv0, uv1)
        z0 = X[:, 2]
        z1 = X @ R[2] + t[2]
        # reprojection error in both views
        r0 = apply_intrinsics(K0, X)
        cam1 = X @ R.T + t
        r1 = apply_intrinsics(K1, cam1)
        e0 = jnp.sum((r0 - uv0) ** 2, axis=-1)
        e1 = jnp.sum((r1 - uv1) ** 2, axis=-1)
        m2 = max_reproj_err * max_reproj_err
        good = (z0 > 1e-6) & (z1 > 1e-6) & (e0 < m2) & (e1 < m2) & valid
        return jnp.sum(good), X, good

    ns, Xs, goods = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(ns)
    return (Rs[best], ts[best], Xs[best], goods[best], ns[best])


def recover_pose_from_essential(E, K0, K1, uv0, uv1, valid,
                                max_reproj_err: float = 7.0):
    """RtFromEssentialMatrix equivalent: decompose + cheirality vote.
    Returns (rvec, tvec, X, good_mask, n_good)."""
    Rs, ts = decompose_essential(E)
    R, t, X, good, n = cheirality_vote(Rs, ts, K0, K1, uv0, uv1, valid,
                                       max_reproj_err)
    return log_so3(R), t, X, good, n


def recover_pose_from_homography(H, K0, K1, uv0, uv1, valid,
                                 max_reproj_err: float = 7.0):
    """RtFromHomographyMatrix equivalent: Faugeras decomposition + vote.
    Returns (rvec, tvec, X, good_mask, n_good)."""
    Rs, ts = decompose_homography(H, K0, K1)
    R, t, X, good, n = cheirality_vote(Rs, ts, K0, K1, uv0, uv1, valid,
                                       max_reproj_err)
    return log_so3(R), t, X, good, n
