"""Multi-view DLT triangulation.

Replaces GeometryUtils::triangulatePoints (called at CSfM.cpp:156, 918).
Batched over points with vmap; fp32-safe via per-point row normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rotations import exp_so3


def projection_matrix(rvec: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """[R|t] 3x4 (no intrinsics — matching CFrame.cpp:244-249's _P)."""
    R = exp_so3(rvec)
    return jnp.concatenate([R, tvec[:, None]], axis=1)


def _dlt_rows(P: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows for one view: u*P3 - P1, v*P3 - P2.  P is K-premultiplied
    or uv is in normalized coords — caller's choice, must be consistent."""
    r1 = uv[0] * P[2] - P[0]
    r2 = uv[1] * P[2] - P[1]
    return jnp.stack([r1, r2])


def triangulate_pair(P0: jnp.ndarray, P1: jnp.ndarray,
                     uv0: jnp.ndarray, uv1: jnp.ndarray) -> jnp.ndarray:
    """Two-view DLT for batches of correspondences.

    P0, P1: 3x4 projection matrices (K @ [R|t]).
    uv0, uv1: [N,2] pixel coords.  Returns [N,3] world points.

    Solves the 4x4 homogeneous system via the eigenvector of A^T A with the
    smallest eigenvalue (equivalent to the SVD null vector, but A^T A is 4x4
    symmetric -> cheap and batchable).
    """
    def one(uv0_i, uv1_i):
        A = jnp.concatenate([_dlt_rows(P0, uv0_i), _dlt_rows(P1, uv1_i)])
        # row-normalize for fp32 conditioning
        A = A / (jnp.linalg.norm(A, axis=1, keepdims=True) + 1e-12)
        AtA = A.T @ A
        w, V = jnp.linalg.eigh(AtA)
        X = V[:, 0]  # smallest eigenvalue
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12,
                                 jnp.sign(X[3]) * 1e-12 + 1e-12, X[3])

    return jax.vmap(one)(uv0, uv1)


def triangulate_nviews(Ps: jnp.ndarray, uvs: jnp.ndarray,
                       mask: jnp.ndarray) -> jnp.ndarray:
    """N-view DLT for one point: Ps [V,3,4], uvs [V,2], mask [V] bool.

    Masked views contribute zero rows.  Returns [3]."""
    rows = jax.vmap(_dlt_rows)(Ps, uvs)            # [V,2,4]
    rows = rows / (jnp.linalg.norm(rows, axis=-1, keepdims=True) + 1e-12)
    rows = rows * mask[:, None, None]
    A = rows.reshape(-1, 4)
    AtA = A.T @ A
    w, V = jnp.linalg.eigh(AtA)
    X = V[:, 0]
    return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12,
                             jnp.sign(X[3]) * 1e-12 + 1e-12, X[3])
