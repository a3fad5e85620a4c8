"""Masked, fp32-stable DLT estimators for H and F.

Replaces cv::findHomography(method 0) / the model-fitting half of
cv::findFundamentalMat (CSfM.cpp:842-843).  RANSAC wrapping lives in
sfm_tpu/ransac.py; these are the deterministic least-squares solvers, each
taking a weight/valid mask so they work both on full match sets (the
reference computes H over ALL matches, no RANSAC — CSfM.cpp:838-841) and on
minimal hypothesis samples.

All solvers Hartley-normalize coordinates first — mandatory for fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from .smallinv import inv3x3


def _normalize_points(uv: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization: translate centroid to origin, scale mean
    distance to sqrt(2).  Weighted by mask w [N]. Returns (uv_n, T 3x3)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mean = jnp.sum(uv * w[:, None], axis=0) / wsum
    centered = uv - mean
    dist = jnp.sqrt(jnp.sum(centered ** 2, axis=-1) + 1e-12)
    mean_dist = jnp.sum(dist * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_dist, 1e-6)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                  uv.dtype)
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return centered * s, T


def _smallest_eigvec(AtA: jnp.ndarray) -> jnp.ndarray:
    w, V = jnp.linalg.eigh(AtA)
    return V[:, 0]


def estimate_homography(uv0: jnp.ndarray, uv1: jnp.ndarray,
                        w: jnp.ndarray) -> jnp.ndarray:
    """Weighted DLT homography x1 ~ H x0.  uv* [N,2], w [N] in {0,1} or
    soft weights.  Returns 3x3 H (H[2,2] normalized to 1 when possible)."""
    wf = w.astype(uv0.dtype)
    p0, T0 = _normalize_points(uv0, wf)
    p1, T1 = _normalize_points(uv1, wf)
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # rows: [-x,-y,-1, 0,0,0, u x, u y, u] and [0,0,0, -x,-y,-1, v x, v y, v]
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1 * wf[:, None], r2 * wf[:, None]], axis=0)
    h = _smallest_eigvec(A.T @ A)
    Hn = h.reshape(3, 3)
    H = inv3x3(T1) @ Hn @ T0
    scale = jnp.where(jnp.abs(H[2, 2]) > 1e-8, H[2, 2], 1.0)
    return H / scale


def estimate_fundamental(uv0: jnp.ndarray, uv1: jnp.ndarray,
                         w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized 8-point algorithm, rank-2 enforced.
    x1^T F x0 = 0."""
    wf = w.astype(uv0.dtype)
    p0, T0 = _normalize_points(uv0, wf)
    p1, T1 = _normalize_points(uv1, wf)
    x, y = p0[:, 0], p0[:, 1]
    u, v = p1[:, 0], p1[:, 1]
    one = jnp.ones_like(x)
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y, one], axis=-1)
    A = A * wf[:, None]
    f = _smallest_eigvec(A.T @ A)
    Fn = f.reshape(3, 3)
    # enforce rank 2
    U, S, Vt = jnp.linalg.svd(Fn)
    S = S.at[2].set(0.0)
    Fn = (U * S[None, :]) @ Vt
    F = T1.T @ Fn @ T0
    nrm = jnp.linalg.norm(F) + 1e-12
    return F / nrm
