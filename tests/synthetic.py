"""Synthetic scene generation for known-answer geometry tests.

The standard SfM testing trick (SURVEY.md §4): random poses + 3D points ->
exact projections -> every estimator must recover the ground truth.
"""

from __future__ import annotations

import numpy as np


DEFAULT_K = np.array([[500.0, 0.0, 320.0],
                      [0.0, 500.0, 240.0],
                      [0.0, 0.0, 1.0]], dtype=np.float32)


def rodrigues_np(rvec):
    theta = np.linalg.norm(rvec)
    if theta < 1e-12:
        return np.eye(3)
    k = rvec / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def project_np(K, R, t, X):
    cam = X @ R.T + t
    uv = cam[:, :2] / cam[:, 2:3]
    return uv @ K[:2, :2].T + K[:2, 2]


def random_scene(rng, n_points=200, depth_range=(4.0, 8.0),
                 spread=2.0, K=None):
    """Points in front of camera 0 (at origin); camera 1 displaced+rotated.

    Returns dict with K, X [N,3], poses (R0,t0 identity; R1,t1), and exact
    pixel projections uv0, uv1."""
    K = DEFAULT_K if K is None else K
    X = np.stack([
        rng.uniform(-spread, spread, n_points),
        rng.uniform(-spread, spread, n_points),
        rng.uniform(depth_range[0], depth_range[1], n_points),
    ], axis=1)
    rvec1 = rng.uniform(-0.1, 0.1, 3)
    R1 = rodrigues_np(rvec1)
    t1 = np.array([rng.uniform(0.3, 0.8), rng.uniform(-0.1, 0.1),
                   rng.uniform(-0.1, 0.1)])
    uv0 = project_np(K, np.eye(3), np.zeros(3), X)
    uv1 = project_np(K, R1, t1, X)
    return dict(K=K.astype(np.float32), X=X.astype(np.float32),
                rvec1=rvec1.astype(np.float32), R1=R1.astype(np.float32),
                t1=t1.astype(np.float32), uv0=uv0.astype(np.float32),
                uv1=uv1.astype(np.float32))


def planar_scene(rng, n_points=200, depth=5.0, spread=2.0, K=None):
    """All points on the plane z=depth (homography-degenerate for F)."""
    K = DEFAULT_K if K is None else K
    X = np.stack([
        rng.uniform(-spread, spread, n_points),
        rng.uniform(-spread, spread, n_points),
        np.full(n_points, depth),
    ], axis=1)
    rvec1 = rng.uniform(-0.08, 0.08, 3)
    R1 = rodrigues_np(rvec1)
    t1 = np.array([0.5, 0.05, -0.05])
    uv0 = project_np(K, np.eye(3), np.zeros(3), X)
    uv1 = project_np(K, R1, t1, X)
    return dict(K=K.astype(np.float32), X=X.astype(np.float32),
                rvec1=rvec1.astype(np.float32), R1=R1.astype(np.float32),
                t1=t1.astype(np.float32), uv0=uv0.astype(np.float32),
                uv1=uv1.astype(np.float32))
