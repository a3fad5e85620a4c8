"""SO(3) utilities: Rodrigues exp/log maps.

Replaces cv::Rodrigues usage in the reference (CSfM.cpp:564,
CFrame.cpp:232/239/246) and ceres::AngleAxisRotatePoint (CTracker.cpp:588).
All functions are pure, fp32-safe (Taylor fallbacks near theta=0), and
batchable with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x of a 3-vector."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: angle-axis vector -> 3x3 rotation matrix.

    Uses the exact Rodrigues formula with series expansion of the
    sin(t)/t and (1-cos t)/t^2 coefficients near zero so the function is
    smooth and auto-differentiable at the identity.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    # coefficients a = sin(t)/t, b = (1 - cos t)/t^2
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = hat(rvec)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a * K + b * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: rotation matrix -> angle-axis vector.

    Stable for angles in [0, pi); the pi-singular case resolves the axis
    from the diagonal of (R + I)/2.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # antisymmetric part gives axis*sin(theta)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)[..., None]
    # generic: w / (2 sin t) * theta; near 0: w/2 (since sin t ~ t)
    generic = w * (theta[..., None] / (2.0 * sin_t + _EPS))
    near_zero = w * 0.5
    rvec = jnp.where(theta[..., None] < 1e-4, near_zero, generic)
    # near pi: axis^2 = diag((R+I)/2); signs from off-diagonals
    def near_pi_axis(R, theta):
        d = jnp.clip(jnp.stack(
            [R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) * 0.5 + 0.5,
            0.0, 1.0)
        axis = jnp.sqrt(d)
        # fix signs using the largest component as positive anchor
        imax = jnp.argmax(axis, axis=-1)
        off = jnp.stack(
            [
                R[..., 1, 0] + R[..., 0, 1],  # relates sign(x*y)
                R[..., 2, 0] + R[..., 0, 2],  # sign(x*z)
                R[..., 2, 1] + R[..., 1, 2],  # sign(y*z)
            ],
            axis=-1,
        )
        sx = jnp.where(imax == 0, 1.0, jnp.where(imax == 1, jnp.sign(off[..., 0] + _EPS), jnp.sign(off[..., 1] + _EPS)))
        sy = jnp.where(imax == 1, 1.0, jnp.where(imax == 0, jnp.sign(off[..., 0] + _EPS), jnp.sign(off[..., 2] + _EPS)))
        sz = jnp.where(imax == 2, 1.0, jnp.where(imax == 0, jnp.sign(off[..., 1] + _EPS), jnp.sign(off[..., 2] + _EPS)))
        axis = axis * jnp.stack([sx, sy, sz], axis=-1)
        axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + _EPS)
        return axis * theta[..., None]

    rvec = jnp.where(theta[..., None] > 3.1066, near_pi_axis(R, theta), rvec)
    return rvec


def rotate_points(rvec: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points [..., N, 3] by angle-axis rvec [..., 3].

    Direct Rodrigues point rotation (the AngleAxisRotatePoint analogue):
    p' = p cos t + (w x p) sin t + w (w . p)(1 - cos t).
    """
    R = exp_so3(rvec)
    return pts @ jnp.swapaxes(R, -1, -2)
