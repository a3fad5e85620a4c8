"""Levenberg-Marquardt bundle adjustment with Schur-complement elimination.

Replaces ceres::Solve(DENSE_SCHUR) (CTracker.cpp:670-702): build normal
equations in block form from the COO observation list, eliminate the
landmark blocks (3x3 closed-form inverses), solve the reduced camera system
densely (6C x 6C — C is the keyframe count, small), back-substitute, and
iterate with Levenberg damping and accept/reject steps.

Modes mirror CTracker::BA_TYPE (CTracker.h:67): STRUCT_AND_POSE,
POSE_ONLY (landmarks frozen), STRUCT_ONLY (poses frozen).

Assembly is scatter-add over observations; the cam-landmark coupling W is
materialized as [C, L, 6, 3] which is exact and fast for the single-scan
operating point (C<=64, L<=16k -> 75 MB HBM).  The distributed/Pallas path
for pod-scale problems lives in sfm_tpu/parallel/dist_ba.py, which shards
the landmark axis and psums the reduced camera system.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.rotations import exp_so3
from .residuals import (Observations, residuals_and_jacobians, huber_weights,
                        apply_pose_update)


class BAMode(enum.IntEnum):
    STRUCT_AND_POSE = 0
    POSE_ONLY = 1
    STRUCT_ONLY = 2


class BAStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    lam: jnp.ndarray
    accepted: jnp.ndarray   # number of accepted LM steps


def _assemble(K, rvec, tvec, xyz, obs: Observations, cam_free, lm_free,
              huber_delta: float, mode: "BAMode" = None):
    """Normal-equation blocks U [C,6,6], V [L,3,3], W [C,L,6,3],
    g_cam [C,6], g_lm [L,3] AND the (robustified) cost at the current
    linearization point — one residual evaluation serves both.  The
    (large) W coupling is only materialized when the mode needs it."""
    C = rvec.shape[0]
    L = xyz.shape[0]
    R = exp_so3(rvec)
    r, A, B = residuals_and_jacobians(K, R, tvec, xyz, obs)
    w = obs.w * huber_weights(r, huber_delta)
    # freeze cameras/landmarks by zeroing their Jacobian blocks
    A = A * (w * cam_free[obs.cam_idx])[:, None, None]
    B = B * (w * lm_free[obs.lm_idx])[:, None, None]
    rw = r * w[:, None]

    AtA = jnp.einsum("oia,oib->oab", A, A)          # [O,6,6]
    BtB = jnp.einsum("oia,oib->oab", B, B)          # [O,3,3]
    AtB = jnp.einsum("oia,oib->oab", A, B)          # [O,6,3]
    Atr = jnp.einsum("oia,oi->oa", A, rw)           # [O,6]
    Btr = jnp.einsum("oia,oi->oa", B, rw)           # [O,3]

    U = jnp.zeros((C, 6, 6)).at[obs.cam_idx].add(AtA)
    V = jnp.zeros((L, 3, 3)).at[obs.lm_idx].add(BtB)
    if mode == BAMode.STRUCT_AND_POSE or mode is None:
        W = jnp.zeros((C, L, 6, 3)).at[obs.cam_idx, obs.lm_idx].add(AtB)
    else:
        W = jnp.zeros((1, 1, 6, 3))  # unused placeholder for other modes
    g_cam = jnp.zeros((C, 6)).at[obs.cam_idx].add(-Atr)
    g_lm = jnp.zeros((L, 3)).at[obs.lm_idx].add(-Btr)

    sq = jnp.sum(r * r, axis=-1)
    if huber_delta > 0:
        d = huber_delta
        nrm = jnp.sqrt(sq + 1e-12)
        rho = jnp.where(nrm <= d, sq, 2 * d * nrm - d * d)
        cost = jnp.sum(rho * obs.w)
    else:
        cost = jnp.sum(sq * obs.w)
    return (U, V, W, g_cam, g_lm), cost


def _damp(M, lam):
    """Levenberg damping: multiply block diagonals by (1 + lam) and add an
    absolute floor so empty blocks stay invertible."""
    d = M.shape[-1]
    eye = jnp.eye(d, dtype=M.dtype)
    diag = M * eye
    return M + lam * diag + 1e-6 * eye


def inv3_sym(M):
    """Closed-form inverse of symmetric 3x3 blocks [..., 3, 3] — an order
    of magnitude faster than batched LU on TPU for the landmark blocks."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    e, f = M[..., 1, 1], M[..., 1, 2]
    i = M[..., 2, 2]
    A_ = e * i - f * f
    B_ = c * f - b * i
    C_ = b * f - c * e
    E_ = a * i - c * c
    F_ = b * c - a * f
    I_ = a * e - b * b
    det = a * A_ + b * B_ + c * C_
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([A_, B_, C_], -1),
        jnp.stack([B_, E_, F_], -1),
        jnp.stack([C_, F_, I_], -1),
    ], -2)
    return inv / det[..., None, None]


def _solve_step(U, V, W, g_cam, g_lm, lam, mode: BAMode):
    """One damped Gauss-Newton step via Schur elimination of the landmarks.
    Returns (d_cam [C,6], d_lm [L,3])."""
    C = U.shape[0]
    L = V.shape[0]
    Ud = _damp(U, lam)
    Vd = _damp(V, lam)

    if mode == BAMode.STRUCT_ONLY:
        d_lm = jnp.einsum("lab,lb->la", inv3_sym(Vd), g_lm)
        return jnp.zeros((C, 6), U.dtype), d_lm

    if mode == BAMode.POSE_ONLY:
        S = _dense_cam_system(Ud)
        d = jnp.linalg.solve(S, g_cam.reshape(-1))
        return d.reshape(C, 6), jnp.zeros((L, 3), V.dtype)

    Vinv = inv3_sym(Vd)                               # [L,3,3]
    Y = jnp.einsum("clab,lbd->clad", W, Vinv)         # [C,L,6,3]
    S_blocks = jnp.einsum("clad,mled->cmae", Y, W)    # [C,C,6,6]
    S = _dense_cam_system(Ud) - S_blocks.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    rhs = g_cam - jnp.einsum("clad,ld->ca", Y, g_lm)
    d_cam = jnp.linalg.solve(S, rhs.reshape(-1)).reshape(C, 6)
    # back-substitution: V d_lm = g_lm - W^T d_cam
    Wt_dc = jnp.einsum("clad,ca->ld", W, d_cam)
    d_lm = jnp.einsum("lab,lb->la", Vinv, g_lm - Wt_dc)
    return d_cam, d_lm


def _dense_cam_system(U):
    """Block-diagonal U as a dense [6C, 6C] matrix."""
    C = U.shape[0]
    S = jnp.zeros((C, C, 6, 6), U.dtype)
    S = S.at[jnp.arange(C), jnp.arange(C)].set(U)
    return S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)


def run_ba(K, rvec, tvec, xyz, obs: Observations, *,
           cam_free, lm_free, mode: BAMode = BAMode.STRUCT_AND_POSE,
           iterations: int = 20, lam0: float = 1e-3, lam_up: float = 4.0,
           lam_down: float = 2.0, huber_delta: float = 0.0,
           tol: float = 1e-4
           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, BAStats]:
    """CTracker::bundleAdjustmentStructAndPose equivalent.

    cam_free [C] / lm_free [L] bool masks freeze parameters (gauge fixing,
    padding slots).  Fixed trip count; one residual/assembly evaluation per
    iteration: a trial step is assembled at the proposed point, which yields
    both its cost (accept/reject) and — when accepted — the next
    linearization; a rejected step reuses the carried linearization with a
    larger lambda (classic LM, no wasted assembly)."""
    cam_free_f = cam_free.astype(jnp.float32)
    lm_free_f = lm_free.astype(jnp.float32)
    blocks, cost0 = _assemble(K, rvec, tvec, xyz, obs, cam_free_f,
                              lm_free_f, huber_delta, mode)

    def real_body(carry):
        rvec, tvec, xyz, blocks, lam, cost, accepted, done = carry
        U, V, W, g_cam, g_lm = blocks
        d_cam, d_lm = _solve_step(U, V, W, g_cam, g_lm, lam, mode)
        d_cam = d_cam * cam_free_f[:, None]
        d_lm = d_lm * lm_free_f[:, None]
        rv_new, tv_new = jax.vmap(apply_pose_update)(
            rvec, tvec, d_cam[:, :3], d_cam[:, 3:])
        xyz_new = xyz + d_lm
        blocks_new, new_cost = _assemble(K, rv_new, tv_new, xyz_new, obs,
                                         cam_free_f, lm_free_f, huber_delta,
                                         mode)
        ok = (new_cost < cost) & jnp.isfinite(new_cost)
        rvec = jnp.where(ok, rv_new, rvec)
        tvec = jnp.where(ok, tv_new, tvec)
        xyz = jnp.where(ok, xyz_new, xyz)
        blocks = jax.tree.map(lambda n, o: jnp.where(ok, n, o),
                              blocks_new, blocks)
        lam = jnp.where(ok, jnp.maximum(lam / lam_down, 1e-9),
                        jnp.minimum(lam * lam_up, 1e6))
        # converged: accepted step improved cost by less than tol (relative)
        done = done | (ok & (cost - new_cost < tol * jnp.maximum(cost, 1.0)))
        cost = jnp.where(ok, new_cost, cost)
        return (rvec, tvec, xyz, blocks, lam, cost,
                accepted + ok.astype(jnp.int32), done)

    def body(_, carry):
        # converged iterations skip the assembly/solve entirely (the branch
        # predicate is scalar, so XLA executes only the taken side)
        return jax.lax.cond(carry[-1], lambda c: c, real_body, carry)

    rvec, tvec, xyz, blocks, lam, cost, accepted, done = jax.lax.fori_loop(
        0, iterations, body,
        (rvec, tvec, xyz, blocks, jnp.asarray(lam0, jnp.float32), cost0,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return rvec, tvec, xyz, BAStats(cost0, cost, lam, accepted)


def observations_from_keyframes(kfs, lm_valid) -> Observations:
    """Flatten the keyframe link matrix into the COO observation list
    (the CSfM::bundleAdjustment gather, CSfM.cpp:326-340)."""
    Kn, N = kfs.frames.landmark.shape
    cam_idx = jnp.repeat(jnp.arange(Kn, dtype=jnp.int32), N)
    lm_idx = kfs.frames.landmark.reshape(-1)
    uv = kfs.frames.xy.reshape(-1, 2)
    linked = (lm_idx >= 0) & kfs.frames.kp_valid.reshape(-1)
    linked = linked & kfs.valid[:, None].repeat(N, 1).reshape(-1)
    safe = jnp.where(lm_idx >= 0, lm_idx, 0)
    linked = linked & lm_valid[safe]
    return Observations(
        cam_idx=cam_idx,
        lm_idx=jnp.where(linked, lm_idx, 0),
        uv=uv,
        w=linked.astype(jnp.float32),
    )
