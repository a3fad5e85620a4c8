"""Frame and map query helpers — the named query surface of CFrame
(matched/unmatched point extraction in index/coordinate combinations,
gather-at-indices, nearest-point scan; CFrame.cpp:288-459) and CMap
(points-in-frame / union-over-frames; CMap.cpp:145-287).

In the fixed-shape world these are masks and gathers rather than dynamic
vectors: every "extraction" returns the full-capacity array plus the
selection mask (callers keep shapes static), and unions are masked
reductions over the keyframe link matrix."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .mapstore import Frame, KeyframeStore, LandmarkStore


# ---- CFrame queries (CFrame.cpp:288-459) ----

def matched_mask(frame: Frame) -> jnp.ndarray:
    """Keypoints linked to a landmark (getMatchedPoints family)."""
    return frame.kp_valid & (frame.landmark >= 0)


def unmatched_mask(frame: Frame) -> jnp.ndarray:
    """Detected but unlinked keypoints (getUnmatchedPoints family)."""
    return frame.kp_valid & (frame.landmark < 0)


def matched_points(frame: Frame) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """(xy, landmark_ids, mask) of matched keypoints."""
    m = matched_mask(frame)
    return frame.xy, jnp.where(m, frame.landmark, -1), m


def unmatched_points(frame: Frame) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(xy, mask) of unmatched keypoints."""
    m = unmatched_mask(frame)
    return frame.xy, m


def points_at(frame: Frame, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather undistorted points at indices (getPointsAt)."""
    return frame.xy[jnp.clip(idx, 0, frame.xy.shape[0] - 1)]


def descriptors_at(frame: Frame, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather descriptors at indices (getDescriptorsAt)."""
    return frame.desc[jnp.clip(idx, 0, frame.desc.shape[0] - 1)]


def nearest_point_index(frame: Frame, xy: jnp.ndarray,
                        max_dist: float = 1.0,
                        distorted: bool = True) -> jnp.ndarray:
    """Nearest detected keypoint to a query position within max_dist, or -1
    (findClosestPointIndex[Distorted], CFrame.cpp:422-450)."""
    pts = frame.xy_dist if distorted else frame.xy
    d2 = jnp.sum((pts - xy[None, :]) ** 2, axis=-1)
    d2 = jnp.where(frame.kp_valid, d2, jnp.inf)
    i = jnp.argmin(d2)
    return jnp.where(d2[i] <= max_dist * max_dist, i, -1).astype(jnp.int32)


# ---- CMap queries (CMap.cpp:145-305) ----

def landmarks_in_keyframe(kfs: KeyframeStore, slot,
                          n_landmarks: int) -> jnp.ndarray:
    """[L] bool: which landmarks this keyframe observes
    (getPointsInFrame via the frame->points multimap)."""
    links = kfs.frames.landmark[slot]
    ok = (links >= 0) & kfs.frames.kp_valid[slot] & kfs.valid[slot]
    out = jnp.zeros((n_landmarks,), bool)
    return out.at[jnp.where(ok, links, n_landmarks)].set(True, mode="drop")


def landmarks_in_keyframes(kfs: KeyframeStore,
                           n_landmarks: int) -> jnp.ndarray:
    """[L] bool union over all valid keyframes with dedup
    (getPointsInFrames, CMap.cpp:270-287 — the id-only overload the
    reference actually calls)."""
    links = kfs.frames.landmark
    ok = (links >= 0) & kfs.frames.kp_valid & kfs.valid[:, None]
    out = jnp.zeros((n_landmarks,), bool)
    return out.at[jnp.where(ok, links, n_landmarks).reshape(-1)].set(
        True, mode="drop")


def live_landmarks(lms: LandmarkStore) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(xyz, valid) of all live landmarks (CMap::getPoints)."""
    return lms.xyz, lms.valid
