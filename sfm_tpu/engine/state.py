"""Engine state pytree and frame construction.

``SfMState`` is the functional equivalent of CSfM's member state
(CSfM.h:82-123): instead of mutating members, every step function takes and
returns the whole pytree, which keeps the engine jit-compatible, trivially
checkpointable (it's just arrays), and race-free by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SfMConfig
from ..features.detect import detect
from ..features.descriptor import describe
from ..features.detect import build_pyramid
from ..geometry.camera import undistort_pixels
from ..mapstore import (Frame, KeyframeStore, LandmarkStore, empty_frame,
                        empty_keyframes, empty_landmarks)

# engine status values (CSfM.h:43-45)
NOT_INITIALIZED = 0
RUNNING = 1
LOST = 2


class CameraParams(NamedTuple):
    """Calibration bundle (the CSfM ctor arguments, CSfM.h:50)."""
    K: jnp.ndarray      # [3,3] raw intrinsics
    d: jnp.ndarray      # [5] distortion (k1,k2,p1,p2,k3)
    Kopt: jnp.ndarray   # [3,3] rectified pinhole model (CFrame::_Kopt)


class SfMState(NamedTuple):
    status: jnp.ndarray            # scalar int32
    prev: Frame                    # reference frame (CTracker::_prevFrame)
    kfs: KeyframeStore
    lms: LandmarkStore
    frame_count: jnp.ndarray       # frames seen
    last_kf_frame_no: jnp.ndarray  # keyframe policy lag
    last_kf_tracked: jnp.ndarray   # tracked count at last KF (ratio policy)
    lost_count: jnp.ndarray        # consecutive low-match frames
    init_fail_count: jnp.ndarray   # bootstrap anti-stall (CSfM.cpp:997-999)
    key: jnp.ndarray               # PRNG key for RANSAC sampling
    rep_desc: jnp.ndarray          # [L, W] cached landmark majority
                                   # descriptors (stale only within a
                                   # mapping pass; refreshed at its end)
    pending_map_slot: jnp.ndarray  # deferred-mapping mode: keyframe slot
                                   # awaiting a mapping pass (-1 = none)
    prev_image: jnp.ndarray        # [H, W] grey image of ``prev`` when
                                   # cfg.track_with_flow (else [1, 1] dummy);
                                   # LK tracks from it into the current frame
    guidance: "GuidanceState"      # scan-guidance EMA state (runs in the
                                   # RUNNING branch on RGB input, matching
                                   # CSfM.cpp:80-81's placement)
    ba_dropped_obs: jnp.ndarray    # scalar int32: observations dropped by
                                   # the last large-BA table build (kmax/
                                   # nmax overflow — surfaced, never silent)


class StepMetrics(NamedTuple):
    """Structured per-frame observability (SURVEY.md §5's gap: the reference
    only had an imshow overlay)."""
    status: jnp.ndarray
    n_detected: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    n_tracked: jnp.ndarray
    n_landmarks: jnp.ndarray
    n_keyframes: jnp.ndarray
    keyframe_added: jnp.ndarray
    mean_reproj_err: jnp.ndarray
    ba_dropped_obs: jnp.ndarray    # observations the last large-BA table
                                   # build dropped (0 on other solvers)
    rvec: jnp.ndarray
    tvec: jnp.ndarray
    # scan guidance (zeros when the engine runs grayscale-only)
    guid_centroid: jnp.ndarray     # [3] object centroid (world)
    guid_bbox_center: jnp.ndarray  # [2] oriented-bbox center (full-res px)
    guid_bbox_axes: jnp.ndarray    # [2, 2] principal axes (rows)
    guid_bbox_extent: jnp.ndarray  # [2] half-extents along the axes (px)


def zero_metrics() -> StepMetrics:
    z = jnp.asarray(0, jnp.int32)
    return StepMetrics(status=z, n_detected=z, n_matches=z, n_inliers=z,
                       n_tracked=z, n_landmarks=z, n_keyframes=z,
                       keyframe_added=jnp.asarray(False),
                       mean_reproj_err=jnp.asarray(0.0, jnp.float32),
                       ba_dropped_obs=z,
                       rvec=jnp.zeros(3, jnp.float32),
                       tvec=jnp.zeros(3, jnp.float32),
                       guid_centroid=jnp.zeros(3, jnp.float32),
                       guid_bbox_center=jnp.zeros(2, jnp.float32),
                       guid_bbox_axes=jnp.zeros((2, 2), jnp.float32),
                       guid_bbox_extent=jnp.zeros(2, jnp.float32))


def init_state(cfg: SfMConfig) -> SfMState:
    return SfMState(
        status=jnp.asarray(NOT_INITIALIZED, jnp.int32),
        prev=empty_frame(cfg.max_keypoints, cfg.desc_words),
        kfs=empty_keyframes(cfg.max_keyframes, cfg.max_keypoints,
                            cfg.desc_words),
        lms=empty_landmarks(cfg.max_landmarks, cfg.desc_bits),
        frame_count=jnp.asarray(0, jnp.int32),
        last_kf_frame_no=jnp.asarray(-10**6, jnp.int32),
        last_kf_tracked=jnp.asarray(0, jnp.int32),
        lost_count=jnp.asarray(0, jnp.int32),
        init_fail_count=jnp.asarray(0, jnp.int32),
        key=jax.random.PRNGKey(0),
        rep_desc=jnp.zeros((cfg.max_landmarks, cfg.desc_words), jnp.uint32),
        pending_map_slot=jnp.asarray(-1, jnp.int32),
        prev_image=jnp.zeros(cfg.image_size if cfg.track_with_flow else (1, 1),
                             jnp.float32),
        guidance=_init_guidance(cfg),
        ba_dropped_obs=jnp.asarray(0, jnp.int32),
    )


def _init_guidance(cfg: SfMConfig):
    from ..guidance import init_guidance
    return init_guidance(cfg)


def to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] RGB -> [H, W] luma (CFrame::setFrame's cvtColor,
    CFrame.cpp:145); grayscale input passes through."""
    if image.ndim == 3:
        return (0.299 * image[..., 0] + 0.587 * image[..., 1]
                + 0.114 * image[..., 2])
    return image


def make_frame(cfg: SfMConfig, cam: CameraParams, image: jnp.ndarray,
               frame_no: jnp.ndarray) -> Frame:
    """CFrame::setFrame + setKeyPoints equivalent: detect, describe, and
    undistort all points into the Kopt pinhole model (CFrame.cpp:156-227).
    ``image`` is [H, W] grey or [H, W, 3] RGB — the RGB path keeps real
    landmark colors (fixing the reference's never-filled colour output,
    CSfM.cpp:798-800) and feeds scan guidance."""
    from ..features.descriptor import describe_canvas
    compute_dtype = (jnp.bfloat16 if cfg.feature_dtype == "bfloat16"
                     else None)
    grey = to_gray(image)
    kps, canvas = detect(grey, max_keypoints=cfg.max_keypoints,
                         levels=cfg.pyramid_levels,
                         threshold=cfg.fast_threshold,
                         nms_radius=cfg.nms_radius,
                         compute_dtype=compute_dtype, return_canvas=True,
                         approx_topk=cfg.detector_approx_topk)
    desc = describe_canvas(canvas, kps, cfg.pyramid_levels,
                           cfg.image_width, cfg.desc_bits,
                           compute_dtype=compute_dtype,
                           patch_int8=cfg.patch_int8)
    xy_und = undistort_pixels(cam.K, cam.d, cam.Kopt, kps.xy)
    # landmark coloring: real RGB when available, grayscale replicated
    # otherwise
    xi = jnp.clip(kps.xy[:, 0].astype(jnp.int32), 0, cfg.image_width - 1)
    yi = jnp.clip(kps.xy[:, 1].astype(jnp.int32), 0, cfg.image_height - 1)
    if image.ndim == 3:
        color = image[yi, xi]
    else:
        color = jnp.stack([image[yi, xi]] * 3, axis=-1)
    return Frame(
        xy=xy_und,
        xy_dist=kps.xy,
        desc=desc,
        color=color,
        level=kps.level,
        score=kps.score,
        kp_valid=kps.valid,
        landmark=jnp.full((cfg.max_keypoints,), -1, jnp.int32),
        rvec=jnp.zeros(3, jnp.float32),
        tvec=jnp.zeros(3, jnp.float32),
        frame_no=frame_no,
    )
