"""Scale-space FAST corner detection -> fixed-size keypoint tensor.

TPU-native replacement for the BRISK scale-space AGAST detector
(brisk::BriskFeatureDetector(60, 6, true), CTracker.cpp:43).  The reference
returns a dynamic keypoint vector; here detection is dense map algebra over
an image pyramid followed by non-max suppression and a global top-K — a
fixed-shape keypoint set with a validity mask.

Shi-Tomasi detection for the optical-flow path
(cv::goodFeaturesToTrack, CTracker.cpp:261) is ``shi_tomasi_score``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# FAST-16 Bresenham circle of radius 3, clockwise from 12 o'clock: (dy, dx)
_CIRCLE = np.array([
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
], dtype=np.int32)
_ARC = 9  # contiguous arc length for a corner (FAST-9/16)


class Keypoints(NamedTuple):
    """Fixed-capacity detected feature set (the CFrame keypoint analogue)."""
    xy: jnp.ndarray      # [N, 2] full-resolution (x, y) pixel coords
    score: jnp.ndarray   # [N] detector response
    level: jnp.ndarray   # [N] int32 pyramid level
    valid: jnp.ndarray   # [N] bool


def build_pyramid(img: jnp.ndarray, levels: int) -> jnp.ndarray:
    """Grey image [H, W] float32 -> [levels, H, W] pyramid; level l is the
    2^l-downsampled image stored in the top-left corner (zero padding keeps
    shapes static for stacked gathers)."""
    H, W = img.shape
    out = [img]
    cur = img
    for _ in range(levels - 1):
        h, w = cur.shape
        cur = 0.25 * (cur[0:h - 1:2, 0:w - 1:2] + cur[1:h:2, 0:w - 1:2]
                      + cur[0:h - 1:2, 1:w:2] + cur[1:h:2, 1:w:2])
        pad = jnp.zeros((H, W), img.dtype).at[:cur.shape[0], :cur.shape[1]].set(cur)
        out.append(pad)
    return jnp.stack(out)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Dense FAST-9/16 corner response [H, W].

    A pixel is a corner if >= 9 contiguous circle pixels are all brighter
    than center + t or all darker than center - t.  Score is the AGAST-style
    sum of thresholded absolute differences over the circle, gated by the
    corner test.  Pure shift/compare map algebra — VPU-friendly, no gathers.
    """
    shifted = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in _CIRCLE])
    diff = shifted - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def has_arc(mask):
        # run-length >= _ARC of circularly contiguous True values:
        # AND of _ARC consecutive positions, any start
        m = jnp.concatenate([mask, mask[:_ARC - 1]], axis=0)
        acc = m[:16]
        for k in range(1, _ARC):
            acc = acc & m[k:k + 16]
        return jnp.any(acc, axis=0)

    corner = has_arc(bright) | has_arc(dark)
    mag = jnp.maximum(jnp.abs(diff) - threshold, 0.0)
    score = jnp.sum(mag, axis=0)
    return jnp.where(corner, score, 0.0)


def shi_tomasi_score(img: jnp.ndarray, sigma_window: int = 3) -> jnp.ndarray:
    """Dense min-eigenvalue corner response (goodFeaturesToTrack analogue)."""
    dx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    dy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    def box(x):
        k = sigma_window
        w = jnp.ones((k, k), x.dtype) / (k * k)
        return jax.lax.conv_general_dilated(
            x[None, None], w[None, None], (1, 1), "SAME")[0, 0]
    a = box(dx * dx)
    b = box(dx * dy)
    c = box(dy * dy)
    tr = a + c
    det = a * c - b * b
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc


def nms(score: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Suppress non-maxima within a (2r+1)^2 window (ties keep all)."""
    k = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")
    return jnp.where(score >= pooled, score, 0.0)


def detect(img: jnp.ndarray, *, max_keypoints: int, levels: int = 4,
           threshold: float = 20.0, nms_radius: int = 2,
           border: int = 20) -> Keypoints:
    """Full detection pipeline: pyramid -> FAST score -> NMS -> top-K.

    Returns keypoints in full-resolution (distorted) pixel coordinates,
    sorted by descending score, with validity mask (score > 0)."""
    H, W = img.shape
    pyr = build_pyramid(img, levels)

    raw = jnp.stack([fast_score(pyr[l], threshold) for l in range(levels)])

    def level_scores(lvl):
        s = nms(raw[lvl], nms_radius)
        h = H >> lvl
        w = W >> lvl
        yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inside = ((yy >= border) & (yy < h - border) &
                  (xx >= border) & (xx < w - border))
        return jnp.where(inside, s, 0.0)

    per_level = jnp.stack(
        [level_scores(l) for l in range(levels)])           # [L, H, W]

    # per-level top-(K) then global top-K keeps the sort small
    K = max_keypoints
    flat = per_level.reshape(levels, H * W)
    vals, idxs = jax.lax.top_k(flat, K)                     # [L, K]
    lvl_ids = jax.lax.broadcasted_iota(jnp.int32, (levels, K), 0)
    vals = vals.reshape(-1)
    idxs = idxs.reshape(-1)
    lvl_ids = lvl_ids.reshape(-1)
    top_vals, sel = jax.lax.top_k(vals, K)
    sel_idx = idxs[sel]
    sel_lvl = lvl_ids[sel]
    yi = sel_idx // W
    xi = sel_idx % W
    # subpixel refinement: 1D quadratic fit on the (pre-NMS) score surface
    # along each axis; offsets clamped to +-0.5
    def subpix(l, y, x):
        s0 = raw[l, y, x]
        sl = raw[l, y, jnp.maximum(x - 1, 0)]
        sr = raw[l, y, jnp.minimum(x + 1, W - 1)]
        su = raw[l, jnp.maximum(y - 1, 0), x]
        sd = raw[l, jnp.minimum(y + 1, H - 1), x]
        # quadratic vertex (sl - sr) / (2 (sl + sr - 2 s0)); the curvature
        # is <= 0 at a maximum, so guard on its magnitude
        cx = sl + sr - 2 * s0
        cy = su + sd - 2 * s0
        dx = jnp.where(jnp.abs(cx) > 1e-6, (sl - sr) / (2 * cx), 0.0)
        dy = jnp.where(jnp.abs(cy) > 1e-6, (su - sd) / (2 * cy), 0.0)
        return (jnp.clip(dx, -0.5, 0.5), jnp.clip(dy, -0.5, 0.5))
    dx, dy = jax.vmap(subpix)(sel_lvl, yi, xi)
    y = yi.astype(jnp.float32) + dy
    x = xi.astype(jnp.float32) + dx
    scale = jnp.exp2(sel_lvl.astype(jnp.float32))
    # full-res coordinate: center of the level pixel footprint
    xy = jnp.stack([x * scale + 0.5 * (scale - 1.0),
                    y * scale + 0.5 * (scale - 1.0)], axis=-1)
    valid = top_vals > 0.0
    return Keypoints(xy=xy, score=top_vals, level=sel_lvl,
                     valid=valid)
