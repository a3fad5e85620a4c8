"""Oriented 512-bit binary descriptor.

TPU-native replacement for brisk::BriskDescriptorExtractor (rotation- and
scale-invariant, 512-bit; CTracker.cpp:44-45).  Design: BRIEF-style
intensity comparisons on a fixed, seeded sampling pattern (Gaussian
distributed, as in BRIEF/ORB), steered by the intensity-centroid orientation
and sampled on the keypoint's pyramid level (scale invariance).  All
sampling is batched bilinear gathers vmapped over keypoints; bits are packed
into uint32 words for the popcount-matmul matcher.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .detect import Keypoints

PATCH_RADIUS = 16.0     # sampling pattern support, pixels (at the kp's level)
_ORIENT_RADIUS = 7      # intensity-centroid disc radius


def _make_pattern(bits: int, seed: int = 17) -> np.ndarray:
    """[bits, 2, 2] sampling-pair offsets (x, y), clipped Gaussian (BRIEF-G2)."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_RADIUS / 2.5
    pts = rng.normal(0.0, sigma, size=(bits, 2, 2))
    return np.clip(pts, -PATCH_RADIUS + 1, PATCH_RADIUS - 1).astype(np.float32)


_PATTERN = {}


def get_pattern(bits: int) -> np.ndarray:
    """Cached as numpy (never jnp: a device array created during tracing
    would leak a tracer into this module-level cache)."""
    if bits not in _PATTERN:
        _PATTERN[bits] = _make_pattern(bits)
    return _PATTERN[bits]


# offsets of the orientation disc, precomputed host-side
def _disc_offsets(radius: int) -> np.ndarray:
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    m = ys ** 2 + xs ** 2 <= radius ** 2
    return np.stack([xs[m], ys[m]], axis=-1).astype(np.float32)


_DISC = jnp.asarray(_disc_offsets(_ORIENT_RADIUS))


def bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W] at xy [..., 2] (x, y); clamped to edges."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def smooth(img: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """k x k box blur (the pre-descriptor smoothing BRIEF requires)."""
    w = jnp.ones((k, k), img.dtype) / (k * k)
    return jax.lax.conv_general_dilated(
        img[None, None], w[None, None], (1, 1), "SAME")[0, 0]


def orientation(pyr_smooth: jnp.ndarray, level_xy: jnp.ndarray,
                level: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per keypoint: atan2(m01, m10) over a disc."""
    def one(xy, lvl):
        img = pyr_smooth[lvl]
        pts = xy[None, :] + _DISC
        vals = bilinear(img, pts)
        m10 = jnp.sum(vals * _DISC[:, 0])
        m01 = jnp.sum(vals * _DISC[:, 1])
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(level_xy, level)


def describe(pyr: jnp.ndarray, kps: Keypoints, desc_bits: int = 512
             ) -> jnp.ndarray:
    """Compute packed descriptors [N, desc_bits//32] uint32 for keypoints.

    pyr: [L, H, W] pyramid (raw; smoothing applied here).
    Keypoint xy are full-resolution coords; sampling happens at the
    keypoint's own level for scale invariance."""
    L = pyr.shape[0]
    pyr_s = jax.vmap(smooth)(pyr)
    pattern = get_pattern(desc_bits)            # [B, 2, 2] (x, y) offsets

    scale = jnp.exp2(kps.level.astype(jnp.float32))
    level_xy = (kps.xy - 0.5 * (scale[:, None] - 1.0)) / scale[:, None]

    theta = orientation(pyr_s, level_xy, kps.level)
    c, s = jnp.cos(theta), jnp.sin(theta)

    def one(xy, lvl, ci, si):
        img = pyr_s[lvl]
        rot = jnp.stack([jnp.stack([ci, -si]), jnp.stack([si, ci])])
        pts = pattern @ rot.T + xy[None, None, :]     # [B, 2, 2]
        va = bilinear(img, pts[:, 0, :])
        vb = bilinear(img, pts[:, 1, :])
        return va > vb

    bits = jax.vmap(one)(level_xy, kps.level, c, s)   # [N, B] bool
    from .bits import pack_bits
    return pack_bits(bits)
