"""Oriented 512-bit binary descriptor, MXU-formulated.

TPU-native replacement for brisk::BriskDescriptorExtractor (rotation- and
scale-invariant, 512-bit; CTracker.cpp:44-45).  Semantics: BRIEF-style
intensity comparisons on a fixed seeded sampling pattern, steered by the
intensity-centroid orientation, sampled at the keypoint's pyramid level.

Formulation: gathers are poison on TPU, so sampling is restructured as
matrix multiplies —
 1. one contiguous dynamic-slice patch per keypoint (from the smoothed
    pyramid level), then a 4-tap lerp centers the patch on the subpixel
    keypoint position;
 2. orientation = intensity centroid of the patch via two dense moment
    masks (a matvec, no gathers);
 3. the continuous rotation is quantized to N_BINS steered copies of the
    sampling pattern; each bin's (pair_a - pair_b) bilinear weights form a
    precomputed [bits, patch_pixels] matrix, and descriptor bits are the
    sign of per-bin masked matmuls  patch_flat @ W_bin^T  on the MXU.
The 11.25-degree quantization costs ~2-3 bits of descriptor noise, far
below the cross-frame sampling noise, and turns ~600k scattered loads per
frame into 32 dense matmuls."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .detect import Keypoints
from .bits import pack_bits

PATCH_RADIUS = 16            # sampling pattern support, pixels
PATCH = 2 * PATCH_RADIUS + 1  # 33: centered patch side
N_BINS = 32                  # orientation quantization bins


def _make_pattern(bits: int, seed: int = 17) -> np.ndarray:
    """[bits, 2, 2] sampling-pair offsets (x, y), clipped Gaussian (BRIEF-G2)."""
    rng = np.random.default_rng(seed)
    sigma = PATCH_RADIUS / 2.5
    pts = rng.normal(0.0, sigma, size=(bits, 2, 2))
    return np.clip(pts, -PATCH_RADIUS + 1.5, PATCH_RADIUS - 1.5).astype(
        np.float32)


def _bilinear_weight_rows(pts: np.ndarray) -> np.ndarray:
    """pts [M, 2] (x, y) offsets from patch center -> dense bilinear weight
    matrix [M, PATCH*PATCH]."""
    M = pts.shape[0]
    W = np.zeros((M, PATCH, PATCH), np.float32)
    x = pts[:, 0] + PATCH_RADIUS
    y = pts[:, 1] + PATCH_RADIUS
    x0 = np.clip(np.floor(x).astype(int), 0, PATCH - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, PATCH - 2)
    fx = x - x0
    fy = y - y0
    idx = np.arange(M)
    W[idx, y0, x0] = (1 - fy) * (1 - fx)
    W[idx, y0, x0 + 1] = (1 - fy) * fx
    W[idx, y0 + 1, x0] = fy * (1 - fx)
    W[idx, y0 + 1, x0 + 1] = fy * fx
    return W.reshape(M, PATCH * PATCH)


_CACHE = {}


def _tables(bits: int):
    """Precomputed (numpy) per-bin comparison-weight matrices and the
    orientation moment masks.  Cached as numpy so no tracer can leak."""
    if bits in _CACHE:
        return _CACHE[bits]
    pattern = _make_pattern(bits)                      # [bits, 2, 2]
    Wbins = np.zeros((N_BINS, bits, PATCH * PATCH), np.float32)
    for b in range(N_BINS):
        th = 2.0 * np.pi * b / N_BINS
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]], np.float32)
        pa = pattern[:, 0, :] @ rot.T
        pb = pattern[:, 1, :] @ rot.T
        Wbins[b] = _bilinear_weight_rows(pa) - _bilinear_weight_rows(pb)
    # orientation disc moment masks (intensity centroid, ORB-style)
    ys, xs = np.mgrid[-PATCH_RADIUS:PATCH_RADIUS + 1,
                      -PATCH_RADIUS:PATCH_RADIUS + 1]
    disc = (xs ** 2 + ys ** 2 <= 7 ** 2).astype(np.float32)
    mx = (xs * disc).reshape(-1).astype(np.float32)
    my = (ys * disc).reshape(-1).astype(np.float32)
    _CACHE[bits] = (Wbins, mx, my)
    return _CACHE[bits]


def bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img [H, W] at xy [..., 2] (x, y); clamped to edges.
    (Used by the LK flow path; the descriptor avoids per-sample gathers.)"""
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
    """k x k box blur (the pre-descriptor smoothing BRIEF requires).

    Separable shift-add formulation: lax.conv on [H,W] images lowered to a
    pathologically slow kernel on TPU (18 ms for a 5x5/[480,1200] conv);
    the same blur as 2(k-1) rolls + adds fuses into one VPU pass."""
    r = k // 2
    acc = img
    for d in range(1, r + 1):
        acc = acc + jnp.roll(img, d, 1) + jnp.roll(img, -d, 1)
    out = acc
    for d in range(1, r + 1):
        out = out + jnp.roll(acc, d, 0) + jnp.roll(acc, -d, 0)
    return out / (k * k)


def extract_patches(pyr_s: jnp.ndarray, level_xy: jnp.ndarray,
                    level: jnp.ndarray) -> jnp.ndarray:
    """Centered subpixel patches [N, PATCH, PATCH] around each keypoint on
    its own pyramid level: one dynamic slice + a 4-tap fractional lerp."""
    def one(xy, lvl):
        x0 = jnp.floor(xy[0]).astype(jnp.int32) - PATCH_RADIUS
        y0 = jnp.floor(xy[1]).astype(jnp.int32) - PATCH_RADIUS
        raw = jax.lax.dynamic_slice(pyr_s, (lvl, y0, x0),
                                    (1, PATCH + 1, PATCH + 1))[0]
        fx = xy[0] - jnp.floor(xy[0])
        fy = xy[1] - jnp.floor(xy[1])
        top = (1 - fx) * raw[:-1, :-1] + fx * raw[:-1, 1:]
        bot = (1 - fx) * raw[1:, :-1] + fx * raw[1:, 1:]
        return (1 - fy) * top + fy * bot

    return jax.vmap(one)(level_xy, level)


def orientation_from_patches(patches: jnp.ndarray, bits: int = 512
                             ) -> jnp.ndarray:
    """Intensity-centroid angle per patch: atan2(m01, m10)."""
    _, mx, my = _tables(bits)
    flat = patches.reshape(patches.shape[0], -1)
    m10 = flat @ jnp.asarray(mx)
    m01 = flat @ jnp.asarray(my)
    return jnp.arctan2(m01, m10)


def orientation(pyr_s: jnp.ndarray, level_xy: jnp.ndarray,
                level: jnp.ndarray) -> jnp.ndarray:
    """Back-compat API: orientation straight from the pyramid."""
    patches = extract_patches(pyr_s, level_xy, level)
    return orientation_from_patches(patches)


def _bits_from_patches(patches: jnp.ndarray, desc_bits: int,
                       compute_dtype=None) -> jnp.ndarray:
    """Orientation-steered comparison bits from centered patches [N,P,P].

    compute_dtype=bfloat16 halves the HBM/MXU cost of the 32 bin matmuls;
    descriptor bits are signs of weighted intensity differences, so bf16
    rounding only flips near-zero comparisons (noise far below the
    cross-frame sampling noise)."""
    theta = orientation_from_patches(patches, desc_bits)
    bin_idx = jnp.round(theta / (2.0 * jnp.pi / N_BINS)).astype(jnp.int32) \
        % N_BINS
    Wbins_np, _, _ = _tables(desc_bits)
    flat = patches.reshape(patches.shape[0], -1)       # [N, PATCH^2]
    Wbins = jnp.asarray(Wbins_np)                      # [B, bits, PATCH^2]
    if compute_dtype is not None:
        flat = flat.astype(compute_dtype)
        Wbins = Wbins.astype(compute_dtype)
    acc = jnp.zeros((flat.shape[0], desc_bits), jnp.float32)
    for b in range(N_BINS):
        sel = (bin_idx == b).astype(flat.dtype)[:, None]
        acc = acc + jax.lax.dot_general(
            flat * sel, Wbins[b],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return pack_bits(acc > 0)


def describe(pyr: jnp.ndarray, kps: Keypoints, desc_bits: int = 512
             ) -> jnp.ndarray:
    """Packed descriptors [N, desc_bits//32] uint32 for a keypoint set
    (stacked-pyramid path, used by the flow pipeline and tests)."""
    pyr_s = jax.vmap(smooth)(pyr)
    scale = jnp.exp2(kps.level.astype(jnp.float32))
    level_xy = (kps.xy - 0.5 * (scale[:, None] - 1.0)) / scale[:, None]
    patches = extract_patches(pyr_s, level_xy, kps.level)
    return _bits_from_patches(patches, desc_bits)


def _patches_matmul(canvas_s: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray
                    ) -> jnp.ndarray:
    """Subpixel-centered patches [N, PATCH, PATCH] via two bilinear
    selection matmuls (columns, then rows).

    A vmapped per-keypoint dynamic_slice lowers to a SERIAL loop of tiny
    [1, 34, 34] slices on TPU (53+ ms per fleet tracking chunk,
    benchmarks/bench_fleet_trace.py); instead the patch window + fractional
    lerp become TWO-nonzero selection operands feeding the MXU:
        Z[n, c, h]       = sum_w canvas[h, w] * Cw[n, c, w]   (x-select+lerp)
        patch[n, r, c]   = sum_h Rw[n, r, h] * Z[n, c, h]     (y-select+lerp)
    The iota-compare operands fuse into the matmuls (same trick as the BA
    one-hot coupling ops, ba/large._onehot_f32); columns first because the
    canvas is wider than tall, minimizing the [N, PATCH, Hc] intermediate."""
    Hc, Wc = canvas_s.shape
    dt = canvas_s.dtype
    N = cx.shape[0]
    x0 = jnp.floor(cx).astype(jnp.int32) - PATCH_RADIUS
    y0 = jnp.floor(cy).astype(jnp.int32) - PATCH_RADIUS
    fx = (cx - jnp.floor(cx)).astype(dt)
    fy = (cy - jnp.floor(cy)).astype(dt)
    rr = jnp.arange(PATCH, dtype=jnp.int32)
    ww = jnp.arange(Wc, dtype=jnp.int32)
    hh = jnp.arange(Hc, dtype=jnp.int32)

    xb = x0[:, None] + rr[None, :]                       # [N, PATCH]
    Cw = ((ww[None, None, :] == xb[:, :, None]).astype(dt)
          * (1.0 - fx)[:, None, None]
          + (ww[None, None, :] == xb[:, :, None] + 1).astype(dt)
          * fx[:, None, None])                           # [N, PATCH, Wc]
    Z = jax.lax.dot_general(
        Cw.reshape(N * PATCH, Wc), canvas_s,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(N, PATCH, Hc)

    yb = y0[:, None] + rr[None, :]                       # [N, PATCH]
    Rw = ((hh[None, None, :] == yb[:, :, None]).astype(dt)
          * (1.0 - fy)[:, None, None]
          + (hh[None, None, :] == yb[:, :, None] + 1).astype(dt)
          * fy[:, None, None])                           # [N, PATCH, Hc]
    patches = jax.lax.dot_general(
        Rw, Z.astype(dt),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [N, r, c]
    return patches


def describe_canvas(canvas: jnp.ndarray, kps: Keypoints, levels: int,
                    image_width: int, desc_bits: int = 512,
                    compute_dtype=None) -> jnp.ndarray:
    """Packed descriptors from the side-by-side pyramid canvas (see
    detect.canvas_layout): ONE smoothing pass over the canvas, then
    bilinear-selection matmuls extract every keypoint's subpixel patch.
    The detection border guarantees patches never cross a level band."""
    from .detect import canvas_layout
    H = canvas.shape[0]
    lay = canvas_layout(H, image_width, levels)
    assert lay.width == canvas.shape[1], "canvas/layout mismatch"
    canvas_s = smooth(canvas)
    if compute_dtype is not None:
        canvas_s = canvas_s.astype(compute_dtype)
    scale = jnp.exp2(kps.level.astype(jnp.float32))
    level_xy = (kps.xy - 0.5 * (scale[:, None] - 1.0)) / scale[:, None]
    offs = jnp.asarray(np.array(lay.offsets, np.int32))
    cx = level_xy[:, 0] + offs[kps.level].astype(jnp.float32)
    cy = level_xy[:, 1]
    patches = _patches_matmul(canvas_s, cx, cy).astype(jnp.float32)
    return _bits_from_patches(patches, desc_bits, compute_dtype)
