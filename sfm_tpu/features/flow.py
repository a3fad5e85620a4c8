"""Pyramidal Lucas-Kanade optical flow.

Replaces cv::calcOpticalFlowPyrLK (21x21 window, 3 levels) and the
flow-based tracking path CTracker::computeOpticalFlow /
detectFeaturesOpticalFlow (CTracker.cpp:480-562, 252-272): track points
coarse-to-fine, then associate each flow endpoint with the nearest detected
feature in the target frame within a 1 px gate (_maxOrgFeatDist,
CTracker.cpp:33) with best-match dedup.

Formulation: per-point 21x21 patches are one dynamic slice per level; the
spatial-gradient structure matrix and the temporal error are dense patch
reductions; the LK iteration is a fixed-trip fori_loop.  Everything vmaps
over points."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .detect import build_pyramid

WIN = 21                     # LK window (cv default)
_R = WIN // 2


class FlowResult(NamedTuple):
    xy: jnp.ndarray        # [N, 2] tracked positions in the target frame
    valid: jnp.ndarray     # [N] bool convergence status
    err: jnp.ndarray       # [N] mean absolute residual


def _grad(img):
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    return gx, gy


def _patch(img, cx, cy):
    """[WIN+1, WIN+1] patch with integer corner; cx, cy floats at center.
    Returns (raw patch incl +1 margin, fx, fy) for bilinear shifting."""
    x0 = jnp.floor(cx).astype(jnp.int32) - _R
    y0 = jnp.floor(cy).astype(jnp.int32) - _R
    raw = jax.lax.dynamic_slice(img, (y0, x0), (WIN + 1, WIN + 1))
    return raw, cx - jnp.floor(cx), cy - jnp.floor(cy)


def _shift(raw, fx, fy):
    top = (1 - fx) * raw[:-1, :-1] + fx * raw[:-1, 1:]
    bot = (1 - fx) * raw[1:, :-1] + fx * raw[1:, 1:]
    return (1 - fy) * top + fy * bot


def lk_flow(img0: jnp.ndarray, img1: jnp.ndarray, pts: jnp.ndarray,
            valid: jnp.ndarray, *, levels: int = 3, iters: int = 10
            ) -> FlowResult:
    """Track pts [N,2] from img0 into img1 (both [H,W] float32)."""
    pyr0 = build_pyramid(img0, levels)
    pyr1 = build_pyramid(img1, levels)
    H, W = img0.shape

    def track_one(pt, ok):
        guess = pt / (2.0 ** levels)

        def level_body(carry, lvl_rev):
            g, _ = carry
            lvl = levels - 1 - lvl_rev
            scale = 2.0 ** lvl
            p_l = pt / scale
            g = g * 2.0

            i0 = pyr0[lvl]
            i1 = pyr1[lvl]
            raw0, fx0, fy0 = _patch(i0, p_l[0], p_l[1])
            T = _shift(raw0, fx0, fy0)                 # template
            # gradients from the template patch
            gx = 0.5 * (jnp.roll(T, -1, 1) - jnp.roll(T, 1, 1))
            gy = 0.5 * (jnp.roll(T, -1, 0) - jnp.roll(T, 1, 0))
            a = jnp.sum(gx * gx)
            b = jnp.sum(gx * gy)
            c = jnp.sum(gy * gy)
            det = a * c - b * b
            inv_ok = det > 1e-4

            def lk_iter(_, cur):
                raw1, fx1, fy1 = _patch(i1, cur[0], cur[1])
                Iw = _shift(raw1, fx1, fy1)
                diff = Iw - T
                g1 = jnp.sum(diff * gx)
                g2 = jnp.sum(diff * gy)
                dx = (c * g1 - b * g2) / jnp.maximum(det, 1e-4)
                dy = (a * g2 - b * g1) / jnp.maximum(det, 1e-4)
                return cur - jnp.stack([dx, dy])

            g_new = jax.lax.fori_loop(0, iters, lk_iter, g)
            g = jnp.where(inv_ok, g_new, g)
            return (g, inv_ok), None

        (g, last_ok), _ = jax.lax.scan(level_body, (guess, True),
                                       jnp.arange(levels))
        # final residual at level 0
        raw0, fx0, fy0 = _patch(pyr0[0], pt[0], pt[1])
        T = _shift(raw0, fx0, fy0)
        raw1, fx1, fy1 = _patch(pyr1[0], g[0], g[1])
        Iw = _shift(raw1, fx1, fy1)
        err = jnp.mean(jnp.abs(Iw - T))
        in_img = ((g[0] >= _R + 1) & (g[0] < W - _R - 1) &
                  (g[1] >= _R + 1) & (g[1] < H - _R - 1))
        return g, ok & last_ok & in_img & (err < 30.0), err

    xy, v, err = jax.vmap(track_one)(pts, valid)
    return FlowResult(xy=xy, valid=v, err=err)


def associate_flow_to_features(flow_xy: jnp.ndarray, flow_valid: jnp.ndarray,
                               feat_xy: jnp.ndarray, feat_valid: jnp.ndarray,
                               max_dist: float = 1.0):
    """CTracker.cpp:521's findClosestPointIndexDistorted contract: for each
    flow endpoint, the nearest detected feature within max_dist, dedup by
    keeping the closest flow per feature.  Returns (idx [N] into features
    or -1, mask)."""
    d2 = jnp.sum((flow_xy[:, None, :] - feat_xy[None, :, :]) ** 2, -1)
    feasible = flow_valid[:, None] & feat_valid[None, :]
    d2 = jnp.where(feasible, d2, 1e18)
    best = jnp.argmin(d2, axis=1).astype(jnp.int32)
    bd = jnp.min(d2, axis=1)
    ok = bd <= max_dist * max_dist
    # dedup: keep the closest source per target feature
    M = feat_xy.shape[0]
    sel = jnp.where(ok, bd, 1e18)
    per_tgt = jnp.full((M,), 1e18).at[best].min(sel)
    n = flow_xy.shape[0]
    rows = jnp.arange(n)
    src = jnp.where(ok, rows, n)
    tie = jnp.full((M,), n).at[best].min(
        jnp.where(sel <= per_tgt[best], src, n))
    ok = ok & (sel <= per_tgt[best]) & (rows == tie[best])
    return jnp.where(ok, best, -1), ok
