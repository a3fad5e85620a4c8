"""Fused Pallas linearization for large BA (ba/large.py, run_large_ba).

After the windowed Schur-apply kernel (schur_pallas.py) cut the CG loop to
~7 ms/LM-iter, linearization became the dominant cost (~22-29 of
36.5 ms/LM-iter at 1k KFs / 100k landmarks / 600k obs): the XLA path runs
the residual/Jacobian math TWICE (once per table layout), materializes the
[L, kmax, 6, 3] W blocks in HBM, then re-reads and transposes them into
the Pallas tile layout every LM iteration, and gathers one packed [C, 13]
camera matrix per observation slot.

This kernel produces EVERYTHING a Schur LM iteration needs in ONE pass
over the landmark-major table, with zero per-observation HBM gathers:

    per landmark tile (grid axis), per k slot:
        R|t|cam_free  <- one-hot MXU dot against the tile's camera window
                         (exact via 3-way bf16 splits)
        r, A[2,6], B[2,3]   elementwise on [tile] lanes (VPU)
        W = A^T B           written DIRECTLY in the packed wt layout the
                            Schur kernel reads -- no transpose pass
        V += B^T B, g_lm += -B^T r w          (per-landmark, in carry)
        U/g_cam/cost        scattered to the TILE's camera window via the
                            transposed one-hot dot (21 sym + 6 + 1 rows)

Camera-window data movement is TILE-BLOCKED, never dynamically lane-
sliced: the per-tile [16, window] camera operand is pre-gathered on the
XLA side (lane-block gather), and the per-tile [32, window] U/g/cost
partial is emitted as a per-tile output and combined by a lane-block
segment add outside.  The previous design sliced a [16, pad_width] input
and accumulated into a [32, pad_width] output at a dynamic lane offset
inside the kernel — Mosaic handles the *pair* of dynamic-lane-offset
accesses catastrophically: 255 ms vs 5.2 ms for identical math at the pod
shard shape (C=5120, L=131072, kmax=8, window=256; benchmarks/
bench_linearize_variants.py, VERDICT r4 item 1).  The windowed combine
also makes the kernel cost independent of the total camera count.

Outputs: wt [nT, 3, kmax*8, TL] (ready for schur_pallas.SchurOperator),
vg_t [nT, 16, TL] (V rows 0..8, g_lm rows 9..11), camacc [32, pad_width]
(U sym rows 0..20, g_cam 21..26, total cost 27).  The camera-major table
(tables.cam_lm/cam_uv/cam_w) is NOT needed at all on this path.

Replaces the Ceres linearization step of the DENSE_SCHUR solve the
reference calls per BA (/root/reference/CTracker.cpp:571-577, 670-702) at
~100x the reference's problem size.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .schur_pallas import (LANE, _onehot_dot, _round_up, pack_lm_tiles)

# U symmetric-block row order in camacc: (p, q) pairs, p <= q
_SYM6 = [(p, q) for p in range(6) for q in range(p, 6)]


class LinTables(NamedTuple):
    """Static (per-solve) packed observation tables for the fused
    linearizer.  Built once from the (plan-permuted) lm-major ObsTables."""
    base_t: jnp.ndarray   # [nT, 1] int32 camera-window base (128-aligned)
    cams_t: jnp.ndarray   # [nT, max(kmax,8), TL] int32 window-LOCAL cam idx
    uvw_t: jnp.ndarray    # [nT, kmax*8, TL] rows k*8+{0,1,2} = u, v, w
    kmax: int
    tile: int
    window: int
    pad_width: int


def build_lin_tables(lm_cam, lm_uv, lm_w, n_cams: int, *, tile: int,
                     base=None, window: int = None,
                     pad_width: int = None) -> LinTables:
    L, kmax = lm_cam.shape
    nT = _round_up(L, tile) // tile
    full = _round_up(max(n_cams, LANE), LANE)
    if base is None:
        base = jnp.zeros((nT,), jnp.int32)
        window = pad_width = full
    base = jnp.asarray(base, jnp.int32)
    tile_of = jnp.arange(L, dtype=jnp.int32) // tile
    lm_local = lm_cam - base[tile_of][:, None]
    # pad_rows=8 keeps sublane alignment for kmax < 8; for kmax > 8 the
    # packed row count is kmax itself and the kernel BlockSpec must cover
    # ALL rows (a (1, 8, TL) block would clamp k >= 8 to row 7 and read
    # the wrong camera — see tests/test_linearize_pallas.py kmax=16 case)
    cams_t = pack_lm_tiles(lm_local, tile, pad_rows=8).astype(jnp.int32)
    # uvw rows per k padded to 8 so in-kernel slices stay sublane-aligned
    uvw = jnp.zeros((L, kmax, 8), jnp.float32)
    uvw = uvw.at[:, :, 0].set(lm_uv[..., 0])
    uvw = uvw.at[:, :, 1].set(lm_uv[..., 1])
    uvw = uvw.at[:, :, 2].set(lm_w)
    uvw_t = pack_lm_tiles(uvw.reshape(L, kmax * 8), tile)
    return LinTables(base.reshape(nT, 1), cams_t, uvw_t, kmax, tile,
                     window or full, pad_width or full)


def _window_segments(lt: LinTables):
    """[nT, window//LANE] lane-block indices of each tile's camera window
    inside the [pad_width] camera axis (base and window are LANE-aligned
    by construction, SchurPlan)."""
    nblk = lt.window // LANE
    return (lt.base_t[:, 0] // LANE)[:, None] + \
        jnp.arange(nblk, dtype=jnp.int32)[None, :]


def _linearize_kernel(kmax: int, Cw: int, precision: str,
                      huber_delta: float,
                      kv_ref, cams_ref, uvw_ref, xyzf_ref,
                      campw_ref, wt_ref, vg_ref, acc_ref):
    campw = campw_ref[0]                                 # [16, Cw]
    fx, fy, skew = kv_ref[0, 0], kv_ref[0, 1], kv_ref[0, 2]
    cx, cy = kv_ref[0, 3], kv_ref[0, 4]
    x0 = xyzf_ref[0, 0, :]
    x1 = xyzf_ref[0, 1, :]
    x2 = xyzf_ref[0, 2, :]
    lfree = xyzf_ref[0, 3, :]

    def body(k, carry):
        vg, acc = carry
        # --- windowed camera gather: R | t | cam_free in one MXU dot ---
        cam_k = cams_ref[0, k, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (Cw, cam_k.shape[0]), 0)
        ekT = (col == cam_k[None, :]).astype(jnp.bfloat16)   # [Cw, TL]
        g = _onehot_dot(campw, ekT, precision, False)        # [16, TL]
        R = [g[j] for j in range(9)]                         # row-major
        t0, t1, t2 = g[9], g[10], g[11]
        cfree = g[12]

        slab = uvw_ref[0, pl.ds(k * 8, 8), :]                # [8, TL]
        u_o, v_o, w_o = slab[0], slab[1], slab[2]

        # --- residual + Jacobian (pure VPU elementwise) ---
        RX0 = R[0] * x0 + R[1] * x1 + R[2] * x2
        RX1 = R[3] * x0 + R[4] * x1 + R[5] * x2
        RX2 = R[6] * x0 + R[7] * x1 + R[8] * x2
        p0, p1, z = RX0 + t0, RX1 + t1, RX2 + t2
        z_safe = jnp.where(jnp.abs(z) < 1e-6,
                           jnp.where(z < 0, -1e-6, 1e-6), z)
        iz = 1.0 / z_safe
        r0 = fx * p0 * iz + skew * p1 * iz + cx - u_o
        r1 = fy * p1 * iz + cy - v_o

        J00 = fx * iz
        J01 = skew * iz
        J02 = -(fx * p0 + skew * p1) * iz * iz
        J11 = fy * iz
        J12 = -fy * p1 * iz * iz

        if huber_delta > 0:
            nrm = jnp.sqrt(r0 * r0 + r1 * r1)
            hw = jnp.where(nrm <= huber_delta, 1.0,
                           huber_delta / jnp.maximum(nrm, 1e-12))
            w = w_o * hw
        else:
            w = w_o
        wA = w * cfree
        wB = w * lfree

        # A = [duv_dp @ -hat(RX) | duv_dp], scaled by w * cam_free
        A0 = [wA * (J01 * (-RX2) + J02 * RX1),
              wA * (J00 * RX2 + J02 * (-RX0)),
              wA * (J00 * (-RX1) + J01 * RX0),
              wA * J00, wA * J01, wA * J02]
        A1 = [wA * (J11 * (-RX2) + J12 * RX1),
              wA * (J12 * (-RX0)),
              wA * (J11 * RX0),
              jnp.zeros_like(J00), wA * J11, wA * J12]
        # B = duv_dp @ R, scaled by w * lm_free
        B0 = [wB * (J00 * R[0] + J01 * R[3] + J02 * R[6]),
              wB * (J00 * R[1] + J01 * R[4] + J02 * R[7]),
              wB * (J00 * R[2] + J01 * R[5] + J02 * R[8])]
        B1 = [wB * (J11 * R[3] + J12 * R[6]),
              wB * (J11 * R[4] + J12 * R[7]),
              wB * (J11 * R[5] + J12 * R[8])]
        rw0, rw1 = r0 * w, r1 * w

        # --- W = A^T B, written straight into the Schur-kernel layout ---
        for cc in range(3):
            slabw = jnp.stack(
                [A0[rr] * B0[cc] + A1[rr] * B1[cc] for rr in range(6)]
                + [jnp.zeros_like(r0)] * 2)                  # [8, TL]
            wt_ref[0, cc, pl.ds(k * 8, 8), :] = slabw

        # --- landmark-side reductions (carry) ---
        vrows = [B0[c1] * B0[c2] + B1[c1] * B1[c2]
                 for c1 in range(3) for c2 in range(3)]
        grows = [-(B0[c] * rw0 + B1[c] * rw1) for c in range(3)]
        vg = vg + jnp.stack(vrows + grows
                            + [jnp.zeros_like(r0)] * 4)      # [16, TL]

        # --- camera-side scatter: U sym(21) | g_cam(6) | cost(1) ---
        qrows = [A0[p] * A0[q] + A1[p] * A1[q] for p, q in _SYM6]
        qrows += [-(A0[p] * rw0 + A1[p] * rw1) for p in range(6)]
        qrows += [w * (r0 * r0 + r1 * r1)]
        qrows += [jnp.zeros_like(r0)] * 4                    # -> 32 rows
        q = jnp.stack(qrows)                                 # [32, TL]
        acc = acc + _onehot_dot(q, ekT, precision, True)     # [32, Cw]
        return vg, acc

    TL = x0.shape[0]
    vg0 = jnp.zeros((16, TL), jnp.float32)
    acc0 = jnp.zeros((32, Cw), jnp.float32)
    vg, acc = jax.lax.fori_loop(0, kmax, body, (vg0, acc0))
    vg_ref[0] = vg
    acc_ref[0] = acc


@functools.partial(jax.jit, static_argnames=(
    "kmax", "window", "precision", "huber_delta", "interpret"))
def linearize_fused(kvals, cams_t, uvw_t, xyzf_t, campw_t, *,
                    kmax: int, window: int,
                    precision: str = "bf16x3", huber_delta: float = 0.0,
                    interpret: bool = False):
    """One fused linearization pass.

    kvals   [1, 8]            fx, fy, skew, cx, cy (SMEM scalars)
    xyzf_t  [nT, 8, TL]       rows 0..2 xyz, row 3 lm_free
    campw_t [nT, 16, window]  per-tile camera windows: rows 0..8 R
                              row-major, 9..11 t, 12 cam_free
    Returns (wt [nT, 3, kmax*8, TL], vg_t [nT, 16, TL],
             acc [nT, 32, window] per-tile windowed U/g_cam/cost
             partials — combine with window_combine)."""
    nT, KR, TL = cams_t.shape
    K8 = kmax * 8
    return pl.pallas_call(
        functools.partial(_linearize_kernel, kmax, window, precision,
                          huber_delta),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            # cams block must span ALL max(kmax, 8) packed rows: a fixed
            # 8-row block silently clamps the dynamic k index for k >= 8
            pl.BlockSpec((1, KR, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, window), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, K8, TL), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32, window), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nT, 3, K8, TL), jnp.float32),
            jax.ShapeDtypeStruct((nT, 16, TL), jnp.float32),
            jax.ShapeDtypeStruct((nT, 32, window), jnp.float32),
        ],
        interpret=interpret,
    )(kvals, cams_t, uvw_t, xyzf_t, campw_t)


def window_gather(campk: jnp.ndarray, lt: LinTables) -> jnp.ndarray:
    """[R, pad_width] camera matrix -> [nT, R, window] per-tile windows,
    as a LANE-block gather (nT * window/LANE indices, not per-element)."""
    R = campk.shape[0]
    seg = _window_segments(lt)                           # [nT, nblk]
    blk = campk.reshape(R, lt.pad_width // LANE, LANE)
    out = blk[:, seg, :]                                 # [R, nT, nblk, LANE]
    return out.transpose(1, 0, 2, 3).reshape(seg.shape[0], R, lt.window)


def window_combine(acc: jnp.ndarray, lt: LinTables) -> jnp.ndarray:
    """Per-tile windowed partials [nT, R, window] -> [R, pad_width], as a
    LANE-block segment add (the inverse of window_gather)."""
    nT, R, _ = acc.shape
    nblk = lt.window // LANE
    seg = _window_segments(lt).reshape(-1)               # [nT*nblk]
    blk = acc.reshape(nT, R, nblk, LANE).transpose(0, 2, 1, 3)
    out = jnp.zeros((lt.pad_width // LANE, R, LANE), acc.dtype).at[
        seg].add(blk.reshape(nT * nblk, R, LANE))
    return out.transpose(1, 0, 2).reshape(R, lt.pad_width)


def fused_blocks(K, R, tvec, xyz, lm_free_f, cam_free_f, lt: LinTables, *,
                 precision: str = "bf16x3", huber_delta: float = 0.0,
                 interpret: bool = False):
    """Wrapper: pack the dynamic sides, run the kernel, unpack the camera
    system.  Returns (wt, vg_t, U [C,6,6], g_cam [C,6], cost)."""
    C = R.shape[0]
    kvals = jnp.stack([K[0, 0], K[1, 1], K[0, 1], K[0, 2],
                       K[1, 2], 0.0, 0.0, 0.0]).reshape(1, 8)
    xyzf = jnp.concatenate([xyz, lm_free_f[:, None]], axis=1)    # [L, 4]
    xyzf_t = pack_lm_tiles(xyzf, lt.tile, pad_rows=8)
    packed = jnp.concatenate(
        [R.reshape(C, 9), tvec, cam_free_f[:, None]], axis=1)    # [C, 13]
    campk = jnp.pad(packed, ((0, lt.pad_width - C), (0, 3))).T   # [16, Wp]
    campw_t = window_gather(campk, lt)                   # [nT, 16, Cw]
    wt, vg_t, acc = linearize_fused(
        kvals, lt.cams_t, lt.uvw_t, xyzf_t, campw_t,
        kmax=lt.kmax, window=lt.window,
        precision=precision, huber_delta=huber_delta, interpret=interpret)
    camacc = window_combine(acc, lt)                     # [32, pad_width]
    U = jnp.zeros((C, 6, 6), jnp.float32)
    for idx, (p, q) in enumerate(_SYM6):
        U = U.at[:, p, q].set(camacc[idx, :C])
        if p != q:
            U = U.at[:, q, p].set(camacc[idx, :C])
    g_cam = camacc[21:27, :C].T
    cost = jnp.sum(camacc[27])
    return wt, vg_t, U, g_cam, cost


def damped_vinv_tiled(vg_t: jnp.ndarray, lam) -> jnp.ndarray:
    """vinv_t [nT, 16, TL] = (damp(V, lam))^-1 computed directly in the
    tiled layout (rows 0..8 of vg_t hold V row-major).  Mirrors
    core._damp + core.inv3_sym; dead landmarks (V == 0) invert the 1e-6
    floor and later multiply zero g, contributing nothing."""
    a = vg_t[:, 0] * (1 + lam) + 1e-6
    b, c = vg_t[:, 1], vg_t[:, 2]
    e = vg_t[:, 4] * (1 + lam) + 1e-6
    f = vg_t[:, 5]
    i = vg_t[:, 8] * (1 + lam) + 1e-6
    A_ = e * i - f * f
    B_ = c * f - b * i
    C_ = b * f - c * e
    E_ = a * i - c * c
    F_ = b * c - a * f
    I_ = a * e - b * b
    det = a * A_ + b * B_ + c * C_
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    rows = [A_, B_, C_, B_, E_, F_, C_, F_, I_]
    out = jnp.stack([r * inv_det for r in rows], axis=1)
    return jnp.concatenate(
        [out, jnp.zeros((out.shape[0], 7, out.shape[2]), out.dtype)],
        axis=1)
