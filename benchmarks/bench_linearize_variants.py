"""Attribute the pod-scale fused-linearize cost (VERDICT r4 item 1: the
C=5120 / L_s=131k shard measures ~303 ms while the whole C=1000 LM
iteration costs 10 ms) by timing kernel VARIANTS that remove one suspect
at a time:

  base      the shipping kernel (linearize_pallas.fused_blocks)
  noscat    camera-side scatter (one-hot U/g_cam/cost accumulation) removed
  nogather  windowed R|t one-hot gather replaced by a broadcast constant
  tilewin   v2 candidate: per-tile pre-sliced camera window input +
            per-tile windowed U partial output (NO dynamic lane-offset
            slicing anywhere in the kernel)

python benchmarks/bench_linearize_variants.py [L ...]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sfm_tpu.ba.linearize_pallas import (build_lin_tables, fused_blocks,
                                         _SYM6)
from sfm_tpu.ba.schur_pallas import (LANE, _onehot_dot, _round_up,
                                     pack_lm_tiles, SchurPlan)
from sfm_tpu.geometry.rotations import exp_so3

C = 5120
KMAX = 8
TILE = 2048


def _variant_kernel(kmax: int, Cw: int, precision: str, mode: str,
                    base_ref, kv_ref, cams_ref, uvw_ref, xyzf_ref,
                    camp_ref, wt_ref, vg_ref, acc_ref):
    """Copy of _linearize_kernel with the suspect stages switchable."""
    i = pl.program_id(0)

    if mode != "tilewin":
        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    if mode == "tilewin":
        campw = camp_ref[0]                              # [16, Cw] per-tile
    else:
        ow = pl.multiple_of(base_ref[i, 0], LANE)
        campw = camp_ref[:, pl.ds(ow, Cw)]               # [16, Cw]
    fx, fy, skew = kv_ref[0, 0], kv_ref[0, 1], kv_ref[0, 2]
    cx, cy = kv_ref[0, 3], kv_ref[0, 4]
    x0 = xyzf_ref[0, 0, :]
    x1 = xyzf_ref[0, 1, :]
    x2 = xyzf_ref[0, 2, :]
    lfree = xyzf_ref[0, 3, :]

    def body(k, carry):
        vg, acc = carry
        cam_k = cams_ref[0, k, :]
        col = jax.lax.broadcasted_iota(jnp.int32, (Cw, cam_k.shape[0]), 0)
        ekT = (col == cam_k[None, :]).astype(jnp.bfloat16)
        if mode == "nogather":
            g = jnp.ones((16, cam_k.shape[0]), jnp.float32) * 0.5
        else:
            g = _onehot_dot(campw, ekT, precision, False)
        R = [g[j] for j in range(9)]
        t0, t1, t2 = g[9], g[10], g[11]
        cfree = g[12]

        slab = uvw_ref[0, pl.ds(k * 8, 8), :]
        u_o, v_o, w_o = slab[0], slab[1], slab[2]

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

        w = w_o
        wA = w * cfree
        wB = w * lfree

        A0 = [wA * (J01 * (-RX2) + J02 * RX1),
              wA * (J00 * RX2 + J02 * (-RX0)),
              wA * (J00 * (-RX1) + J01 * RX0),
              wA * J00, wA * J01, wA * J02]
        A1 = [wA * (J11 * (-RX2) + J12 * RX1),
              wA * (J12 * (-RX0)),
              wA * (J11 * RX0),
              jnp.zeros_like(J00), wA * J11, wA * J12]
        B0 = [wB * (J00 * R[0] + J01 * R[3] + J02 * R[6]),
              wB * (J00 * R[1] + J01 * R[4] + J02 * R[7]),
              wB * (J00 * R[2] + J01 * R[5] + J02 * R[8])]
        B1 = [wB * (J11 * R[3] + J12 * R[6]),
              wB * (J11 * R[4] + J12 * R[7]),
              wB * (J11 * R[5] + J12 * R[8])]
        rw0, rw1 = r0 * w, r1 * w

        for cc in range(3):
            slabw = jnp.stack(
                [A0[rr] * B0[cc] + A1[rr] * B1[cc] for rr in range(6)]
                + [jnp.zeros_like(r0)] * 2)
            wt_ref[0, cc, pl.ds(k * 8, 8), :] = slabw

        vrows = [B0[c1] * B0[c2] + B1[c1] * B1[c2]
                 for c1 in range(3) for c2 in range(3)]
        grows = [-(B0[c] * rw0 + B1[c] * rw1) for c in range(3)]
        vg = vg + jnp.stack(vrows + grows + [jnp.zeros_like(r0)] * 4)

        if mode != "noscat":
            qrows = [A0[p] * A0[q] + A1[p] * A1[q] for p, q in _SYM6]
            qrows += [-(A0[p] * rw0 + A1[p] * rw1) for p in range(6)]
            qrows += [w * (r0 * r0 + r1 * r1)]
            qrows += [jnp.zeros_like(r0)] * 4
            q = jnp.stack(qrows)
            acc = acc + _onehot_dot(q, ekT, precision, True)
        return vg, acc

    TL = x0.shape[0]
    vg0 = jnp.zeros((16, TL), jnp.float32)
    acc0 = jnp.zeros((32, Cw), jnp.float32)
    vg, acc = jax.lax.fori_loop(0, kmax, body, (vg0, acc0))
    vg_ref[0] = vg
    if mode == "tilewin":
        acc_ref[0] = acc
    else:
        ow = pl.multiple_of(base_ref[i, 0], LANE)
        acc_ref[:, pl.ds(ow, Cw)] += acc


@functools.partial(jax.jit, static_argnames=(
    "kmax", "window", "pad_width", "precision", "mode"))
def run_variant(kvals, base_t, cams_t, uvw_t, xyzf_t, campk, *,
                kmax, window, pad_width, precision="bf16x3", mode="base"):
    nT, KR, TL = cams_t.shape
    K8 = kmax * 8
    if mode == "tilewin":
        # pre-slice per-tile camera windows on the XLA side (cheap gather)
        base = base_t[:, 0]
        cols = base[:, None] + jnp.arange(window)[None, :]   # [nT, Cw]
        campw_t = campk[:, cols].transpose(1, 0, 2)          # [nT, 16, Cw]
        camp_in = campw_t
        camp_spec = pl.BlockSpec((1, 16, window), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec((1, 32, window), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((nT, 32, window), jnp.float32)
    else:
        camp_in = campk
        camp_spec = pl.BlockSpec((16, pad_width), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec((32, pad_width), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        acc_shape = jax.ShapeDtypeStruct((32, pad_width), jnp.float32)
    return pl.pallas_call(
        functools.partial(_variant_kernel, kmax, window, precision, mode),
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((nT, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KR, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            camp_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, 3, K8, TL), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, TL), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            acc_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nT, 3, K8, TL), jnp.float32),
            jax.ShapeDtypeStruct((nT, 16, TL), jnp.float32),
            acc_shape,
        ],
    )(base_t, kvals, cams_t, uvw_t, xyzf_t, camp_in)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [131072]
    rng = np.random.default_rng(0)
    for L in sizes:
        home = (np.arange(L) * (C - KMAX) // L).astype(np.int32)
        lm_cam = home[:, None] + np.arange(KMAX)[None, :].astype(np.int32)
        lm_uv = rng.uniform(0, 640, (L, KMAX, 2)).astype(np.float32)
        lm_w = np.ones((L, KMAX), np.float32)
        plan = SchurPlan(lm_cam, lm_w, C, tile=TILE)
        perm = plan.perm
        lt = build_lin_tables(jnp.asarray(lm_cam[perm]),
                              jnp.asarray(lm_uv[perm]),
                              jnp.asarray(lm_w[perm]), C, tile=TILE,
                              base=plan.base, window=plan.window,
                              pad_width=plan.pad_width)
        print(f"L={L} window={plan.window} pad={plan.pad_width} "
              f"nT={lt.cams_t.shape[0]}", flush=True)
        K = jnp.asarray(np.array([[525.0, 0, 320], [0, 525.0, 240],
                                  [0, 0, 1]], np.float32))
        rvec = jnp.asarray(rng.normal(0, 0.05, (C, 3)).astype(np.float32))
        tvec = jnp.asarray(rng.normal(0, 0.5, (C, 3)).astype(np.float32))
        xyz = jnp.asarray(np.stack(
            [rng.uniform(-5, 5, L), rng.uniform(-5, 5, L),
             rng.uniform(5, 10, L)], 1).astype(np.float32))[
                 jnp.asarray(perm)]
        R = exp_so3(rvec)
        kvals = jnp.stack([K[0, 0], K[1, 1], K[0, 1], K[0, 2],
                           K[1, 2], 0.0, 0.0, 0.0]).reshape(1, 8)
        xyzf = jnp.concatenate([xyz, jnp.ones((L, 1))], axis=1)
        xyzf_t = pack_lm_tiles(xyzf, lt.tile, pad_rows=8)
        packed = jnp.concatenate(
            [R.reshape(C, 9), tvec, jnp.ones((C, 1))], axis=1)
        campk = jnp.pad(packed, ((0, lt.pad_width - C), (0, 3))).T

        # the packaged v2 kernel, same inputs, same chained timing
        from sfm_tpu.ba.linearize_pallas import (linearize_fused,
                                                 window_gather)
        campw_t = window_gather(campk, lt)

        @jax.jit
        def newfused(kv):
            return linearize_fused(kv, lt.cams_t, lt.uvw_t, xyzf_t,
                                   campw_t, kmax=lt.kmax, window=lt.window)

        # warmup = ONE UNTIMED REP OF THE EXACT TIMED LOOP BODY.  A
        # warmup that differs from the loop body in any op (even a
        # Python-float vs device-scalar argument) leaves compiles to land
        # inside the first timed rep — the round-4 "303 ms pod linearize"
        # was exactly this artifact (recompile amortized over the reps).
        def timed(fn, label):
            salt = jnp.asarray(0.0)
            t0 = time.time()
            out = fn(kvals + salt * 1e-30)
            salt = out[1][0, 0, 0]
            _ = np.asarray(salt)
            t_compile = time.time() - t0
            t0 = time.time()
            for _ in range(10):
                out = fn(kvals + salt * 1e-30)
                salt = out[1][0, 0, 0]
            _ = np.asarray(salt)
            print(f"  {label:9s}: {(time.time()-t0)/10*1e3:8.2f} ms  "
                  f"(compile+first {t_compile:.1f}s)", flush=True)

        timed(newfused, "newfused")

        for mode in ("base", "noscat", "nogather", "tilewin"):
            vfn = functools.partial(
                run_variant, kmax=lt.kmax, window=lt.window,
                pad_width=lt.pad_width, mode=mode)
            timed(lambda kv: vfn(kv, lt.base_t, lt.cams_t, lt.uvw_t,
                                 xyzf_t, campk), mode)


if __name__ == "__main__":
    main()
